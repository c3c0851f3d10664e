#!/usr/bin/env python
"""End-to-end scan benchmark WITH decode (BASELINE config #2; VERDICT #4).

Drives the real scan pipeline — demux/decode in host workers, preprocess,
bucketed masked batching, device extraction, all-pairs duplicate grouping —
over a synthetic mp4 corpus, and reports decode-inclusive videos/sec. This is
the reference's own headline regime (fingerprint.py:410-413: its scan loop
decodes + forwards per video), so the number is directly comparable.

The corpus and the random-init checkpoint are cached under --cache-dir so
repeated runs (and bench.py) skip the ~minutes of cv2 video writing.

Usage: python tools/bench_scan_e2e.py [--videos 60] [--frames 96]
           [--device tpu|cpu] [--workers 8] [--native-decode] [--threshold .95]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def ensure_corpus(cache_dir: Path, num_videos: int, num_frames: int) -> Path:
    """Synthetic mp4 corpus, ~25% of it exact duplicates (config #2 shape)."""
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    d = cache_dir / f"corpus_v{num_videos}_f{num_frames}"
    marker = d / ".complete"
    if marker.exists():
        return d
    dups = max(1, num_videos // 5)
    make_corpus(d, num_unique=num_videos - dups, num_frames=num_frames,
                duplicates=dups)
    marker.write_text("ok")
    return d


def ensure_checkpoint(cache_dir: Path) -> Path:
    import jax
    import jax.numpy as jnp

    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.checkpoint import save_checkpoint

    path = cache_dir / "bench_model.ckpt"
    if path.exists():
        return path
    cache_dir.mkdir(parents=True, exist_ok=True)
    model = create_model("attention")
    variables = model.init(jax.random.PRNGKey(42), jnp.zeros((1, 4, 64, 64, 3)))
    config = {
        "model_type": "attention", "frame_size": 64, "max_frames": 500,
        "embedding_dim": 256, "spatial_dim": 128, "temporal_dim": 256,
        "num_attention_blocks": 4,
    }
    save_checkpoint(path, variables["params"], variables["batch_stats"], config)
    return path


def run(
    num_videos: int = 60,
    num_frames: int = 96,
    device: str = "tpu",
    workers: int = 8,
    batch: int = 16,
    native_decode: bool = False,
    threshold: float = 0.95,
    cache_dir: Path = Path("/tmp/vfp_e2e_bench"),
    bf16: bool = True,
) -> dict:
    from video_fingerprint_tpu.inference.scanner import FingerprintScanner

    cache_dir = Path(cache_dir)
    corpus = ensure_corpus(cache_dir, num_videos, num_frames)
    ckpt = ensure_checkpoint(cache_dir)

    scanner = FingerprintScanner(
        str(ckpt), device=device, batch_size=batch,
        native_decode=native_decode, bf16=bf16,
    )
    # Compile the exact bucketed masked program the batched scan dispatches
    # (scanner.warmup), so the measured window is scan throughput, not XLA
    # compile time (0.5-3 min per shape through a remote-compile tunnel).
    scanner.warmup(num_frames)

    # timed window = the scan loop only, matching the reference's own
    # videos/sec print (fingerprint.py:410-413 reports after the scan,
    # before find_duplicates); grouping also has a first-call compile whose
    # shape depends on the corpus size, which would otherwise pollute a
    # cold window.
    t0 = time.perf_counter()
    fingerprints = scanner.scan_directory(
        corpus, num_workers=workers, batched=True
    )
    elapsed = time.perf_counter() - t0
    groups = scanner.find_duplicates(fingerprints, similarity_threshold=threshold)

    n = len(fingerprints)
    return {
        "e2e_scan_vps_with_decode": round(n / elapsed, 3),
        "e2e_videos": n,
        "e2e_frames_per_video": num_frames,
        "e2e_elapsed_s": round(elapsed, 2),
        "e2e_decode_workers": workers,
        "e2e_native_decode": bool(scanner.native_decode),
        "e2e_duplicate_groups": len(groups),
        "e2e_device": device,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=60)
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--native-decode", action="store_true")
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--cache-dir", default="/tmp/vfp_e2e_bench")
    ap.add_argument("--f32", action="store_true",
                    help="f32 compute (default is bf16, the production config)")
    args = ap.parse_args()
    result = run(
        num_videos=args.videos, num_frames=args.frames, device=args.device,
        workers=args.workers, batch=args.batch,
        native_decode=args.native_decode, threshold=args.threshold,
        cache_dir=Path(args.cache_dir), bf16=not args.f32,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
