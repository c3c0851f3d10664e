#!/usr/bin/env python
"""Augmentation placement benchmark: host (cv2 per-frame) vs device (fused
into the jitted train step) — VERDICT r2 #2's "measured win" gate.

Measures (a) loader sample throughput with the full host augmentation
pipeline vs the device-mode host subset (resize + JPEG only), and (b) train
step_fn steps/s with device_augment on vs off on device-resident batches —
the device cost of moving the transforms on-chip. The win condition: the
device-augment train step costs ~nothing extra (it is elementwise noise next
to the model), while the loader sheds most of its per-frame cv2 work, so the
end-to-end input pipeline bound rises.

Usage: python tools/bench_device_augment.py [--videos 12] [--frames 80]
           [--batch 8] [--steps 12] [--cpu]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_loader(video_dir, augment_mode: str, batch: int, workers: int) -> float:
    from video_fingerprint_tpu.data.dataset import create_dataloader

    loader = create_dataloader(
        str(video_dir), batch_size=batch, num_workers=workers,
        max_frames=96, mode="train", model_type="attention",
        augment_mode=augment_mode,
    )
    # warm one epoch (fills the decode cache so both modes measure augment
    # cost, not decode), then time an epoch
    for _ in loader:
        pass
    n = 0
    t0 = time.perf_counter()
    for b in loader:
        n += b["clip1"].shape[0]
    dt = time.perf_counter() - t0
    return n / dt


def bench_step(device_augment: bool, batch: int, frames: int, steps: int) -> float:
    import jax
    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.optim import make_optimizer
    from video_fingerprint_tpu.training.train_step import (
        init_train_state,
        make_train_step,
    )

    dev = jax.devices()[0]
    HW = 64
    model = create_model("attention")
    state = init_train_state(model, None, jax.random.PRNGKey(0), (1, 8, HW, HW, 3))
    tx = make_optimizer("attention", state.params, learning_rate=1e-4,
                        total_steps=1000)
    state = jax.device_put(state.replace(opt_state=tx.init(state.params)), dev)
    step_fn = jax.jit(
        make_train_step(model, tx, "attention", device_augment=device_augment),
        donate_argnums=(0,),
    )
    rng = np.random.default_rng(0)
    batch_data = {
        "clip1": jax.device_put(
            (rng.random((batch, frames, HW, HW, 3)) * 255).astype(np.uint8), dev),
        "clip2": jax.device_put(
            (rng.random((batch, frames, HW, HW, 3)) * 255).astype(np.uint8), dev),
        "video_id": jax.device_put(np.arange(batch, dtype=np.int32), dev),
        "mask1": jax.device_put(np.ones((batch, frames), bool), dev),
        "mask2": jax.device_put(np.ones((batch, frames), bool), dev),
    }
    key = jax.random.PRNGKey(1)
    state, metrics = step_fn(state, batch_data, key)
    _ = float(metrics["loss"])  # compile + warm
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step_fn(state, batch_data, jax.random.fold_in(key, i))
    last = float(metrics["loss"])  # sync
    assert np.isfinite(last)
    return steps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=12)
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--step_batch", type=int, default=16)
    ap.add_argument("--step_frames", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cache-dir", default="/tmp/vfp_augbench")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from video_fingerprint_tpu.utils.synthetic import make_corpus

    d = Path(args.cache_dir) / f"corpus_v{args.videos}_f{args.frames}"
    if not (d / ".complete").exists():
        make_corpus(d, num_unique=args.videos, num_frames=args.frames,
                    duplicates=0)
        (d / ".complete").write_text("ok")

    host_sps = bench_loader(d, "host", args.batch, args.workers)
    device_mode_sps = bench_loader(d, "device", args.batch, args.workers)
    step_off = bench_step(False, args.step_batch, args.step_frames, args.steps)
    step_on = bench_step(True, args.step_batch, args.step_frames, args.steps)
    print(json.dumps({
        "loader_samples_per_sec_host_augment": round(host_sps, 3),
        "loader_samples_per_sec_device_mode": round(device_mode_sps, 3),
        "loader_speedup": round(device_mode_sps / host_sps, 3),
        "train_steps_per_sec_augment_off": round(step_off, 3),
        "train_steps_per_sec_device_augment": round(step_on, 3),
        "device_augment_step_overhead_pct": round(
            (step_off / step_on - 1) * 100, 2
        ),
        "step_batch": args.step_batch, "step_frames": args.step_frames,
    }))


if __name__ == "__main__":
    main()
