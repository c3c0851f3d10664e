"""Scanner CLI — same flag surface as the reference (fingerprint.py:631-723).

Differences: `--device` gains `tpu` (default; `cuda` is accepted as an alias
for compatibility and maps to the accelerator), and `--batch` is actually used
(the reference accepts it but never batches; fingerprint.py:18).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Video fingerprint scanner and duplicate detector (TPU)",
    )
    parser.add_argument("--model", type=str, required=True,
                        help="Path to a trained checkpoint (.ckpt or reference .pth)")
    parser.add_argument("--scan", type=str, required=True,
                        help="Folder containing videos to scan")
    parser.add_argument("--threshold", type=float, default=0.99,
                        help="Similarity threshold for duplicates (0-1, default: 0.99)")
    parser.add_argument("--output", type=str, help="JSON file to save the results")
    parser.add_argument("--device", type=str, default="tpu",
                        choices=["tpu", "cuda", "cpu"],
                        help="Device to use (default: tpu; cuda is an alias)")
    parser.add_argument("--extensions", type=str, nargs="+",
                        default=[".mp4", ".avi", ".mov", ".mkv"],
                        help="Video file extensions to scan")
    parser.add_argument("--workers", type=int, default=4,
                        help="Number of decode workers")
    parser.add_argument("--batch", type=int, default=8,
                        help="Device batch size for bucketed extraction")
    parser.add_argument("--no_batched", action="store_true",
                        help="Disable bucketed batching (sequential batch=1)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (cosine vs f32 ~0.99998)")
    parser.add_argument("--no_optimize", action="store_true",
                        help="Disable the fused inference layout (BN folded "
                             "into conv weights; lossless, on by default)")
    parser.add_argument("--native_decode", action="store_true",
                        help="Use the C++ libav decode worker (fused decode+"
                             "scale+crop; cv2 remains the default)")
    parser.add_argument("--native_preprocess", action="store_true",
                        help="Use the C++ host preprocess runtime (fast path; cv2 is "
                             "the bit-exact default; superseded by "
                             "--native_decode in batched scans)")
    parser.add_argument("--warmup", action="store_true",
                        help="Pre-compile the batched extraction programs "
                             "before scanning (first compiles can take "
                             "minutes per shape on remote-compile setups)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="Shard batched extraction over every device of "
                             "the platform (Mesh(('data',)); single-chip "
                             "boxes fall back to one device)")
    parser.add_argument("--index", type=str,
                        help="Persistent scan index (.npz): reuse fingerprints "
                             "for unchanged files (size + content hash) and "
                             "save the updated index after the scan. Entries "
                             "for files outside the scanned folder are kept, "
                             "so one index can serve several libraries")
    parser.add_argument("--against", type=str,
                        help="Query-vs-corpus mode: search the scanned videos "
                             "against this persisted corpus index (.npz, from "
                             "a previous --index scan) and report "
                             "cross-duplicates instead of duplicates within "
                             "the scanned folder")
    parser.add_argument("--index_storage", choices=("f32", "bf16"),
                        default="f32",
                        help="Embedding storage for the saved --index: bf16 "
                             "halves the file and the on-device corpus "
                             "(~8M videos/chip vs ~4M in f32); search stays "
                             "exhaustive w.r.t. the stored vectors, scores "
                             "move by <= ~0.002 (corpus quantization) to "
                             "~0.005 (query quantized too; docs/DESIGN.md)")
    parser.add_argument("--no_prune", action="store_true",
                        help="Keep index entries for files that are missing "
                             "on disk (shared/networked indexes where a "
                             "mount may be temporarily absent)")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.device == "cpu":
        # Avoid initializing (and handshaking with) the TPU backend entirely.
        import jax

        jax.config.update("jax_platforms", "cpu")

    from video_fingerprint_tpu.inference.report import (
        print_duplicate_report,
        save_results,
    )
    from video_fingerprint_tpu.inference.scanner import FingerprintScanner

    print("Starting video fingerprint scanner")
    print("=" * 80)

    if not Path(args.model).exists():
        print(f"Error: Model checkpoint {args.model} does not exist")
        return 1

    scanner = FingerprintScanner(
        args.model, device=args.device, batch_size=args.batch,
        native_preprocess=args.native_preprocess,
        native_decode=args.native_decode, bf16=args.bf16,
        optimize=not args.no_optimize, data_parallel=args.data_parallel,
    )

    video_dir = Path(args.scan)
    if not video_dir.exists():
        print(f"Error: Folder {video_dir} does not exist")
        return 1

    if args.warmup:
        print("Warming up batched extraction programs...")
        scanner.warmup()

    corpus_index = None
    if args.against:
        from video_fingerprint_tpu.inference.index import FingerprintIndex

        if not Path(args.against).exists():
            print(f"Error: Corpus index {args.against} does not exist")
            return 1
        corpus_index = FingerprintIndex.load(args.against)
        print(f"Loaded corpus index with {len(corpus_index)} fingerprints "
              f"from {args.against}")

    cache = None
    if args.index:
        from video_fingerprint_tpu.inference.scan_cache import load_cache

        cache = load_cache(args.index, expect_identity=scanner.model_identity)
        if cache:
            print(f"Loaded scan index with {len(cache)} fingerprints "
                  f"from {args.index}")

    fingerprints = scanner.scan_directory(
        video_dir,
        extensions=args.extensions,
        num_workers=args.workers,
        batched=not args.no_batched,
        cache=cache,
    )
    if not fingerprints:
        print("No videos could be analyzed")
        return 1

    if args.index:
        from video_fingerprint_tpu.inference.scan_cache import save_cache

        # merge the prior cache so entries for files outside this scan
        # survive (shared index across libraries); rescans win on conflict.
        # Prior entries whose file no longer exists on disk are pruned —
        # a deleted video's stale path would otherwise keep matching in
        # future --against / grouping runs forever — but ONLY within the
        # scanned root: this scan can attest deletions only inside its own
        # directory. An entry from another library (or a temporarily
        # unmounted share) being invisible from here proves nothing, so it
        # is kept; relative keys from a scan run in another cwd are likewise
        # never pruned. --no_prune disables pruning entirely.
        scan_root = video_dir.resolve()

        def _under_scan_root(p: str) -> bool:
            try:
                return Path(p).resolve().is_relative_to(scan_root)
            except (OSError, ValueError):
                return False

        kept_prior = {
            p: fp for p, fp in (cache or {}).items()
            if p in fingerprints
            or args.no_prune
            or not Path(p).is_absolute()
            or not _under_scan_root(p)
            or Path(p).exists()
        }
        pruned = len(cache or {}) - len(kept_prior)
        if pruned:
            print(f"Pruned {pruned} index entries for deleted files")
        save_cache(args.index, {**kept_prior, **fingerprints},
                   model_identity=scanner.model_identity,
                   storage=args.index_storage)
        print(f"Scan index saved to {args.index}")

    if corpus_index is not None:
        try:
            duplicate_groups = scanner.find_duplicates_against(
                fingerprints, corpus_index,
                similarity_threshold=args.threshold,
            )
        except ValueError as e:
            print(f"Error: {e}")
            return 1
    else:
        duplicate_groups = scanner.find_duplicates(
            fingerprints, similarity_threshold=args.threshold
        )
    print_duplicate_report(duplicate_groups)

    if args.output:
        save_results(
            fingerprints, duplicate_groups, Path(args.output),
            scanner.config, scanner.model_type,
        )

    print("\nScan complete!")
    return 0


if __name__ == "__main__":
    sys.exit(main())
