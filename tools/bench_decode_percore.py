#!/usr/bin/env python
"""Per-core decode efficiency: cv2 vs the C++ libav worker (VERDICT r3 next
#6).

The e2e scan numbers on this 1-core box saturate the host either way, so
wall-clock ties tell us nothing about the native worker's value on a real
multi-core host. This measures the number that does: frames/s for ONE worker
doing the scanner's full host-side job — subsampled decode + short-side
scale + center crop to (n, size, size, 3) u8 — for the cv2 path
(data/decode.decode_subsampled + preprocess.resize_short_side_center_crop)
vs the fused native path (native/vfp_decode.cc via utils/native_decode).

No jax import: safe to run alongside nothing on the 1-core box.

Usage: python tools/bench_decode_percore.py [--videos 8] [--frames 240]
           [--max-frames 64] [--size 64] [--reps 3]
Prints one JSON line: {"cv2_fps": ..., "native_fps": ..., "ratio": ...}
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from video_fingerprint_tpu.data import decode, preprocess
from video_fingerprint_tpu.utils import native_decode
from video_fingerprint_tpu.utils.synthetic import synthetic_frames, write_video


def cv2_job(path, max_frames: int, size: int) -> int:
    frames = decode.decode_subsampled(path, max_frames)
    out = [preprocess.resize_short_side_center_crop(f, size) for f in frames]
    return len(out)


def native_job(path, max_frames: int, size: int) -> int:
    out = native_decode.decode_scan(path, max_frames, size)
    return 0 if out is None else out.shape[0]


def time_path(job, paths, max_frames, size, reps):
    # warm one pass (page cache, lazy .so build)
    for p in paths:
        job(p, max_frames, size)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        n = sum(job(p, max_frames, size) for p in paths)
        dt = time.perf_counter() - t0
        fps = n / dt
        best = fps if best is None else max(best, fps)
    return best, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=8)
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--max-frames", type=int, default=64)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/vfp_decode_bench")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(args.videos):
        p = out / f"bench_{i}_{args.frames}.mp4"
        if not p.exists():
            write_video(p, synthetic_frames(i, args.frames))
        paths.append(str(p))

    if not native_decode.available():
        print(json.dumps({"error": "native decoder unavailable"}))
        return 1

    cv2_fps, n_cv2 = time_path(cv2_job, paths, args.max_frames, args.size,
                               args.reps)
    nat_fps, n_nat = time_path(native_job, paths, args.max_frames, args.size,
                               args.reps)
    assert n_cv2 == n_nat, (n_cv2, n_nat)
    print(json.dumps({
        "metric": "single-worker decode+scale+crop throughput",
        "unit": "frames/sec/core",
        "videos": args.videos,
        "source_frames": args.frames,
        "decoded_frames_per_video": args.max_frames,
        "size": args.size,
        "cv2_fps": round(cv2_fps, 1),
        "native_fps": round(nat_fps, 1),
        "native_over_cv2": round(nat_fps / cv2_fps, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
