#!/usr/bin/env python
"""Build the BASELINE config #3/#4-scale synthetic corpus (VERDICT missing #6).

Hundreds of procedurally generated mp4s with VARIED lengths — exercising the
bucketed loader, the full augmentation pipeline, and the pair samplers at
closer-to-real scale than the 24-video learning check. No jax import; pure
cv2/numpy, safe to run alongside nothing (1-core box).

Usage: python tools/make_trajectory_corpus.py [--out /tmp/vfp_traj/videos]
           [--videos 150] [--min-frames 48] [--max-frames 160]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from video_fingerprint_tpu.utils.synthetic import (
    synthetic_frames,
    synthetic_frames_near,
    write_video,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/vfp_traj/videos")
    ap.add_argument("--videos", type=int, default=150)
    ap.add_argument("--min-frames", type=int, default=48)
    ap.add_argument("--max-frames", type=int, default=160)
    ap.add_argument("--seed", type=int, default=100)
    ap.add_argument("--hard", action="store_true",
                    help="Near-duplicate distractor families (4 videos per "
                         "base pattern sharing 75%% of their content): keeps "
                         "validation AUC off the 1.0 ceiling so model "
                         "selection / early stopping discriminate "
                         "(VERDICT r3 missing #4)")
    ap.add_argument("--per-family", type=int, default=4)
    ap.add_argument("--mix", type=float, default=0.25)
    args = ap.parse_args()

    out = Path(args.out)
    marker = out / ".complete"
    stamp = (f"{args.videos}:{args.min_frames}:{args.max_frames}:{args.seed}"
             + (f":hard{args.per_family}x{args.mix}" if args.hard else ""))
    if marker.exists():
        if marker.read_text() == stamp:
            print(f"corpus already complete at {out}")
            return
        raise SystemExit(
            f"{out} holds a corpus built with different parameters "
            f"({marker.read_text()} != {stamp}) — pick a fresh --out"
        )
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.videos):
        t = int(rng.integers(args.min_frames, args.max_frames + 1))
        if args.hard:
            base_seed = args.seed + 100000 + i // args.per_family
            frames = synthetic_frames_near(args.seed + i, base_seed, t,
                                           mix=args.mix)
            name = f"fam{i // args.per_family:03d}_v{i % args.per_family}.mp4"
        else:
            frames = synthetic_frames(args.seed + i, t)
            name = f"traj_{i:04d}.mp4"
        write_video(out / name, frames)
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{args.videos}", flush=True)
    marker.write_text(stamp)
    print(f"corpus complete: {args.videos} videos at {out}")


if __name__ == "__main__":
    main()
