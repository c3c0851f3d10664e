#!/usr/bin/env python
"""Scale evidence for streaming_validation_metrics (C20 at 100k corpus).

The reference's validation materializes the full N x N similarity matrix
(train.py:439-481) — 40 GB at N=100k, which cannot run. The streaming path
(ops/metrics.py) computes the SAME metrics in O(block*N) memory; this bench
puts a wall-clock number on the full reference metric suite (discrimination
thresholds, R@k, mAP, tie-corrected AUC) at the 100k production scale.

Usage: python tools/bench_streaming_metrics.py [--n 100000] [--groups 20000]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--groups", type=int, default=20_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--block", type=int, default=256)
    args = ap.parse_args()

    import jax

    from video_fingerprint_tpu.ops.metrics import streaming_validation_metrics

    rng = np.random.default_rng(0)
    # clustered corpus: group members share a direction + small noise, so
    # intra/inter stats, thresholds and retrieval all exercise real structure
    centers = rng.standard_normal((args.groups, args.dim)).astype(np.float32)
    ids = rng.integers(0, args.groups, (args.n,)).astype(np.int32)
    emb = centers[ids] + 0.35 * rng.standard_normal(
        (args.n, args.dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)

    print(f"# backend={jax.default_backend()} n={args.n} "
          f"groups={args.groups} block={args.block}", flush=True)

    from video_fingerprint_tpu.ops import metrics as M

    t0 = time.perf_counter()
    intra = M._intra_pair_sims(emb, ids)
    print(f"# intra_pair_sims: {time.perf_counter() - t0:.1f}s "
          f"({intra.shape[0]} pairs)", flush=True)

    t0 = time.perf_counter()
    m = streaming_validation_metrics(emb, ids, block_rows=args.block)
    elapsed = time.perf_counter() - t0
    t0 = time.perf_counter()
    streaming_validation_metrics(emb, ids, block_rows=args.block)
    warm = time.perf_counter() - t0
    print(f"# warm second run: {warm:.2f}s "
          f"(first {elapsed:.2f}s incl. compile)", flush=True)

    out = {
        "streaming_metrics_n": args.n,
        "streaming_metrics_s": round(elapsed, 2),
        "auc_roc": round(m["auc_roc"], 4),
        "R@1": round(m["R@1"], 4),
        "mAP": round(m["mAP"], 4),
        "separation_gap": round(m["separation_gap"], 4),
        "block_rows": args.block,
        "device_mem_per_block_mb": round(
            args.block * args.n * 4 / 1e6, 1),
        "dense_equivalent_mb": round(args.n * args.n * 4 / 1e6, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
