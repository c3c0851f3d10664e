"""Matmul-precision experiment for the dedup top-k (BASELINE config #5).

The similarity matmul dominates the 100k-corpus search. f32 inputs on TPU
run on the MXU as bf16-emulated passes: HIGHEST = 6 passes (bf16_6x, ~exact
f32), HIGH = 3 passes (bf16_3x, ~1e-6 relative error), DEFAULT = 1 pass
(~1e-3 error). Duplicate thresholds sit at 0.95-0.99, so DEFAULT is too
coarse (reference semantics: np.dot f32, fingerprint.py:493) but HIGH has
~500x more headroom than the threshold granularity needs — if it is ~2x
HIGHEST's rate, it should be the production default.

Measures, at the production shape (100k x 256, k=20, chip-resident corpus,
dependent-readback sync, median of 5 — the bench_dedup.py methodology):
  - throughput per precision,
  - accuracy vs HIGHEST: max |score delta| over all (N, k) returned scores,
    top-k index-set agreement, and duplicate-pair decisions at 0.95/0.99 on
    a corpus with PLANTED near-duplicate clusters (random-normal corpora
    have no threshold-adjacent sims, which would make the check vacuous).

Usage: python tools/exp_topk_precision.py [--n 100000] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_corpus(n: int, dim: int, seed: int = 0) -> np.ndarray:
    """Unit-norm embeddings with ~10% of rows in planted near-dup clusters:
    a base vector plus noise scaled to land cosine sims around 0.93-0.995,
    straddling both reference thresholds."""
    rng = np.random.default_rng(seed)
    e = rng.normal(size=(n, dim)).astype(np.float32)
    n_clusters = max(1, n // 40)
    rows = n // 10
    base = rng.normal(size=(n_clusters, dim)).astype(np.float32)
    which = rng.integers(0, n_clusters, size=rows)
    # cos ~ 1/sqrt(1+s^2) for unit base + s*unit noise: s in [0.1, 0.4]
    s = rng.uniform(0.1, 0.4, size=rows).astype(np.float32)[:, None]
    e[:rows] = base[which] + s * rng.normal(size=(rows, dim)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    return e


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--k", type=int, default=20)
    parser.add_argument("--dim", type=int, default=256)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from video_fingerprint_tpu.ops.topk import topk_search

    e = make_corpus(args.n, args.dim)
    dev = jax.devices()[0]
    e_dev = jax.device_put(e, dev)

    def sync(s, i):
        np.asarray(s[0])  # dependent D2H readback: the only real sync on axon
        np.asarray(i[0])

    results = {}
    out = {}
    for name in ("HIGHEST", "HIGH", "DEFAULT"):
        prec = getattr(jax.lax.Precision, name)
        t0 = time.perf_counter()
        s, i = topk_search(e_dev, e_dev, args.k, precision=prec)
        sync(s, i)
        warm = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            s, i = topk_search(e_dev, e_dev, args.k, precision=prec)
            sync(s, i)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        out[name] = (np.asarray(s), np.asarray(i))
        results[name] = {
            "qps": round(args.n / dt, 1),
            "median_s": round(dt, 4),
            "warmup_s": round(warm, 1),
        }
        print(f"# {name}: {results[name]}", flush=True)

    s_ref, i_ref = out["HIGHEST"]
    for name in ("HIGH", "DEFAULT"):
        s_x, i_x = out[name]
        results[name]["max_abs_score_delta"] = float(np.max(np.abs(s_x - s_ref)))
        same = np.mean([
            len(np.intersect1d(i_x[r], i_ref[r])) / args.k
            for r in range(0, args.n, max(1, args.n // 2000))
        ])
        results[name]["topk_index_agreement"] = round(float(same), 6)
        for thr in (0.95, 0.99):
            # duplicate-pair decisions: (query, neighbor) pairs above thr
            results[name][f"decision_mismatch@{thr}"] = int(
                np.sum((s_x >= thr) != (s_ref >= thr))
            )

    print(json.dumps({"n": args.n, "k": args.k, "dim": args.dim, **results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
