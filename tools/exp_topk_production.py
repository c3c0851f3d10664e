"""End-to-end validation + timing of the production certified top-k
(ops/topk.py topk_search method="certified"), including the repair pass.

For each (certificate, recall_target) configuration: median-of-5 timing of
the full production call (first pass + ok-mask D2H + gathered exact repairs)
and host-side verification against method="exact":
  - strict certificate: per-row sorted score multisets must be bit-equal;
  - threshold certificate: per-row {index: score} restricted to
    score >= threshold must be set-equal (everything duplicate grouping
    consumes), and row score vectors agree wherever >= threshold.

Usage: python tools/exp_topk_production.py [--n 100000] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--k", type=int, default=20)
    parser.add_argument("--dim", type=int, default=256)
    parser.add_argument("--thr", type=float, default=0.95)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from tools.exp_topk_precision import make_corpus
    from video_fingerprint_tpu.ops.topk import topk_search

    e = make_corpus(args.n, args.dim)
    dev = jax.devices()[0]
    e_dev = jax.device_put(e, dev)
    k = args.k

    def sync(out):
        np.asarray(out[0][0])
        np.asarray(out[1][0])

    def bench(fn, iters=5):
        out = fn()
        sync(out)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        s = np.asarray(out[0])
        i = np.asarray(out[1])
        return {"qps": round(args.n / dt, 1), "median_s": round(dt, 4)}, s, i

    results = {"n": args.n, "k": k, "thr": args.thr}

    r, s_ref, i_ref = bench(
        lambda: topk_search(e_dev, e_dev, k, method="exact"), iters=3
    )
    results["exact"] = r
    print(f"# exact: {r}", flush=True)

    ref_sorted = np.sort(s_ref, axis=1)

    def verify_strict(s):
        return bool(np.array_equal(np.sort(s, axis=1), ref_sorted))

    def verify_thr(s, i, thr):
        for row in range(args.n):
            ref_pairs = {
                (int(ii), float(ss))
                for ss, ii in zip(s_ref[row], i_ref[row]) if ss >= thr
            }
            got_pairs = {
                (int(ii), float(ss))
                for ss, ii in zip(s[row], i[row]) if ss >= thr
            }
            if ref_pairs != got_pairs:
                # ties at the k-th position can swap equal-score indices;
                # compare score multisets as the fallback discriminator
                if sorted(p[1] for p in ref_pairs) != sorted(
                    p[1] for p in got_pairs
                ):
                    return False, row
        return True, -1

    for recall in (0.95, 0.99):
        r, s, i = bench(
            lambda: topk_search(e_dev, e_dev, k, method="certified",
                                recall_target=recall)
        )
        r["strict_exact"] = verify_strict(s)
        results[f"certified_strict@r{recall}"] = r
        print(f"# certified_strict@r{recall}: {r}", flush=True)

    for recall in (0.95, 0.99):
        r, s, i = bench(
            lambda: topk_search(e_dev, e_dev, k, method="certified",
                                exact_above=args.thr, recall_target=recall)
        )
        ok, bad_row = verify_thr(s, i, args.thr)
        r["thr_complete"] = ok
        if not ok:
            r["first_bad_row"] = bad_row
        results[f"certified_thr@r{recall}"] = r
        print(f"# certified_thr@r{recall}: {r}", flush=True)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
