"""Roofline decomposition of the thresholded dedup search: is it HBM-bound
on the materialized sims tensor, and does a bf16-materialized sims halve it?

Hypothesis (round 4): at 100k x 256 the certified-bf16 search runs at
~21 TFLOP/s — 10% of v5e bf16 peak — because the (block, N) f32 sims tensor
(400 MB per 1024-query block) is written once and re-read by approx_max_k
and by the certificate counts: ~1.2-1.6 GB of HBM traffic per block, ~0.19 s
total at 819 GB/s, which is almost exactly the measured wall clock. Emitting
sims in bf16 halves every leg of that traffic; the threshold certificate
must then widen by the extra storage-rounding error (<= 2^-9 at |sim|<1).

Variants timed (each: lax.map over query blocks, staged corpus, dependent
small readback as the sync — block_until_ready returns early on axon):
  matmul+max      f32 / bf16   — producer + one full reduce read
  matmul+approx   f32 / bf16   — producer + PartialReduce read
  matmul+approx+counts f32/bf16 — the full certified first stage
  production      topk_cosine(method=certified-bf16) for the same shape

Usage: python tools/exp_topk_bf16sims.py [--n 100000] [--dim 256] [--k 20]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--thr", type=float, default=0.95)
    ap.add_argument("--recall", type=float, default=0.95)
    ap.add_argument("--query_block", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    args.n -= args.n % args.query_block  # whole blocks only (probe, not prod)
    rng = np.random.default_rng(0)
    e = rng.normal(size=(args.n, args.dim)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    e = jax.device_put(e, jax.devices()[0])
    qb, k, thr = args.query_block, args.k, args.thr
    n_blocks = args.n // qb
    assert args.n % qb == 0

    def blocks(x):
        return x.reshape(n_blocks, qb, args.dim)

    def make(variant: str, out_dtype):
        @jax.jit
        def fn(corpus):
            def block_fn(qblk):
                sims = jnp.dot(qblk, corpus.T,
                               precision=jax.lax.Precision.DEFAULT,
                               preferred_element_type=out_dtype)
                if variant == "max":
                    return (jnp.max(sims, axis=1).astype(jnp.float32),)
                s, i = jax.lax.approx_max_k(sims, k,
                                            recall_target=args.recall)
                if variant == "approx":
                    return jnp.max(s, axis=1).astype(jnp.float32), i[:, 0]
                n_thr = jnp.sum(sims >= thr, axis=1)
                ok = (n_thr == jnp.sum(s >= thr, axis=1)) & (n_thr < k)
                return jnp.max(s, axis=1).astype(jnp.float32), i[:, 0], ok

            return jax.lax.map(block_fn, blocks(corpus))

        return fn

    def sync(out):
        for part in out:
            np.asarray(part[0])

    results = {}
    for variant in ("max", "approx", "counts"):
        for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            fn = make(variant, dt)
            t0 = time.perf_counter()
            sync(fn(e))
            warm = time.perf_counter() - t0
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                sync(fn(e))
                times.append(time.perf_counter() - t0)
            dt_s = float(np.median(times))
            results[f"{variant}_{name}"] = {
                "s": round(dt_s, 4), "warm_s": round(warm, 1),
                "qps": round(args.n / dt_s),
            }
            print(json.dumps({f"{variant}_{name}": results[f'{variant}_{name}']}),
                  flush=True)

    from video_fingerprint_tpu.ops.topk import topk_cosine

    fn = partial(topk_cosine, method="certified-bf16", exact_above=thr,
                 query_block=qb)
    s, i = fn(e, k)
    np.asarray(s[0]); np.asarray(i[0])
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        s, i = fn(e, k)
        np.asarray(s[0]); np.asarray(i[0])
        times.append(time.perf_counter() - t0)
    dt_s = float(np.median(times))
    results["production_certified_bf16"] = {
        "s": round(dt_s, 4), "qps": round(args.n / dt_s)}
    flop = 2 * args.n * args.n * args.dim
    print(json.dumps({
        "n": args.n, "dim": args.dim, "k": k, "query_block": qb,
        "results": results,
        "matmul_tflops_at_max_f32": round(
            flop / results["max_f32"]["s"] / 1e12, 1),
        "matmul_tflops_at_max_bf16": round(
            flop / results["max_bf16"]["s"] / 1e12, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
