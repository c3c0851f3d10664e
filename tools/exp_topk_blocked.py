"""Top-k algorithm experiment for the dedup search (BASELINE config #5).

The precision experiment (tools/exp_topk_precision.py) showed HIGHEST->HIGH
only gains 9% at the 100k production shape: the similarity matmul is ~1/10
of the search time, so `lax.top_k` over 100k columns dominates (a full-row
sort network, log(N) passes over lane-hostile data). This probe measures:

  a) matmul + row-max only        — the floor (no top-k at all)
  b) production: lax.top_k(sims)  — single-stage full-width top-k
  c) blocked EXACT two-stage      — top-k per column tile, then top-k over
     the n_tiles*k tile winners. Exact: any global top-k element is a
     top-k element of its own tile. Sort passes drop from log2(100k)~17
     wide rows to log2(tile) + log2(n_tiles*k) narrow ones.
  d) jax.lax.approx_max_k         — TPU PartialReduce op, recall<1 allowed
     (measured for reference; production keeps exactness)

All variants share the HIGH-precision matmul and the lax.map query-block
structure of ops/topk.py, timed chip-resident with dependent-readback sync,
median of 5.

Usage: python tools/exp_topk_blocked.py [--n 100000] [--tile 2048] [--cpu]
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
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--k", type=int, default=20)
    parser.add_argument("--dim", type=int, default=256)
    parser.add_argument("--query_block", type=int, default=1024)
    parser.add_argument("--tile", type=int, default=2048)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from tools.exp_topk_precision import make_corpus

    e = make_corpus(args.n, args.dim)
    dev = jax.devices()[0]
    e_dev = jax.device_put(e, dev)
    Q, k, tile = args.query_block, args.k, args.tile
    prec = jax.lax.Precision.HIGH

    n_tiles = (args.n + tile - 1) // tile
    n_pad_cols = n_tiles * tile

    def q_blocks(q):
        m = q.shape[0]
        m_pad = ((m + Q - 1) // Q) * Q
        if m_pad != m:
            q = jnp.pad(q, ((0, m_pad - m), (0, 0)))
        return q.reshape(m_pad // Q, Q, -1)

    @jax.jit
    def maxonly(queries, corpus):
        def block(qb):
            sims = jnp.dot(qb, corpus.T, precision=prec,
                           preferred_element_type=jnp.float32)
            return jnp.max(sims, axis=1), jnp.argmax(sims, axis=1)

        return jax.lax.map(block, q_blocks(queries))

    @jax.jit
    def single(queries, corpus):
        def block(qb):
            sims = jnp.dot(qb, corpus.T, precision=prec,
                           preferred_element_type=jnp.float32)
            return jax.lax.top_k(sims, k)

        return jax.lax.map(block, q_blocks(queries))

    @jax.jit
    def blocked(queries, corpus):
        # pad corpus COLUMNS to a tile multiple; padded rows are zero vectors
        # whose sims (0.0) could outrank real negatives, so mask to -inf.
        cp = jnp.pad(corpus, ((0, n_pad_cols - corpus.shape[0]), (0, 0)))
        colpad = jnp.arange(n_pad_cols, dtype=jnp.int32) >= corpus.shape[0]

        def block(qb):
            sims = jnp.dot(qb, cp.T, precision=prec,
                           preferred_element_type=jnp.float32)
            sims = jnp.where(colpad[None, :], -jnp.inf, sims)
            s1, i1 = jax.lax.top_k(sims.reshape(Q, n_tiles, tile), k)
            cols = i1 + (jnp.arange(n_tiles, dtype=jnp.int32) * tile)[None, :, None]
            s2, pos = jax.lax.top_k(s1.reshape(Q, n_tiles * k), k)
            return s2, jnp.take_along_axis(cols.reshape(Q, n_tiles * k), pos, axis=1)

        return jax.lax.map(block, q_blocks(queries))

    @partial(jax.jit, static_argnames=("recall",))
    def approx(queries, corpus, recall=0.95):
        def block(qb):
            sims = jnp.dot(qb, corpus.T, precision=prec,
                           preferred_element_type=jnp.float32)
            return jax.lax.approx_max_k(sims, k, recall_target=recall)

        return jax.lax.map(block, q_blocks(queries))

    def sync(out):
        np.asarray(out[0][0])
        np.asarray(out[1][0])

    def bench(name, fn, *a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        sync(out)
        warm = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            sync(out)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        res = {"qps": round(args.n / dt, 1), "median_s": round(dt, 4),
               "warmup_s": round(warm, 1)}
        print(f"# {name}: {res}", flush=True)
        return res, out

    results = {}
    results["maxonly"], _ = bench("maxonly (floor)", maxonly, e_dev, e_dev)
    results["single_topk"], ref = bench("single top_k", single, e_dev, e_dev)
    results["blocked_exact"], blk = bench(f"blocked tile={tile}", blocked,
                                          e_dev, e_dev)
    results["approx_0.95"], apx = bench("approx_max_k r=.95", approx,
                                        e_dev, e_dev, recall=0.95)

    # exactness: blocked must match single-stage bit-for-bit on scores and,
    # up to equal-score permutations, on index sets.
    flat = lambda a: np.asarray(a).reshape(-1, args.k)[: args.n]  # noqa: E731
    s_ref, i_ref = flat(ref[0]), flat(ref[1])
    s_blk, i_blk = flat(blk[0]), flat(blk[1])
    results["blocked_max_score_delta"] = float(np.max(np.abs(s_blk - s_ref)))
    rows = range(0, args.n, max(1, args.n // 2000))
    results["blocked_index_agreement"] = round(float(np.mean(
        [len(np.intersect1d(i_blk[r], i_ref[r])) / args.k for r in rows]
    )), 6)
    i_apx = flat(apx[1])
    results["approx_recall_measured"] = round(float(np.mean(
        [len(np.intersect1d(i_apx[r], i_ref[r])) / args.k for r in rows]
    )), 4)

    print(json.dumps({"n": args.n, "k": k, "tile": tile, **results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
