#!/usr/bin/env python
"""Isolate the 1M-wide exact-search TPU-worker crash, stage by stage.

Round-4 found full-width lax.top_k at 1M-wide rows crashes the worker.
_wide_topk (column-chunked selection) was the structural fix, but the 1M
exact bench STILL crashed on the warm call. This probe binary-searches the
actual crash mechanism on the chip: sims materialization size vs top_k
width vs chunk-buffer peak memory, at several (query_block, width) points.

Each leg is prints-flushed so a worker crash names its stage.
Run: python tools/exp_wide_topk.py
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N = int(os.environ.get("EXP_N", 1_000_000))
D = 256
K = 20


def main():
    import jax
    import jax.numpy as jnp

    from video_fingerprint_tpu.ops.topk import (
        _bucket_rows, _wide_topk, _exact_search,
    )

    dev = jax.devices()[0]
    print(f"# backend={jax.default_backend()}", flush=True)
    # health check (tiny op) — also absorbs worker-restart recovery
    t0 = time.perf_counter()
    v = float(np.asarray(jnp.dot(jnp.ones((8, 8)), jnp.ones((8, 8)))[0, 0]))
    print(json.dumps({"health_s": round(time.perf_counter() - t0, 1),
                      "v": v}), flush=True)

    rng = np.random.default_rng(0)
    e = rng.normal(size=(N, D)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    n_pad = _bucket_rows(N)
    if n_pad != N:
        e = np.pad(e, ((0, n_pad - N), (0, 0)))
    print(json.dumps({"n_pad": n_pad}), flush=True)
    corpus = jax.device_put(e, dev)

    def leg(name, f, *args):
        try:
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(jax.tree.leaves(out)[0][0])  # dependent sync
            dt = time.perf_counter() - t0
            print(json.dumps({name: round(dt, 2)}), flush=True)
            return True
        except Exception as ex:  # noqa: BLE001
            print(json.dumps({name: repr(ex)[:200]}), flush=True)
            return False

    # Leg 1: one (256, n_pad) sims + chunked top_k — small-rows variant
    @jax.jit
    def one_block(qb, c):
        sims = jnp.dot(qb, c.T, precision=jax.lax.Precision.HIGH,
                       preferred_element_type=jnp.float32)
        return _wide_topk(sims, K)

    q256 = jax.device_put(e[:256], dev)
    if not leg("block256_chunked_warm", one_block, q256, corpus):
        return
    leg("block256_chunked", one_block, q256, corpus)

    # Leg 2: (1024, n_pad) sims + chunked top_k — the default query_block
    q1024 = jax.device_put(e[:1024], dev)
    if not leg("block1024_chunked_warm", one_block, q1024, corpus):
        return
    leg("block1024_chunked", one_block, q1024, corpus)

    # Leg 3: full _exact_search at query_block=256 over 64k queries
    # (enough blocks to exercise lax.map; full 1M queries would take ~10x)
    q64k = jax.device_put(e[:65536], dev)
    n_valid = jnp.asarray(N, jnp.int32)
    if leg("exact_search_qb256_64k_warm",
           lambda: _exact_search(q64k, corpus, n_valid, K, query_block=256)):
        leg("exact_search_qb256_64k",
            lambda: _exact_search(q64k, corpus, n_valid, K, query_block=256))

    # Leg 4: the crashing config — query_block=1024 over 64k queries
    if leg("exact_search_qb1024_64k_warm",
           lambda: _exact_search(q64k, corpus, n_valid, K, query_block=1024)):
        leg("exact_search_qb1024_64k",
            lambda: _exact_search(q64k, corpus, n_valid, K,
                                  query_block=1024))


if __name__ == "__main__":
    main()
