#!/usr/bin/env python
"""Layout probe: elementwise-pass cost on (B,T,H,W,C=3) vs (B,T,C,H,W).

v5e tiles the two minor dims (8,128); with C=3 minor the lane dim pads
42x, so every elementwise pass over the video tensor may cost far more
HBM traffic than its logical size. This times one scalar-mult pass (the
cheapest possible elementwise op) in both layouts, in-graph looped per
the axon timing postmortems, to decide whether ops/device_augment should
run channels-first internally.

Usage: python tools/exp_layout_probe.py [--batch 16] [--frames 64] [--k 16]
Prints one JSON line: ms per pass per layout (+ the transpose round trip).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    B, T, HW = args.batch, args.frames, 64
    rng = np.random.default_rng(0)
    nhwc = jax.device_put(rng.random((B, T, HW, HW, 3), np.float32), dev)
    nchw = jax.device_put(
        np.ascontiguousarray(np.moveaxis(
            np.asarray(nhwc), -1, 2)), dev)

    def looped(fn, x):
        def run(x):
            def body(i, acc):
                y = fn(x * (1.0 + acc * 1e-12))
                return acc + jnp.sum(y) * 1e-30

            return jax.lax.fori_loop(0, args.k, body, 0.0)

        return jax.jit(run)

    def time_it(fn, x):
        f = looped(fn, x)
        _ = float(f(x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(f(x))
            ts.append(time.perf_counter() - t0)
            assert np.isfinite(v)
        return statistics.median(ts) / args.k * 1000

    out = {
        "batch": B, "frames": T, "k": args.k,
        "mult_nhwc_ms": round(time_it(lambda x: x * 1.0001 + 0.1, nhwc), 3),
        "mult_nchw_ms": round(time_it(lambda x: x * 1.0001 + 0.1, nchw), 3),
        # transpose round trip (entry+exit cost of a channels-first pipeline)
        "transpose_roundtrip_ms": round(time_it(
            lambda x: jnp.moveaxis(jnp.moveaxis(x, -1, 2) * 1.0001, 2, -1),
            nhwc), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
