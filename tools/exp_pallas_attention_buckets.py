#!/usr/bin/env python
"""Pallas-vs-jnp attention decision table across the scan buckets
(VERDICT r4 next #9).

The fingerprint model's temporal attention runs at (B*H, T, 32) with
T = the scan bucket (32..512) and H=8. This times the two implementations
of exactly that op — the single-block fused Pallas kernel vs the jnp
einsum chain XLA fuses itself — in-graph (K reps per dispatch inside a
fori_loop, scalar readback; same regime as the headline bench) on the real
chip, and prints one JSON line per (T, impl) plus a final decision line.

The kernel is opt-in (VFP_USE_PALLAS=1, default off) — this tool records
whether ANY production shape justifies flipping that default.

Usage: python tools/exp_pallas_attention_buckets.py [--batch 16] [--reps 24]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16,
                    help="videos per scan batch (production bucketed batch)")
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--reps", type=int, default=24,
                    help="attention calls per timed dispatch")
    ap.add_argument("--buckets", type=int, nargs="*",
                    default=[32, 64, 128, 256, 512])
    ap.add_argument("--timings", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_fingerprint_tpu.ops.attention import fused_attention

    dev = jax.devices()[0]
    BH, D = args.batch * args.heads, args.dim
    rng = np.random.default_rng(0)
    rows = []

    for T in args.buckets:
        q = jax.device_put(
            rng.normal(size=(BH, T, D)).astype(np.float32), dev)
        k = jax.device_put(
            rng.normal(size=(BH, T, D)).astype(np.float32), dev)
        v = jax.device_put(
            rng.normal(size=(BH, T, D)).astype(np.float32), dev)

        def time_impl(use_pallas):
            def loop(q, k, v):
                def body(i, acc):
                    o = fused_attention(q + acc * 0, k, v,
                                        use_pallas=use_pallas)
                    return acc + jnp.sum(o[0, 0], dtype=jnp.float32)
                return jax.lax.fori_loop(0, args.reps, body,
                                         jnp.float32(0.0))

            f = jax.jit(loop)
            np.asarray(f(q, k, v))  # compile + warm
            ts = []
            for _ in range(args.timings):
                t0 = time.perf_counter()
                np.asarray(f(q, k, v))
                ts.append((time.perf_counter() - t0) / args.reps)
            return float(np.median(ts))

        t_jnp = time_impl(False)
        t_pal = time_impl(True)
        row = {"T": T, "BH": BH,
               "jnp_us_per_call": round(t_jnp * 1e6, 1),
               "pallas_us_per_call": round(t_pal * 1e6, 1),
               "pallas_speedup": round(t_jnp / t_pal, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    wins = [r for r in rows if r["pallas_speedup"] > 1.05]
    print(json.dumps({
        "decision": ("keep opt-in default-OFF" if not wins else
                     f"pallas wins at T={[r['T'] for r in wins]}"),
        "table": rows,
    }), flush=True)


if __name__ == "__main__":
    main()
