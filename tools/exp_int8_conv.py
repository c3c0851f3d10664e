#!/usr/bin/env python
"""Probe: int8 spatial-conv stack on the MXU vs the production bf16 stack.

The last open extraction-perf question after the round-3/4 closures
(space-to-depth, widened conv0, Pallas convblock, cross-layer fusion — all
measured negative): v5e's MXU has a 2x int8 peak (394 TOPS vs 197 TFLOP/s
bf16) and int8 activations HALVE the conv-boundary HBM traffic that the
stack roofline showed is the binding term (docs/DESIGN.md round-3 table:
conv write+reread dominates every stage). The input is ALREADY uint8
pixels, so conv0 could consume it with only a zero-point shift — removing
the u8->bf16 convert floor (2.05 ms per 16384-frame iteration) as well.

Legs (each K-looped in-graph per the axon timing rules):
  bf16_stack     u8 -> bf16/255 -> conv0..3 (+bias+relu)      [production]
  int8_stack     u8 -> (x-128) int8 -> conv0..3 int8 (int32 acc,
                 fused scale+bias+relu+requant int8 epilogue) -> bf16
  bf16_conv0     convert + conv0 only
  int8_conv0     int8 conv0 only (no convert floor)

Random weights/scales: this probe measures LOWERING + throughput, not
accuracy (quantization calibration is a separate step that only matters if
the timing wins).

Run on the real chip: python tools/exp_int8_conv.py
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(os.environ.get("EXP_N", 16384))
HW = 64
K = int(os.environ.get("EXP_K", 20))
REPS = int(os.environ.get("EXP_REPS", 3))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = jax.devices()[0]
    print(f"# backend={jax.default_backend()} N={N} K={K}", flush=True)

    rng = np.random.default_rng(0)
    specs = [(5, 3, 32), (3, 32, 64), (3, 64, 128), (3, 128, 256)]
    ws_f = [rng.normal(0, 0.1, (k, k, ci, co)).astype(np.float32)
            for k, ci, co in specs]
    bs_f = [rng.normal(0, 0.1, co).astype(np.float32) for _, _, co in specs]
    # per-output-channel symmetric int8 weights + scales
    ws_q, w_scales = [], []
    for w in ws_f:
        s = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0) / 127.0
        ws_q.append(np.clip(np.round(w / s), -127, 127).astype(np.int8))
        w_scales.append(s.astype(np.float32))
    # activation requant scales (arbitrary for the timing probe)
    a_scales = [np.float32(0.05)] * 4

    x_u8 = jax.device_put(
        rng.integers(0, 256, (N, HW, HW, 3), dtype=np.uint8), dev)

    def pad_for(k):
        return ((2, 2), (2, 2)) if k == 5 else ((1, 1), (1, 1))

    def conv_bf16(x, w, b):
        y = lax.conv_general_dilated(
            x, jnp.asarray(w, x.dtype), window_strides=(2, 2),
            padding=pad_for(w.shape[0]),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y + jnp.asarray(b, y.dtype))

    def conv_int8(x_i8, w_q, w_s, b, requant_s, last):
        y32 = lax.conv_general_dilated(
            x_i8, jnp.asarray(w_q), window_strides=(2, 2),
            padding=pad_for(w_q.shape[0]),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        # fused epilogue: dequant (per-channel) + bias + relu
        yf = y32.astype(jnp.float32) * jnp.asarray(w_s) + jnp.asarray(b)
        yf = jax.nn.relu(yf)
        if last:
            return yf.astype(jnp.bfloat16)
        # requantize for the next int8 conv
        q = jnp.clip(jnp.round(yf / requant_s), -127, 127)
        return q.astype(jnp.int8)

    def bf16_stack(depth):
        def body(x):
            y = x.astype(jnp.bfloat16) / 255.0
            for i in range(depth):
                y = conv_bf16(y, ws_f[i], bs_f[i])
            return y
        return body

    def int8_stack(depth):
        def body(x):
            y = (x.astype(jnp.int16) - 128).astype(jnp.int8)
            for i in range(depth):
                y = conv_int8(y, ws_q[i], w_scales[i], bs_f[i],
                              a_scales[i], last=(i == depth - 1))
            return y
        return body

    def looped(body):
        def f(x):
            def it(i, acc):
                xi = x + i.astype(jnp.uint8)  # defeat hoisting, stays u8
                return acc + jnp.sum(body(xi), dtype=jnp.float32)
            return lax.fori_loop(0, K, it, jnp.float32(0.0))
        return jax.jit(f)

    results = {}

    def leg(name, f):
        try:
            float(np.asarray(f(x_u8)))
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(np.asarray(f(x_u8)))
                ts.append(time.perf_counter() - t0)
            results[name] = round(float(np.median(ts)) / K * 1e3, 3)
        except Exception as e:  # noqa: BLE001
            results[name] = repr(e)[:300]
        print(json.dumps({name: results[name]}), flush=True)

    leg("bf16_conv0_ms", looped(bf16_stack(1)))
    leg("int8_conv0_ms", looped(int8_stack(1)))
    leg("bf16_stack_ms", looped(bf16_stack(4)))
    leg("int8_stack_ms", looped(int8_stack(4)))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
