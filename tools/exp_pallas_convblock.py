#!/usr/bin/env python
"""Pallas conv-block probe: is cross-layer conv fusion viable in Mosaic?

Context (docs/DESIGN.md "Where the forward's time goes"): every spatial-
encoder conv is HBM-traffic-bound and XLA runs each within ~1.3-2.4x of its
own roofline. The only remaining headroom is cross-layer fusion keeping
intermediates in VMEM. Whether that fusion can WIN depends on two Mosaic
facts this probe establishes:

1. **Stride-2 slab extraction is unsupported at the vector level.** Mosaic
   verifies `vector.extract_strided_slice` strides to [1, 2), so a stride-2
   conv cannot subsample its input inside a kernel by slicing
   (VerificationError, reproduced by EXP_STRIDED=1). Every workaround moves
   the cost elsewhere: parity/residue pre-decomposition (turns one conv into
   per-residue assembly), selection matmuls (FLOP waste), or per-level
   relayouts. Here the parity split is done OUTSIDE the kernel by XLA
   (even/odd column tensors) — i.e. the kernel is measured with the stride
   problem solved for free, a best case the fused kernel cannot actually get.

2. **im2col patch assembly is VPU byte-moves that may not hide behind DMA.**
   A conv-as-matmul kernel must materialize (K, spatial*F) patches in VMEM
   (taps cannot stream into the MXU from shifted views); that copies
   K/Cin x the output bytes. Fusion saves HBM traffic (~0.27 us/frame
   across the stack) but adds VPU copies (~0.48 us/frame) — a net loss
   UNLESS Mosaic overlaps VPU assembly with the MXU and the grid DMA.
   This probe measures that overlap directly: pallas conv2 vs XLA conv2,
   same HBM traffic, identical math.

Layout under test: activations (Cin, Y, X/2, F) x2 parity tensors, F=128
frames in lanes (the encoder is per-frame, frames fill lanes exactly).
Per output row y': 9 unit-stride slab slices -> (9*Cin, X'*F) patch ->
one transposed matmul (M=Cout streams, no lane waste; cf. the closed NHWC
negatives in exp_conv_hotspot.py).

Shapes: conv2 of the encoder (k3 s2 pad1, 64->128ch, 16x16 -> 8x8), the
layer XLA runs closest to its roofline (1.10 ms per 16384 frames, table in
DESIGN.md) — the hardest parity target for a hand kernel.

Legs (median of REPS calls; each call = K in-graph fori_loop iterations with
an iteration-dependent bias perturbation; scalar reduce):
  xla_nhwc     lax.conv_general_dilated on (N,16,16,64) + relu + sum
  pallas_cyxf  the kernel above on 2x (64,16,8,N) parity tensors + sum

Run: python tools/exp_pallas_convblock.py            (chip)
     JAX_PLATFORMS=cpu EXP_INTERPRET=1 python ...    (numerics only)
     EXP_STRIDED=1 python ...                        (reproduce the Mosaic
                                                      stride VerificationError)
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(os.environ.get("EXP_N", 16384))        # frames
K = int(os.environ.get("EXP_K", 20))           # in-graph iterations per call
REPS = int(os.environ.get("EXP_REPS", 3))
F_BLOCK = 128                                  # frames per grid step = lanes
CIN, COUT, HW_IN, HW_OUT = 64, 128, 16, 8
XH = HW_IN // 2                                # parity-tensor width


def make_pallas_conv(interpret=False, strided=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel_strided(x_ref, w_ref, b_ref, o_ref):
        # The direct formulation Mosaic rejects: stride-2 slab slices.
        xv = x_ref[...]
        xp = jnp.pad(xv, ((0, 0), (1, 1), (1, 1), (0, 0)))
        w = w_ref[...]
        bias = b_ref[...].astype(jnp.float32)
        for yp in range(HW_OUT):
            rows = jax.lax.slice(
                xp, (0, 2 * yp, 0, 0), (CIN, 2 * yp + 3, HW_IN + 2, F_BLOCK))
            slabs = []
            for dy in range(3):
                for dx in range(3):
                    s = jax.lax.slice(
                        rows, (0, dy, dx, 0),
                        (CIN, dy + 1, dx + 2 * HW_OUT, F_BLOCK), (1, 1, 2, 1))
                    slabs.append(s.reshape(CIN, HW_OUT, F_BLOCK))
            patch = jnp.concatenate(slabs, axis=0)
            acc = jax.lax.dot_general(
                w, patch.reshape(9 * CIN, HW_OUT * F_BLOCK),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            acc = jnp.maximum(acc + bias, 0.0).astype(o_ref.dtype)
            o_ref[:, yp, :, :] = acc.reshape(COUT, HW_OUT, F_BLOCK)

    def kernel(xe_ref, xo_ref, w_ref, b_ref, o_ref):
        # Parity-split inputs: xe = cols 0,2,..., xo = cols 1,3,...
        # x_in = 2x' + dx - 1:  dx=0 -> xo[x'-1] (zero at x'=0),
        #                       dx=1 -> xe[x'],   dx=2 -> xo[x'].
        xe = xe_ref[...]                                   # (CIN, 16, 8, 128)
        xo = xo_ref[...]
        zcol = jnp.zeros((CIN, 3, 1, F_BLOCK), xe.dtype)
        zrow = jnp.zeros((CIN, 1, XH, F_BLOCK), xe.dtype)
        w = w_ref[...]
        bias = b_ref[...].astype(jnp.float32)
        for yp in range(HW_OUT):
            # input rows 2yp-1 .. 2yp+1, zero-padded at the image border
            y0 = 2 * yp - 1
            if y0 < 0:
                re = jnp.concatenate(
                    [zrow, jax.lax.slice(xe, (0, 0, 0, 0),
                                         (CIN, 2, XH, F_BLOCK))], axis=1)
                ro = jnp.concatenate(
                    [zrow, jax.lax.slice(xo, (0, 0, 0, 0),
                                         (CIN, 2, XH, F_BLOCK))], axis=1)
            elif y0 + 3 > HW_IN:
                re = jnp.concatenate(
                    [jax.lax.slice(xe, (0, y0, 0, 0),
                                   (CIN, HW_IN, XH, F_BLOCK)), zrow], axis=1)
                ro = jnp.concatenate(
                    [jax.lax.slice(xo, (0, y0, 0, 0),
                                   (CIN, HW_IN, XH, F_BLOCK)), zrow], axis=1)
            else:
                re = jax.lax.slice(xe, (0, y0, 0, 0),
                                   (CIN, y0 + 3, XH, F_BLOCK))
                ro = jax.lax.slice(xo, (0, y0, 0, 0),
                                   (CIN, y0 + 3, XH, F_BLOCK))
            # dx=0: xo shifted right by one output column (zero at x'=0)
            o_shift = jnp.concatenate(
                [zcol, jax.lax.slice(ro, (0, 0, 0, 0),
                                     (CIN, 3, XH - 1, F_BLOCK))], axis=2)
            slabs = []
            for dy in range(3):
                for src in (o_shift, re, ro):              # dx = 0, 1, 2
                    slabs.append(jax.lax.slice(
                        src, (0, dy, 0, 0), (CIN, dy + 1, XH, F_BLOCK)
                    ).reshape(CIN, XH, F_BLOCK))
            patch = jnp.concatenate(slabs, axis=0)         # (9*CIN, 8, 128)
            acc = jax.lax.dot_general(
                w, patch.reshape(9 * CIN, XH * F_BLOCK),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            acc = jnp.maximum(acc + bias, 0.0).astype(o_ref.dtype)
            o_ref[:, yp, :, :] = acc.reshape(COUT, XH, F_BLOCK)

    def conv(xe, xo, w2d, b):
        n_frames = xe.shape[-1]
        grid = (n_frames // F_BLOCK,)
        if strided:
            return pl.pallas_call(
                kernel_strided,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((CIN, HW_IN, HW_IN, F_BLOCK),
                                 lambda i: (0, 0, 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((COUT, 9 * CIN), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((COUT, 1), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((COUT, HW_OUT, HW_OUT, F_BLOCK),
                                       lambda i: (0, 0, 0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (COUT, HW_OUT, HW_OUT, n_frames), jnp.bfloat16),
                interpret=interpret,
            )(xe, w2d, b)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((CIN, HW_IN, XH, F_BLOCK),
                             lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((CIN, HW_IN, XH, F_BLOCK),
                             lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((COUT, 9 * CIN), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((COUT, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((COUT, HW_OUT, HW_OUT, F_BLOCK),
                                   lambda i: (0, 0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (COUT, HW_OUT, HW_OUT, n_frames), jnp.bfloat16),
            interpret=interpret,
        )(xe, xo, w2d, b)

    return conv


def check_numerics(interpret, strided=False):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    nf = F_BLOCK * 2
    x_nhwc = rng.standard_normal((nf, HW_IN, HW_IN, CIN)).astype(np.float32)
    k_hwio = (rng.standard_normal((3, 3, CIN, COUT)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(COUT) * 0.1).astype(np.float32)

    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x_nhwc, jnp.bfloat16), jnp.asarray(k_hwio, jnp.bfloat16),
        (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    ref = jnp.maximum(ref + b, 0.0).astype(jnp.bfloat16)

    conv = make_pallas_conv(interpret=interpret, strided=strided)
    x_cyxf = np.transpose(x_nhwc, (3, 1, 2, 0))            # (CIN, Y, X, F)
    w2d = jnp.asarray(np.transpose(k_hwio, (3, 0, 1, 2)).reshape(COUT, 9 * CIN),
                      jnp.bfloat16)
    bj = jnp.asarray(b.reshape(COUT, 1), jnp.bfloat16)
    if strided:
        got = conv(jnp.asarray(x_cyxf, jnp.bfloat16), None, w2d, bj)
    else:
        xe = jnp.asarray(x_cyxf[:, :, 0::2, :], jnp.bfloat16)
        xo = jnp.asarray(x_cyxf[:, :, 1::2, :], jnp.bfloat16)
        got = conv(xe, xo, w2d, bj)
    got_nhwc = jnp.transpose(got, (3, 1, 2, 0))
    delta = float(jnp.max(jnp.abs(got_nhwc.astype(jnp.float32)
                                  - ref.astype(jnp.float32))))
    print(json.dumps({"leg": "numerics", "interpret": interpret,
                      "max_abs_delta": delta}))
    return delta


def time_leg(fn, *args):
    import jax
    outs = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        outs.append((time.perf_counter() - t0) / K * 1000.0)
    return float(np.median(outs))


def main():
    import jax
    import jax.numpy as jnp

    interpret = bool(int(os.environ.get("EXP_INTERPRET", "0")))
    strided = bool(int(os.environ.get("EXP_STRIDED", "0")))
    delta = check_numerics(interpret, strided=strided)
    assert delta < 0.1, f"numerics mismatch: {delta}"
    if interpret:
        return

    rng = np.random.default_rng(1)
    k_hwio = jnp.asarray((rng.standard_normal((3, 3, CIN, COUT)) * 0.1),
                         jnp.bfloat16)
    w2d = jnp.asarray(
        np.transpose(np.asarray(k_hwio, np.float32), (3, 0, 1, 2))
        .reshape(COUT, 9 * CIN), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(COUT), jnp.bfloat16)

    conv = make_pallas_conv(strided=strided)

    @jax.jit
    def xla_leg():
        x = jnp.broadcast_to(
            jnp.arange(HW_IN * CIN, dtype=jnp.bfloat16).reshape(
                1, 1, HW_IN, CIN) / 1000.0,
            (N, HW_IN, HW_IN, CIN))

        def body(i, acc):
            bi = b + i.astype(jnp.bfloat16) * 1e-6
            o = jax.lax.conv_general_dilated(
                x, k_hwio, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            o = jnp.maximum(o + bi, 0.0).astype(jnp.bfloat16)
            return acc + jnp.sum(o.astype(jnp.float32))

        return jax.lax.fori_loop(0, K, body, 0.0)

    @jax.jit
    def pallas_leg():
        xe = jnp.broadcast_to(
            jnp.arange(XH * CIN, dtype=jnp.bfloat16).reshape(
                CIN, 1, XH, 1) / 1000.0,
            (CIN, HW_IN, XH, N))
        xo = xe + 0.5

        def body(i, acc):
            bi = (b + i.astype(jnp.bfloat16) * 1e-6).reshape(COUT, 1)
            o = conv(xe, xo, w2d, bi)
            return acc + jnp.sum(o.astype(jnp.float32))

        return jax.lax.fori_loop(0, K, body, 0.0)

    legs = [("xla_nhwc", xla_leg)]
    if not strided:
        legs.append(("pallas_cyxf", pallas_leg))
    for name, leg in legs:
        ms = time_leg(leg)
        print(json.dumps({"leg": name, "n_frames": N, "k_iters": K,
                          "ms_per_iter": round(ms, 3)}))


if __name__ == "__main__":
    main()
