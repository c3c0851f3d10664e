#!/usr/bin/env python
"""Spatial-conv hotspot experiment (VERDICT r2 #8): where does conv0's time go,
and can a layout-level rewrite beat XLA's lowering?

Round-2 profiling: the spatial stack is ~72% of device time, conv0 alone
~35ms/batch (B=512, T=128 -> N=65536 frames) — far above its bandwidth
roofline (~6ms) and its compute roofline (~3ms bf16). Hypothesis: conv0
(5x5 s2, Cin=3, Cout=32) wastes the MXU — the contraction is only
5*5*3=75 of 128 rows, and Cout=32 uses 32 of 128 output columns (~15%
utilization combined).

Hard layout constraints discovered by this probe's earlier runs on v5e:
  * a bf16 (N, 64, 64, 3) tensor cannot be materialized as a program
    input/output — T(8,128) tiling pads the trailing dim 3 -> 128 lanes
    (42x, 68GB at N=65536). The production path never hits this because
    the u8->bf16 convert fuses into conv0's input read.
  * even conv0's OUTPUT (N, 32, 32, 32) pads 32 -> 128 lanes (4x, 17GB at
    N=65536) when materialized as a program output; the remote compile
    helper dies (HTTP 500). In the model it is consumed in-program.

So: every leg here keeps the conv INSIDE the program and reduces its output
to a scalar (the reduce is a fused consumer — identical across legs, so
comparisons hold), and loops the op K times in-graph via `lax.fori_loop`
with an iteration-dependent input perturbation (prevents hoisting) to
amortize the ~30ms tunnel RTT out of the measurement.

Probes (median of R calls; each call = K in-graph iterations):
  convert_sum   u8 -> bf16/255 + scalar sum (input-read + reduce floor)
  conv0_u8      normalize + conv0 + bias + relu + sum (production op)
  conv0_wideG   widened-conv0 rewrite: pack G adjacent output pixels into
                the channel dim. Kernel (5, 5+2*(G-1), 3, G*32) built in
                numpy with kernel'[ky, kx, c, g*32+co] = w[ky, kx-2g, c, co]
                (zeros elsewhere), stride (2, 2G) -> (N, 32, 32/G, G*32).
                ~2.2x the MACs of conv0 but 4x (G=4) the MXU columns and a
                lane-exact 128-channel output; packed output would be
                consumed by folding the unpack into conv1's weights.

Run on the real chip: python tools/exp_conv_hotspot.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

N = int(os.environ.get("EXP_N", 16384))  # 128 videos x 128 frames; x4 for B=512
HW = 64
K = int(os.environ.get("EXP_K", 20))     # in-graph iterations per timed call
REPS = int(os.environ.get("EXP_REPS", 3))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.models.fuse import fuse_variables

    dev = jax.devices()[0]
    print(f"# backend={jax.default_backend()} dev={dev} N={N} K={K}", flush=True)

    model = create_model("attention")
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.tree.map(
            np.asarray,
            model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 8, HW, HW, 3), jnp.float32)),
        )
    fused = fuse_variables(variables, "attention")
    # BN-folded conv0 weights/bias (the production serve path's first op).
    c0 = fused["params"]["spatial_encoder"]["conv0"]["conv"]
    w0 = np.asarray(c0["kernel"], np.float32)  # (5, 5, 3, 32)
    b0 = np.asarray(c0["bias"], np.float32)

    rng = np.random.default_rng(0)
    x_u8 = rng.integers(0, 256, (N, HW, HW, 3), dtype=np.uint8)
    x_u8_d = jax.device_put(x_u8, dev)

    def convert(x):
        return x.astype(jnp.bfloat16) / 255.0

    def conv_relu(x, w, b, stride_w, padding):
        y = lax.conv_general_dilated(
            x, jnp.asarray(w, x.dtype),
            window_strides=(2, stride_w),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y + jnp.asarray(b, y.dtype))

    def looped(body):
        """Sum body(x_bf16 + i*eps) over K iters; eps prevents hoisting."""
        def f(x):
            def it(i, acc):
                xb = convert(x) + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                return acc + jnp.sum(body(xb), dtype=jnp.float32)
            return lax.fori_loop(0, K, it, jnp.float32(0.0))
        return jax.jit(f)

    def _sync(x):
        # dependent D2H readback — the only trustworthy sync on axon
        return float(np.asarray(x))

    results = {}

    def leg(name, f):
        try:
            _sync(f(x_u8_d))  # compile + warm
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                _sync(f(x_u8_d))
                ts.append(time.perf_counter() - t0)
            per_iter_ms = float(np.median(ts)) / K * 1e3
            results[f"{name}_ms_per_iter"] = round(per_iter_ms, 3)
            print(json.dumps({name: results[f"{name}_ms_per_iter"]}), flush=True)
        except Exception as e:  # noqa: BLE001 - record and continue
            results[f"{name}_error"] = repr(e)[:200]
            print(json.dumps({name: results[f"{name}_error"]}), flush=True)

    # -- floor: input read + convert + reduce, no conv
    leg("convert_sum", looped(lambda xb: xb))

    # -- production conv0 (convert fused into the conv program)
    leg("conv0_u8", looped(lambda xb: conv_relu(xb, w0, b0, 2, ((2, 2), (2, 2)))))

    # -- widened variants
    for G in (4, 8):
        wG, bG = widen_kernel(w0, b0, G)
        kw = wG.shape[1]
        n_groups = 32 // G
        # torch pad=2 => padded width 66; the widened VALID geometry needs
        # 2*G*(n_groups-1) + kw total width; express as conv-op padding.
        need = 2 * G * (n_groups - 1) + kw
        pad_hi = max(0, need - (HW + 2))
        leg(f"conv0_wide{G}",
            looped(lambda xb, wG=wG, bG=bG, G=G, pad_hi=pad_hi:
                   conv_relu(xb, wG, bG, 2 * G, ((2, 2), (2, pad_hi)))))

    # -- correctness: widened G=4 == plain conv0 re-packed, at a tiny N
    # (output pixel j = 4*q' + g lives at [..., q', g*32:(g+1)*32]).
    try:
        w4, b4 = widen_kernel(w0, b0, 4)
        xs = x_u8[:64]
        f_ref = jax.jit(lambda x: conv_relu(convert(x), w0, b0, 2,
                                            ((2, 2), (2, 2))).astype(jnp.float32))
        f_w = jax.jit(lambda x: conv_relu(convert(x), w4, b4, 8,
                                          ((2, 2), (2, 1))).astype(jnp.float32))
        y_ref = np.asarray(f_ref(xs))
        y_w = np.asarray(f_w(xs))
        yw_unpacked = y_w.reshape(64, 32, 8, 4, 32).reshape(64, 32, 32, 32)
        results["wide4_vs_ref_maxerr"] = float(np.max(np.abs(y_ref - yw_unpacked)))
    except Exception as e:  # noqa: BLE001
        results["wide4_check_error"] = repr(e)[:200]

    print(json.dumps(results), flush=True)


def widen_kernel(w: np.ndarray, b: np.ndarray, group: int):
    """(5,5,3,32) stride-2 kernel -> (5, 5+2*(group-1), 3, group*32) that
    computes `group` adjacent output pixels per application (stride 2*group).
    """
    kh, kw, cin, cout = w.shape
    wide = np.zeros((kh, kw + 2 * (group - 1), cin, group * cout), w.dtype)
    for g in range(group):
        wide[:, 2 * g:2 * g + kw, :, g * cout:(g + 1) * cout] = w
    bias = np.tile(b, group)
    return wide, bias


if __name__ == "__main__":
    main()
