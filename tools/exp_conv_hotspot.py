#!/usr/bin/env python
"""Spatial-conv hotspot experiment (VERDICT r2 #8): where does conv0's time go,
and can a layout-level rewrite beat XLA's lowering?

Round-2 profiling: the spatial stack is ~72% of device time, conv0 alone
~35ms/batch (B=512, T=128 -> N=65536 frames) — far above its bandwidth
roofline (~6ms) and its compute roofline (~3ms bf16). Hypothesis: conv0
(5x5 s2, Cin=3, Cout=32) wastes the MXU — the contraction is only
5*5*3=75 of 128 rows, and Cout=32 uses 32 of 128 output columns (~15%
utilization combined).

Probes (each timed by dependent-readback sync, median of R reps):
  convert     u8 -> bf16/255 elementwise pass alone
  conv0_u8    normalize + conv0 + bias + relu from uint8 input
  conv0_bf16  conv0 + bias + relu from pre-normalized bf16 input
              (conv0_u8 - conv0_bf16 ~ convert => XLA did NOT fuse the
              convert; ~0 => fused)
  conv0_wide  widened-conv0 rewrite: pack G=4 adjacent output pixels into
              the channel dim. Kernel (5, 5+2*(G-1), 3, G*32) built in
              numpy with kernel'[ky, kx, c, g*32+co] = w[ky, kx-2g, c, co]
              (zeros elsewhere), stride (2, 2G), VALID on a pre-padded
              input -> (N, 32, 32/G, G*32). 2.2x the MACs of conv0 but
              4x the MXU columns; output stays packed (no transpose back
              — a consumer would fold the unpack into conv1's weights).
  conv0_wide8 same with G=8 (K=165->285, cols already full at G=4; tests
              whether longer K amortizes better than it wastes)

Run on the real chip: python tools/exp_conv_hotspot.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = 65536  # 512 videos x 128 frames
HW = 64
REPS = 5


def _sync(x):
    """Dependent D2H readback — the only trustworthy sync on axon."""
    return float(np.asarray(x.ravel()[0]))


def _time(fn, *args):
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


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


def main():
    import jax
    import jax.numpy as jnp

    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.models.fuse import fuse_variables

    dev = jax.devices()[0]
    print(f"# backend={jax.default_backend()} dev={dev}", flush=True)

    model = create_model("attention")
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.tree.map(
            np.asarray,
            model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 8, HW, HW, 3), jnp.float32)),
        )
    fused = fuse_variables(variables, "attention")
    # BN-folded conv0 weights/bias (the production serve path's first op).
    c0 = fused["params"]["spatial_encoder"]["conv0"]
    w0 = np.asarray(c0["kernel"], np.float32)  # (5, 5, 3, 32)
    b0 = np.asarray(c0["bias"], np.float32)

    rng = np.random.default_rng(0)
    x_u8 = rng.integers(0, 256, (N, HW, HW, 3), dtype=np.uint8)
    x_u8_d = jax.device_put(x_u8, dev)

    def convert(x):
        return (x.astype(jnp.bfloat16) / 255.0)

    def conv0(x, w, b, stride_w=2, pad="torch"):
        # reference conv0: k5 s2 p2 (torch) == SAME-ish; for widened kernels
        # the caller pre-pads and uses VALID.
        if pad == "torch":
            padding = ((2, 2), (2, 2))
        else:
            padding = ((0, 0), (0, 0))
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(2, stride_w),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y + b.astype(y.dtype))

    results = {}

    f_convert = jax.jit(convert)
    f_u8 = jax.jit(lambda x: conv0(convert(x), w0, b0))
    f_bf16 = jax.jit(lambda x: conv0(x, w0, b0))

    # warmup compiles
    x_bf16_d = f_convert(x_u8_d)
    _sync(x_bf16_d)
    _sync(f_u8(x_u8_d))
    _sync(f_bf16(x_bf16_d))

    results["convert_ms"] = _time(f_convert, x_u8_d) * 1e3
    results["conv0_u8_ms"] = _time(f_u8, x_u8_d) * 1e3
    results["conv0_bf16_ms"] = _time(f_bf16, x_bf16_d) * 1e3
    print(json.dumps({k: round(v, 2) for k, v in results.items()}), flush=True)

    # Widened variants: pre-pad width so every window is valid. Output width
    # must be 32 = (W_pad - KW)/(2G) + 1 groups*G ... we pad H by 2/2 (torch)
    # and W to cover the widened kernel: widened needs, for group g at output
    # x q (q = G*q' + g): input cols 2*(G*q') .. +KW-1 relative to -2 origin.
    def make_wide(G):
        wG, bG = widen_kernel(w0, b0, G)
        kw = wG.shape[1]
        n_groups = 32 // G
        # last group starts at padded col 2*G*(n_groups-1); its window must fit
        w_pad = 2 * G * (n_groups - 1) + kw
        pad_hi = max(0, w_pad - (HW + 2))

        def f_wide(x):
            x = convert(x)
            x = jnp.pad(x, ((0, 0), (2, 2), (2, pad_hi), (0, 0)))
            return conv0(x, wG, bG, stride_w=2 * G, pad="valid")

        return jax.jit(f_wide)

    wide_fns = {}
    for G in (4, 8):
        f = make_wide(G)
        wide_fns[G] = f
        out = f(x_u8_d)
        _sync(out)
        results[f"conv0_wide{G}_ms"] = _time(f, x_u8_d) * 1e3
        results[f"conv0_wide{G}_shape"] = str(out.shape)
        print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                          for k, v in results.items()}), flush=True)

    # Correctness: widened G=4 output equals the plain conv0 output re-packed
    # (output pixel j = 4*q' + g lives at [..., q', g*32:(g+1)*32]).
    y_ref = np.asarray(f_bf16(x_bf16_d)[:64].astype(jnp.float32))
    y_w = np.asarray(wide_fns[4](x_u8_d)[:64].astype(jnp.float32))
    yw_unpacked = y_w.reshape(64, 32, 8, 4, 32).reshape(64, 32, 32, 32)
    err = float(np.max(np.abs(y_ref - yw_unpacked)))
    results["wide4_vs_ref_maxerr"] = err

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
