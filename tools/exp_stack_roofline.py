#!/usr/bin/env python
"""Full-stack roofline decomposition of the production extraction forward.

Measures each stage of the fused bf16 attention forward (the headline
program) cumulatively in-graph at the production shape, so the gap between
the whole forward and the sum of per-stage memory/compute rooflines is
quantified — the question "is there headroom left without cross-layer
Pallas fusion?" gets a number instead of a guess.

Legs (each looped K times in-graph per the axon timing rules —
tools/exp_conv_hotspot.py postmortems):
  convert    u8 -> bf16/255 + reduce                    (input-read floor)
  conv0      + conv0+bias+relu
  conv1..3   cumulative spatial stack
  spatial    + avgpool + linear -> (B, T, 128)          (full encode_frames)
  full       entire forward_flat (temporal + attention + pooling + proj)

Run on the real chip: python tools/exp_stack_roofline.py
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(os.environ.get("EXP_N", 16384))  # frames; production B=512,T=128 is 4x
HW = 64
K = int(os.environ.get("EXP_K", 20))
REPS = int(os.environ.get("EXP_REPS", 3))
B_VIDEOS = int(os.environ.get("EXP_B", 128))  # N frames = B_VIDEOS * T
V5E_PEAK = 197e12
HBM_BW = 819e9  # v5e datasheet


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.models.fuse import fuse_variables

    dev = jax.devices()[0]
    T = N // B_VIDEOS
    print(f"# backend={jax.default_backend()} N={N} K={K} B={B_VIDEOS} T={T}",
          flush=True)

    model = create_model("attention")
    fused_model = create_model("attention", fused=True, dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.tree.map(
            np.asarray,
            model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 8, HW, HW, 3), jnp.float32)),
        )
    fused_host = fuse_variables(variables, "attention")
    fused_vars = jax.device_put(fused_host, dev)
    convs = [fused_host["params"]["spatial_encoder"][f"conv{i}"]["conv"]
             for i in range(4)]
    ws = [np.asarray(c["kernel"], np.float32) for c in convs]
    bs = [np.asarray(c["bias"], np.float32) for c in convs]

    rng = np.random.default_rng(0)
    x_u8 = jax.device_put(
        rng.integers(0, 256, (N, HW, HW, 3), dtype=np.uint8), dev)

    def conv_relu(x, w, b):
        y = lax.conv_general_dilated(
            x, jnp.asarray(w, x.dtype), window_strides=(2, 2),
            padding=((2, 2), (2, 2)) if w.shape[0] == 5 else ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y + jnp.asarray(b, y.dtype))

    def stack_through(depth):
        def f(xb):
            y = xb
            for i in range(depth):
                y = conv_relu(y, ws[i], bs[i])
            return y
        return f

    def looped(body):
        def f(x):
            def it(i, acc):
                xb = (x.astype(jnp.bfloat16) / 255.0
                      + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                return acc + jnp.sum(body(xb), dtype=jnp.float32)
            return lax.fori_loop(0, K, it, jnp.float32(0.0))
        return jax.jit(f)

    # the full forward consumes raw u8 via forward_flat; loop it with a
    # perturbation on the uint8 input instead (wrap-add keeps it u8).
    def looped_full():
        def f(x):
            def it(i, acc):
                xi = x + i.astype(jnp.uint8)
                emb = fused_model.apply(fused_vars, xi, B_VIDEOS,
                                        method="forward_flat")
                return acc + jnp.sum(emb, dtype=jnp.float32)
            return lax.fori_loop(0, K, it, jnp.float32(0.0))
        return jax.jit(f)

    results = {}

    def leg(name, f):
        try:
            float(np.asarray(f(x_u8)))  # compile + warm
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(np.asarray(f(x_u8)))
                ts.append(time.perf_counter() - t0)
            ms = float(np.median(ts)) / K * 1e3
            results[name] = round(ms, 3)
            print(json.dumps({name: results[name]}), flush=True)
        except Exception as e:  # noqa: BLE001
            results[f"{name}_error"] = repr(e)[:200]
            print(json.dumps({name: results[f"{name}_error"]}), flush=True)

    leg("convert_ms", looped(lambda xb: xb))
    for d in range(1, 5):
        leg(f"conv0_{d - 1}_ms", looped(stack_through(d)))
    leg("full_forward_ms", looped_full())

    # rooflines (per in-graph iteration, this N)
    dims = [(32, 32, 32), (16, 16, 64), (8, 8, 128), (4, 4, 256)]
    traffic = N * HW * HW * 3 * 1  # u8 read
    flops = 0.0
    roof = {}
    kparams = [(5, 3, 32), (3, 32, 64), (3, 64, 128), (3, 128, 256)]
    for i, ((h, w, c), (kk, cin, cout)) in enumerate(zip(dims, kparams)):
        out_elems = N * h * w * c
        flops += out_elems * kk * kk * cin * 2
        traffic += out_elems * 2  # bf16 write
        if i < 3:
            traffic += out_elems * 2  # read by the next conv
        roof[f"conv_thru_{i}_roofline_ms"] = round(
            max(traffic / HBM_BW, flops / V5E_PEAK) * 1e3, 3)
    results.update(roof)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
