#!/usr/bin/env python
"""Is the u8 input's C=3 minor dim what makes the convert floor 8.5x the
pure-read roofline (tools/exp_stack_roofline.py: 2.05ms vs 0.24ms at
N=16384)?

Legs (in-graph K-loops, scalar reduce):
  c3_convert     (N, 64, 64, 3) u8 -> bf16 + sum      (the production read)
  flat_convert   (N, 64, 192) u8 (same bytes) -> bf16 + sum
  flat_reshape   (N, 64, 192) u8 -> bf16 -> reshape (N,64,64,3) + sum
  c3_conv0       convert + conv0 (production)
  flat_conv0     flat convert -> reshape -> conv0 (does feeding conv0 from
                 the compact read help, or does the reshape re-pay it?)

Run on the real chip: python tools/exp_input_layout.py
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

    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.models.fuse import fuse_variables

    dev = jax.devices()[0]
    print(f"# backend={jax.default_backend()} N={N} K={K}", flush=True)

    model = create_model("attention")
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.tree.map(
            np.asarray,
            model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 8, HW, HW, 3), jnp.float32)),
        )
    fused = fuse_variables(variables, "attention")
    c0 = fused["params"]["spatial_encoder"]["conv0"]["conv"]
    w0 = np.asarray(c0["kernel"], np.float32)
    b0 = np.asarray(c0["bias"], np.float32)

    rng = np.random.default_rng(0)
    x_np = rng.integers(0, 256, (N, HW, HW, 3), dtype=np.uint8)
    x_c3 = jax.device_put(x_np, dev)
    x_flat = jax.device_put(x_np.reshape(N, HW, HW * 3), dev)

    def conv0(xb):
        y = lax.conv_general_dilated(
            xb, jnp.asarray(w0, xb.dtype), window_strides=(2, 2),
            padding=((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y + jnp.asarray(b0, y.dtype))

    def looped(body):
        def f(x):
            def it(i, acc):
                xb = (x.astype(jnp.bfloat16) / 255.0
                      + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                return acc + jnp.sum(body(xb), dtype=jnp.float32)
            return lax.fori_loop(0, K, it, jnp.float32(0.0))
        return jax.jit(f)

    results = {}

    def leg(name, f, x):
        try:
            float(np.asarray(f(x)))
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(np.asarray(f(x)))
                ts.append(time.perf_counter() - t0)
            results[name] = round(float(np.median(ts)) / K * 1e3, 3)
            print(json.dumps({name: results[name]}), flush=True)
        except Exception as e:  # noqa: BLE001
            results[f"{name}_error"] = repr(e)[:200]
            print(json.dumps({name: results[f"{name}_error"]}), flush=True)

    leg("c3_convert_ms", looped(lambda xb: xb), x_c3)
    leg("flat_convert_ms", looped(lambda xb: xb), x_flat)
    leg("flat_reshape_ms",
        looped(lambda xb: xb.reshape(N, HW, HW, 3)), x_flat)
    leg("c3_conv0_ms", looped(conv0), x_c3)
    leg("flat_conv0_ms",
        looped(lambda xb: conv0(xb.reshape(N, HW, HW, 3))), x_flat)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
