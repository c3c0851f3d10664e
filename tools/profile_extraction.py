#!/usr/bin/env python
"""Stage-level timing breakdown of attention-fingerprint extraction on TPU.

Answers "where does the 108ms/batch go?" (VERDICT round-1, weak #1): times the
full forward, the spatial conv stack, the temporal stack, and first-conv
layout variants, each as its own jitted program with chip-resident inputs and
a scalar-reduced output (so the ~30ms-RTT dev tunnel costs one small D2H per
call instead of a 32MB embedding pull).

Usage:  python tools/profile_extraction.py [--trace DIR]
With --trace, also captures a jax.profiler xplane trace of the full forward.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from video_fingerprint_tpu.models import create_model

B, T, HW = 512, 128, 64
REPS = 8


def timeit(fn, *args) -> float:
    """Median seconds per call; fn must return a scalar (cheap D2H sync)."""
    np.asarray(fn(*args))  # compile + warm
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="capture xplane trace to DIR")
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    rng = np.random.default_rng(0)
    frames_u8 = jax.device_put(
        (rng.random((B, T, HW, HW, 3)) * 255).astype(np.uint8), dev
    )

    for name, dtype in [("f32", None), ("bf16", jnp.bfloat16)]:
        model = create_model("attention", dtype=dtype)
        variables = jax.device_put(
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, HW, HW, 3), jnp.float32)),
            dev,
        )
        cdt = dtype or jnp.float32

        full = jax.jit(
            lambda v, x: jnp.sum(model.apply(v, x.astype(cdt) / 255.0))
        )
        spatial = jax.jit(
            lambda v, x: jnp.sum(
                model.apply(v, x.astype(cdt) / 255.0, method="encode_frames")
            )
        )

        def temporal_fn(m, feats):
            tf = m.temporal_encoding(feats)
            pooled = m.adaptive_pooling(tf)
            import flax.linen as nn
            h = nn.relu(m.final_projection_1(pooled))
            return jnp.sum(m.final_projection_2(h))

        feats = jax.device_put(rng.random((B, T, 128)).astype(np.float32), dev)
        temporal = jax.jit(
            lambda v, f: model.apply(v, f.astype(cdt), method=temporal_fn)
        )

        t_full = timeit(full, variables, frames_u8)
        t_spatial = timeit(spatial, variables, frames_u8)
        t_temporal = timeit(temporal, variables, feats)
        print(
            f"[{name}] full={t_full*1e3:7.1f}ms  spatial={t_spatial*1e3:7.1f}ms "
            f"temporal={t_temporal*1e3:7.1f}ms  -> {B/t_full:,.0f} videos/s",
            flush=True,
        )

    # --- the production serve config: fused BN + bf16 + pre-flattened u8 ---
    from video_fingerprint_tpu.models.fuse import fuse_variables

    base = create_model("attention")
    base_vars = base.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, HW, HW, 3), jnp.float32)
    )
    fused_vars = jax.device_put(fuse_variables(base_vars, "attention"), dev)
    flat_u8 = jax.device_put(
        (rng.random((B * T, HW, HW, 3)) * 255).astype(np.uint8), dev
    )
    for name, dtype in [("fused-f32", None), ("fused-bf16", jnp.bfloat16)]:
        fm = create_model("attention", fused=True, dtype=dtype)
        cdt = dtype or jnp.float32
        full_f = jax.jit(
            lambda v, x: jnp.sum(fm.apply(v, x, B, method="forward_flat"))
        )
        spatial_f = jax.jit(
            lambda v, x: jnp.sum(
                fm.apply(v, x.astype(cdt) / 255.0,
                         method=lambda m, y: m.spatial_encoder(y))
            )
        )
        t_full = timeit(full_f, fused_vars, flat_u8)
        t_spatial = timeit(spatial_f, fused_vars, flat_u8)
        print(
            f"[{name}] full={t_full*1e3:7.1f}ms  spatial={t_spatial*1e3:7.1f}ms"
            f"  -> {B/t_full:,.0f} videos/s",
            flush=True,
        )

    # --- first-conv layout variants (the suspected MXU-starved op) ---------
    N = B * T  # 65536 frames
    x_f = jax.device_put(rng.random((N, HW, HW, 3)).astype(np.float32), dev)
    k5 = jax.device_put(rng.random((5, 5, 3, 32)).astype(np.float32), dev)
    k3 = jax.device_put(rng.random((3, 3, 12, 32)).astype(np.float32), dev)

    def conv_plain(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (2, 2), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y)

    def conv_s2d(x, k):
        n, h, w, c = x.shape
        y = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(n, h // 2, w // 2, 4 * c)
        y = jax.lax.conv_general_dilated(
            y, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y)

    for nm, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        xa, ka5, ka3 = x_f.astype(dt), k5.astype(dt), k3.astype(dt)
        t_plain = timeit(jax.jit(conv_plain), xa, ka5)
        t_s2d = timeit(jax.jit(conv_s2d), xa, ka3)
        print(
            f"[conv1 {nm}] k5s2 Cin=3: {t_plain*1e3:6.1f}ms   "
            f"s2d k3s1 Cin=12: {t_s2d*1e3:6.1f}ms",
            flush=True,
        )

    if args.trace:
        model = create_model("attention")
        variables = jax.device_put(
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, HW, HW, 3), jnp.float32)),
            dev,
        )
        full = jax.jit(lambda v, x: jnp.sum(model.apply(v, x.astype(jnp.float32) / 255.0)))
        np.asarray(full(variables, frames_u8))
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                np.asarray(full(variables, frames_u8))
        print(f"trace written to {args.trace}", flush=True)


if __name__ == "__main__":
    main()
