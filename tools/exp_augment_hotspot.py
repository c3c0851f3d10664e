#!/usr/bin/env python
"""Per-stage device timing of the on-device augmentation pipeline.

Round-3 follow-up: the TPU placement bench measured the device-augment train
step at 2.5 steps/s vs 39 augment-off (B=16, T=64) — ~375ms of augmentation
for 2x16x64 frames, vs the expected "a few elementwise passes". This probe
times each stage of ops/device_augment.apply_augmentations in isolation to
find the pathological op before rewriting anything.

Methodology per docs/ROUND3_NOTES.md postmortems: each stage loops K times
in-graph (fori_loop, iteration-dependent perturbation so nothing hoists),
output reduced to a scalar, sync via the dependent D2H readback of that
scalar (block_until_ready lies on axon), median of 3 timed calls.

Usage: python tools/exp_augment_hotspot.py [--batch 16] [--frames 64] [--k 8]
       [--cpu]
Prints one JSON line: per-stage ms/iteration.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_fingerprint_tpu.ops import device_augment as da

    dev = jax.devices()[0]
    B, T, HW = args.batch, args.frames, 64
    rng = np.random.default_rng(0)
    clips = jax.device_put(
        rng.random((B, T, HW, HW, 3), np.float32), dev)
    key = jax.random.PRNGKey(0)
    # per-frame letterbox/overlay/rotation params, the production shape
    params = jax.jit(partial(da.sample_params, batch=B, frame_size=HW,
                             num_frames=T))(key)
    params = jax.device_put(jax.tree.map(np.asarray, params), dev)

    def staged(fn):
        """K in-graph iterations of fn with a per-iteration perturbation,
        scalar-reduced."""

        def run(x):
            def body(i, acc):
                y = fn(x + acc * 1e-12)
                return acc + jnp.sum(y) * 1e-30 + i * 0.0

            return jax.lax.fori_loop(0, args.k, body, 0.0)

        return jax.jit(run)

    stages = {
        "color": lambda x: da._color(x, params),
        "flip": lambda x: jnp.where(
            params["do_flip"].reshape((B, 1, 1, 1, 1)) > 0,
            x[:, :, :, ::-1, :], x),
        "noise": lambda x: jnp.clip(
            x + jax.random.normal(jax.random.PRNGKey(1), x.shape, x.dtype)
            * params["noise_level"].reshape((B, 1, 1, 1, 1)), 0.0, 1.0),
        "blur": lambda x: da._blur(x, params["blur_idx"]),
        "letterbox_overlay": lambda x: _letterbox_overlay(jnp, params, x),
        "rotation": lambda x: da._rotate_bilinear(x, params["rotation_angle"]),
        "full_pipeline": lambda x: da.apply_augmentations(
            params, x, jax.random.PRNGKey(2)),
    }

    out = {"batch": B, "frames": T, "k": args.k}
    for name, fn in stages.items():
        f = staged(fn)
        _ = float(f(clips))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(f(clips))  # dependent D2H readback = sync
            ts.append(time.perf_counter() - t0)
            assert np.isfinite(v)
        out[f"{name}_ms_per_iter"] = round(
            statistics.median(ts) / args.k * 1000, 3)
    print(json.dumps(out))


def _letterbox_overlay(jnp, params, x):
    B = x.shape[0]
    H, W = x.shape[2], x.shape[3]
    g = lambda name: params[name].reshape((B, 1, 1, 1, 1))  # noqa: E731
    # (B,) or per-frame (B, T) params, like ops/device_augment
    fb = lambda p: p.reshape(p.shape + (1,) * (5 - p.ndim))  # noqa: E731
    bar = fb(params["letterbox_bar"])
    rows = jnp.arange(H).reshape((1, 1, H, 1, 1))
    cols = jnp.arange(W).reshape((1, 1, 1, W, 1))
    row_bar = (rows < bar) | (rows >= H - bar)
    col_bar = (cols < bar) | (cols >= W - bar)
    vert = fb(params["letterbox_vertical"]) > 0
    barred = jnp.where(vert, jnp.where(row_bar, 0.0, x),
                       jnp.where(col_bar, 0.0, x))
    x = jnp.where(g("do_letterbox") > 0, barred, x)
    oy, ox, ohh, oww = [fb(params["overlay_box"][..., i]) for i in range(4)]
    in_box = ((rows >= oy) & (rows < oy + ohh)
              & (cols >= ox) & (cols < ox + oww))
    return jnp.where(g("do_overlay") * in_box > 0, 0.7 * x + 0.3, x)


if __name__ == "__main__":
    main()
