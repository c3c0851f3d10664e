#!/usr/bin/env python
"""Train-step throughput: per-step metric sync vs windowed sync (VERDICT #5).

The round-1 trainer called float(metrics["loss"]) every step, blocking
dispatch on the device result (trainer.py round-1); the round-2 trainer
materializes metrics once per `metrics_every` window. This tool measures the
steps/s delta of exactly that change with device-resident batches (no decode),
on whatever backend is active (real chip by default).

Usage: python tools/bench_train_step.py [--batch 64] [--frames 64] [--steps 30]
Prints one JSON line with steps/s for sync-every-step vs sync-every-10.
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--window", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 model compute (the train CLI's --bf16)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.optim import make_optimizer
    from video_fingerprint_tpu.training.train_step import (
        init_train_state, make_train_step,
    )

    dev = jax.devices()[0]
    B, T, HW = args.batch, args.frames, 64
    model = create_model(
        "attention", dtype=jnp.bfloat16 if args.bf16 else None
    )
    state = init_train_state(
        model, None, jax.random.PRNGKey(0), (1, 8, HW, HW, 3)
    )
    tx = make_optimizer(
        "attention", state.params, learning_rate=1e-4, total_steps=1000
    )
    state = state.replace(opt_state=tx.init(state.params))
    state = jax.device_put(state, dev)
    step_fn = jax.jit(
        make_train_step(model, tx, model_type="attention"), donate_argnums=(0,)
    )

    rng = np.random.default_rng(0)
    batch = {
        "clip1": jax.device_put(
            rng.random((B, T, HW, HW, 3), dtype=np.float32), dev),
        "clip2": jax.device_put(
            rng.random((B, T, HW, HW, 3), dtype=np.float32), dev),
        "video_id": jax.device_put(np.arange(B, dtype=np.int32), dev),
        "mask1": jax.device_put(np.ones((B, T), dtype=bool), dev),
        "mask2": jax.device_put(np.ones((B, T), dtype=bool), dev),
    }
    key = jax.random.PRNGKey(1)

    # compile + warm
    state, metrics = step_fn(state, batch, key)
    _ = float(metrics["loss"])

    def run(sync_every: int) -> float:
        nonlocal state
        t0 = time.perf_counter()
        last = None
        for i in range(args.steps):
            state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
            if (i + 1) % sync_every == 0:
                last = float(metrics["loss"])  # deliberate sync point
        # drain the tail: steps past the last window boundary are still
        # in flight — the timer must not stop before they complete
        if args.steps % sync_every != 0 or last is None:
            last = float(metrics["loss"])
        assert np.isfinite(last)
        return args.steps / (time.perf_counter() - t0)

    per_step = run(1)
    windowed = run(args.window)
    print(json.dumps({
        "batch": B, "frames": T, "steps": args.steps,
        "steps_per_sec_sync_every_step": round(per_step, 3),
        f"steps_per_sec_sync_every_{args.window}": round(windowed, 3),
        "speedup": round(windowed / per_step, 3),
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
