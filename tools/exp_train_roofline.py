#!/usr/bin/env python
"""Train-step decomposition + extract-feature-reuse decision (round 5).

The training number of record is MFU 0.140 (tools/bench_train.py) vs the
extraction forward's 0.27 — this probe decomposes the B=64 T=64 bf16 step
to find where the time goes, and measures the `reuse_extract_features`
optimization (train_step.py): the extract forward re-encodes frames the
full forward JUST encoded, so gathering the (2B, T, spatial_dim) feature
rows instead of re-running the per-frame CNN on gathered pixels removes
~half the step's CNN FLOPs (fwd and bwd) and the (B,T,H,W,C) pixel
gather/scatter pair.

Legs (each: in-graph lax.fori_loop of R reps, one dispatch, one scalar
readback — the bench-of-record regime; FLOPs from the CPU-lowered module):

  step_base   full train step, two pixel forwards (production default)
  step_reuse  full train step, reuse_extract_features=True
  fwd_base    loss value only (no grad/optimizer), two pixel forwards
  fwd_reuse   loss value only, feature reuse

Derived: bwd+opt time = step - fwd per mode; achieved TFLOP/s per leg
locates the inefficiency (fwd vs bwd) and the reuse win splits into its
FLOP cut vs per-FLOP rate change.

Run on the real chip: python tools/exp_train_roofline.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = int(os.environ.get("EXP_B", 64))
T = int(os.environ.get("EXP_T", 64))
R = int(os.environ.get("EXP_R", 10))
TIMINGS = int(os.environ.get("EXP_TIMINGS", 3))
# comma-separated tag filter (e.g. EXP_ONLY=step_reuse,fwd_reuse) so a
# degraded-tunnel window (compiles measured 90+ s each at T=512) doesn't
# force re-measuring legs already on record
ONLY = {t for t in os.environ.get("EXP_ONLY", "").split(",") if t}
V5E_BF16_PEAK_FLOPS = 197e12


def main():
    import jax
    import jax.numpy as jnp

    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.optim import make_optimizer
    from video_fingerprint_tpu.training.train_step import (
        init_train_state,
        make_loss_fn,
        make_train_step,
    )

    dev = jax.devices()[0]
    out = {"device": str(dev), "B": B, "T": T, "R": R}
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    model = create_model("attention", dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        state0 = init_train_state(
            model, None, jax.random.PRNGKey(0), (1, 8, 64, 64, 3))
        host_params = jax.tree.map(np.asarray, state0.params)
        host_stats = jax.tree.map(np.asarray, state0.batch_stats)
    tx = make_optimizer("attention", host_params, learning_rate=1e-4,
                        total_steps=1000)

    batch_host = {
        "clip1": rng.integers(0, 256, (B, T, 64, 64, 3), dtype=np.uint8),
        "clip2": rng.integers(0, 256, (B, T, 64, 64, 3), dtype=np.uint8),
        "video_id": np.arange(B, dtype=np.int32),
        "mask1": np.ones((B, T), bool),
        "mask2": np.ones((B, T), bool),
    }
    batch = {k: jax.device_put(v, dev) for k, v in batch_host.items()}

    def fresh_state():
        st = init_train_state(
            model, None, jax.random.PRNGKey(0), (1, 8, 64, 64, 3)
        ).replace(
            params=jax.device_put(host_params, dev),
            batch_stats=jax.device_put(host_stats, dev),
        )
        return st.replace(opt_state=jax.device_put(
            jax.tree.map(np.asarray, tx.init(host_params)), dev))

    def cpu_flops(fn, *args):
        try:
            with jax.default_device(jax.devices("cpu")[0]):
                cost = jax.jit(fn).lower(*args).cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0)) or None
        except Exception:
            return None

    def time_ingraph(chained_fn, init_carry, tag):
        """Time the chained dispatch; when the fn returns (state, acc) the
        state is threaded forward between windows — the state arg is DONATED
        (donate_argnums=(0,)), so reusing init_carry after the first call
        would hand the TPU a deleted buffer (manifests as INVALID_ARGUMENT
        at readback on axon, silently works on CPU where donation is a
        no-op)."""
        t0 = time.perf_counter()
        carry = chained_fn(init_carry, batch, key)
        threaded = isinstance(carry, tuple)
        acc = float(carry[-1] if threaded else carry)
        assert np.isfinite(acc), (tag, acc)
        out[f"{tag}_compile_s"] = round(time.perf_counter() - t0, 1)
        rates = []
        state = carry[0] if threaded else init_carry
        for w in range(TIMINGS):
            t0 = time.perf_counter()
            carry = chained_fn(state, batch, jax.random.fold_in(key, w))
            acc = float(carry[-1] if threaded else carry)
            rates.append(R / (time.perf_counter() - t0))
            assert np.isfinite(acc), (tag, acc)
            if threaded:
                state = carry[0]
        return float(np.median(rates))

    # ---- full-step legs --------------------------------------------------
    for tag, reuse in [("step_base", False), ("step_reuse", True)]:
        if ONLY and tag not in ONLY:
            continue
        raw_step = make_train_step(model, tx, "attention",
                                   reuse_extract_features=reuse)

        def chained(state, batch, k, raw_step=raw_step):
            def body(i, carry):
                st, acc = carry
                st2, m = raw_step(st, batch, jax.random.fold_in(k, i))
                return st2, acc + m["loss"].astype(jnp.float32)
            st, acc = jax.lax.fori_loop(0, R, body, (state, jnp.float32(0.0)))
            return st, acc

        chained_fn = jax.jit(chained, donate_argnums=(0,))
        sps = time_ingraph(chained_fn, fresh_state(), tag)
        out[f"{tag}_steps_per_sec"] = round(sps, 2)
        with jax.default_device(jax.devices("cpu")[0]):
            st_cpu = init_train_state(
                model, None, jax.random.PRNGKey(0), (1, 8, 64, 64, 3)
            ).replace(params=host_params, batch_stats=host_stats)
            st_cpu = st_cpu.replace(opt_state=tx.init(host_params))
        fl = cpu_flops(make_train_step(model, tx, "attention",
                                       reuse_extract_features=reuse),
                       st_cpu, batch_host, key)
        if fl:
            out[f"{tag}_tflops"] = round(fl / 1e12, 3)
            out[f"{tag}_achieved_tflops_s"] = round(fl * sps / 1e12, 1)
            out[f"{tag}_mfu"] = round(fl * sps / V5E_BF16_PEAK_FLOPS, 4)
        print(json.dumps(out), flush=True)

    # ---- forward-only legs ----------------------------------------------
    for tag, reuse in [("fwd_base", False), ("fwd_reuse", True)]:
        if ONLY and tag not in ONLY:
            continue
        loss_fn = make_loss_fn(model, "attention",
                               reuse_extract_features=reuse)

        def chained(params_stats, batch, k, loss_fn=loss_fn):
            params, stats = params_stats
            def body(i, acc):
                loss, _ = loss_fn(params, stats, batch,
                                  jax.random.fold_in(k, i))
                return acc + loss.astype(jnp.float32)
            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

        chained_fn = jax.jit(chained)
        carry0 = (jax.device_put(host_params, dev),
                  jax.device_put(host_stats, dev))
        sps = time_ingraph(chained_fn, carry0, tag)
        out[f"{tag}_per_sec"] = round(sps, 2)
        fl = cpu_flops(
            lambda ps, b, k, loss_fn=loss_fn: loss_fn(ps[0], ps[1], b, k)[0],
            (host_params, host_stats), batch_host, key)
        if fl:
            out[f"{tag}_tflops"] = round(fl / 1e12, 3)
            out[f"{tag}_achieved_tflops_s"] = round(fl * sps / 1e12, 1)
        print(json.dumps(out), flush=True)

    # ---- derived decomposition -------------------------------------------
    try:
        sb = out["step_base_steps_per_sec"]; sr = out["step_reuse_steps_per_sec"]
        fb = out["fwd_base_per_sec"]; fr = out["fwd_reuse_per_sec"]
        out["bwd_opt_ms_base"] = round(1000 * (1 / sb - 1 / fb), 1)
        out["bwd_opt_ms_reuse"] = round(1000 * (1 / sr - 1 / fr), 1)
        out["reuse_step_speedup"] = round(sr / sb, 3)
        out["reuse_fwd_speedup"] = round(fr / fb, 3)
    except KeyError:
        pass
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
