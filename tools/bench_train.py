#!/usr/bin/env python
"""Training-throughput number of record (VERDICT r4 next #2).

Two regimes, both the production trainer's configuration (fused train step,
bf16 compute, windowed metric sync, device-resident batches — no decode):

  1. the proven B=64 T=64 shape (BASELINE.md round-2 hand-run: 15.1 steps/s
     bf16) — now measured by the bench of record, with train-step MFU from
     client-side cost analysis of the CPU-lowered module (the same pattern
     as tools/bench_headline.py: axon's Lowered.cost_analysis stalls).
  2. a config-#4-shaped step (reference hot loop train.py:140-284 at
     max_frames=500: batch 8, T=512 bucket, masked variable lengths,
     device-side augmentation) with remat OFF and ON — answering whether
     the shape fits HBM without remat and what remat costs/buys.

The number of record per shape is the IN-GRAPH steps/s: R optimizer steps
chained inside one lax.fori_loop (state carried, loss accumulated so no
sub-graph dead-codes), one dispatch, one scalar readback — the same regime
as the extraction headline (tools/bench_headline.py) and for the same
reason: per-dispatch tunnel RTT on this dev setup measured 5+ s/step in
degraded windows (0.19 steps/s dispatched vs 15.1 hand-run), overhead a
locally-attached production host does not pay. The per-dispatch number is
still reported with a `_dispatched` suffix for window diagnosis.

Prints a cumulative JSON line after each stage (the orchestrator parses the
LAST line and salvages stdout on timeout, so a stall in a later stage still
leaves the earlier numbers on record).

Usage: python tools/bench_train.py [--steps 20] [--cpu] [--skip_t512]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_BF16_PEAK_FLOPS = 197e12  # per-chip peak, TPU v5e datasheet


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6,
                    help="per-dispatch diagnostic steps; at degraded-tunnel "
                         "rates (0.06-0.14 steps/s measured) each one costs "
                         "seconds, so the default stays small")
    ap.add_argument("--diag_all", action="store_true",
                    help="run the per-dispatch diagnostic on every leg, not "
                         "just leg 1 (the tax is pure tunnel RTT — one "
                         "window sample is enough to characterize it)")
    ap.add_argument("--window", type=int, default=10)
    ap.add_argument("--ingraph_reps", type=int, default=10,
                    help="optimizer steps chained per in-graph dispatch")
    ap.add_argument("--timings", type=int, default=3,
                    help="timed in-graph dispatches (median)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip_t512", action="store_true",
                    help="only the B=64 T=64 leg (fast smoke)")
    ap.add_argument("--batch", type=int, default=64,
                    help="leg-1 batch (default: the proven 64)")
    ap.add_argument("--frames", type=int, default=64,
                    help="leg-1 frames (default: the proven 64)")
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
        init_train_state,
        make_train_step,
    )

    dev = jax.devices()[0]
    out = {"device": str(dev), "steps": args.steps}
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    model = create_model("attention", dtype=jnp.bfloat16)
    # init on the CPU backend: one upload of the final tree instead of an
    # on-TPU init compile (same rationale as bench_headline.py)
    with jax.default_device(jax.devices("cpu")[0]):
        state0 = init_train_state(
            model, None, jax.random.PRNGKey(0), (1, 8, 64, 64, 3))
        host_params = jax.tree.map(np.asarray, state0.params)
        host_stats = jax.tree.map(np.asarray, state0.batch_stats)
    tx = make_optimizer("attention", host_params, learning_rate=1e-4,
                        total_steps=1000)

    def make_batch(B, T, masked):
        batch = {
            "clip1": rng.integers(0, 256, (B, T, 64, 64, 3), dtype=np.uint8),
            "clip2": rng.integers(0, 256, (B, T, 64, 64, 3), dtype=np.uint8),
            "video_id": np.arange(B, dtype=np.int32),
        }
        if masked:
            # variable true lengths up to the bucket, like a real
            # max_frames=500 corpus collated into the 512 bucket
            lens = rng.integers(T // 3, T + 1, size=(B,))
            lens[0] = T  # the bucket is always set by its longest clip
            m = np.arange(T)[None, :] < lens[:, None]
            batch["mask1"] = m
            batch["mask2"] = m.copy()
        else:
            batch["mask1"] = np.ones((B, T), bool)
            batch["mask2"] = np.ones((B, T), bool)
        return batch

    def measure(tag, B, T, masked, device_augment, remat, out_key,
                diag=False, fast_extracts=False):
        """Compile + run the shape in two regimes; returns in-graph steps/s
        (the number of record) or an error marker (RESOURCE_EXHAUSTED at
        T=512 no-remat is itself a result: the shape needs remat on a 16 GB
        chip). The in-graph number is written to `out[out_key]` and emitted
        BEFORE the optional per-dispatch diagnostic (`{tag}_dispatched`,
        one dispatch per step with windowed sync, delta vs in-graph = pure
        tunnel/dispatch tax) so a diagnostic stall cannot cost the number
        of record under the orchestrator's salvage-on-timeout contract.
        """
        raw_step = make_train_step(model, tx, "attention",
                                   device_augment=device_augment, remat=remat,
                                   reuse_extract_features=fast_extracts)
        step_fn = jax.jit(raw_step, donate_argnums=(0,))

        R = args.ingraph_reps

        def chained(state, batch, k):
            # R real optimizer steps in ONE dispatch: state carried through
            # the loop, per-step loss accumulated into the carry so the
            # metrics sub-graph cannot be dead-coded.
            def body(i, carry):
                st, acc = carry
                st2, m = raw_step(st, batch, jax.random.fold_in(k, i))
                return st2, acc + m["loss"].astype(jnp.float32)

            return jax.lax.fori_loop(0, R, body,
                                     (state, jnp.float32(0.0)))

        chained_fn = jax.jit(chained, donate_argnums=(0,))

        def fresh_state():
            st = init_train_state(
                model, None, jax.random.PRNGKey(0), (1, 8, 64, 64, 3)
            ).replace(
                params=jax.device_put(host_params, dev),
                batch_stats=jax.device_put(host_stats, dev),
            )
            return st.replace(opt_state=jax.device_put(
                jax.tree.map(np.asarray, tx.init(host_params)), dev))

        batch = {k: jax.device_put(v, dev)
                 for k, v in make_batch(B, T, masked).items()}
        try:
            # --- in-graph (number of record) ---------------------------
            state = fresh_state()
            t0 = time.perf_counter()
            state, acc = chained_fn(state, batch, key)
            assert np.isfinite(float(acc)), float(acc)
            out[f"{tag}_compile_s"] = round(time.perf_counter() - t0, 1)
            windows = []
            for w in range(args.timings):
                t0 = time.perf_counter()
                state, acc = chained_fn(state, batch,
                                        jax.random.fold_in(key, w + 1))
                acc = float(acc)  # dependent scalar readback = sync
                windows.append(R / (time.perf_counter() - t0))
                assert np.isfinite(acc), acc
            ingraph = float(np.median(windows))
            out[out_key] = round(ingraph, 2)
            print(json.dumps(out), flush=True)
            if not diag:
                return ingraph

            # --- per-dispatch (diagnostic) ------------------------------
            state = fresh_state()
            state, metrics = step_fn(state, batch, key)  # compile
            last = float(metrics["loss"])
            assert np.isfinite(last), last
            t0 = time.perf_counter()
            for i in range(args.steps):
                state, metrics = step_fn(state, batch,
                                         jax.random.fold_in(key, i))
                if (i + 1) % args.window == 0:
                    last = float(metrics["loss"])  # windowed sync point
            if args.steps % args.window != 0:
                last = float(metrics["loss"])  # drain in-flight tail
            assert np.isfinite(last), last
            out[f"{tag}_dispatched_steps_per_sec"] = round(
                args.steps / (time.perf_counter() - t0), 2)
            return ingraph
        except Exception as e:  # noqa: BLE001 — OOM is a reportable result
            msg = str(e)
            oom = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
            out[f"{tag}_error"] = ("OOM" if oom else msg.splitlines()[0][:200])
            return None

    def flops_per_step(B, T, masked, device_augment, remat,
                       fast_extracts=False):
        """Train-step FLOPs from the CPU-lowered module (never touches the
        tunnel); includes fwd+bwd+optimizer — the honest MFU numerator."""
        try:
            step_fn = make_train_step(model, tx, "attention",
                                      device_augment=device_augment,
                                      remat=remat,
                                      reuse_extract_features=fast_extracts)
            with jax.default_device(jax.devices("cpu")[0]):
                st = init_train_state(
                    model, None, jax.random.PRNGKey(0), (1, 8, 64, 64, 3)
                ).replace(params=host_params, batch_stats=host_stats)
                st = st.replace(opt_state=tx.init(host_params))
                cost = (jax.jit(step_fn)
                        .lower(st, make_batch(B, T, masked), key)
                        .cost_analysis())
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0)) or None
        except Exception:
            return None

    # ---- leg 1: the proven shape, production trainer regime -------------
    B1, T1 = args.batch, args.frames
    tag1 = f"b{B1}_t{T1}"
    sps = measure(tag1, B1, T1, masked=False,
                  device_augment=False, remat=False,
                  out_key=f"train_steps_per_sec_{tag1}_bf16", diag=True)
    if sps:
        fl = flops_per_step(B1, T1, False, False, False)
        if fl:
            out[f"train_tflops_per_step_{tag1}"] = round(fl / 1e12, 3)
            out[f"train_mfu_{tag1}"] = round(
                fl * sps / V5E_BF16_PEAK_FLOPS, 4)
    print(json.dumps(out), flush=True)

    # ---- leg 1b: same shape with --fast_extracts (extract-feature reuse:
    # the extract forward gathers the full forward's (2B,T,spatial) feature
    # rows instead of re-running the per-frame CNN on gathered pixels —
    # train_step.py make_loss_fn docstring; measured 1.645x on chip,
    # tools/exp_train_roofline.py, round 5) ------------------------------
    tag1f = f"{tag1}_fast_extracts"
    sps = measure(tag1f, B1, T1, masked=False,
                  device_augment=False, remat=False,
                  out_key=f"train_steps_per_sec_{tag1f}_bf16",
                  fast_extracts=True)
    if sps:
        fl = flops_per_step(B1, T1, False, False, False, fast_extracts=True)
        if fl:
            out[f"train_tflops_per_step_{tag1f}"] = round(fl / 1e12, 3)
            out[f"train_mfu_{tag1f}"] = round(
                fl * sps / V5E_BF16_PEAK_FLOPS, 4)
    print(json.dumps(out), flush=True)

    if args.skip_t512:
        return

    # ---- leg 2: config-#4 shape (batch 8, T=512 bucket, masked,
    # device-augment), remat OFF then ON --------------------------------
    for remat in (False, True):
        tag = f"b8_t512_devaug_remat_{'on' if remat else 'off'}"
        sps = measure(tag, 8, 512, masked=True,
                      device_augment=True, remat=remat,
                      out_key=f"train_steps_per_sec_{tag}",
                      diag=args.diag_all)
        if sps:
            fl = flops_per_step(8, 512, True, True, remat)
            if fl:
                out[f"train_mfu_{tag}"] = round(
                    fl * sps / V5E_BF16_PEAK_FLOPS, 4)
        print(json.dumps(out), flush=True)
    out["t512_fits_hbm_without_remat"] = (
        "b8_t512_devaug_remat_off_error" not in out)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
