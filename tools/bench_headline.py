#!/usr/bin/env python
"""Headline chip measurement: fingerprint-extraction videos/sec/chip.

Run by bench.py in a subprocess so the orchestrator never holds the TPU
(the experimental axon backend is effectively exclusive per process) and a
tunnel stall here cannot starve the other bench legs. Prints ONE JSON line.

Workload: attention-model extraction on 128-frame 64x64 clips (BASELINE.md
configs #1/#2 operating point), production scan configuration — fused
inference layout (eval BN folded into conv weights, models/fuse.py),
bfloat16 compute (cosine vs torch f32 goldens >0.999, gated in
tests/test_fused_inference.py), frames staged pre-flattened uint8
(models/attention.py:forward_flat avoids two full-HBM relayouts).

Timing discipline (docs/ROUND2_NOTES.md): sync via dependent D2H readback
(`block_until_ready` returns early on axon), median over windows (the dev
tunnel shows transient multi-second stalls unrelated to the workload).
Reports MFU = achieved FLOP/s / v5e bf16 peak so perf rounds stay
comparable even when the tunnel is noisy (VERDICT r2 #7).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = 512        # device batch (amortizes the ~30ms dev-tunnel RTT per call)
T = 128        # frames per video
HW = 64
N_BATCHES = 4
PIPELINE_DEPTH = 12  # dispatches per pipelined timing window
V5E_BF16_PEAK_FLOPS = 197e12  # per-chip peak, TPU v5e datasheet


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_fingerprint_tpu.models import create_model

    from video_fingerprint_tpu.models.fuse import fuse_variables

    model = create_model("attention")
    fused_model = create_model("attention", fused=True, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, HW, HW, 3), jnp.float32)
    )
    fused_vars = jax.device_put(fuse_variables(variables, "attention"), dev)

    # uint8 + on-device normalize: the production scan pipeline ships uint8
    # frames (4x less transfer), pre-flattened to (B*T, H, W, C).
    fwd = jax.jit(lambda v, x: fused_model.apply(v, x, B, method="forward_flat"))
    batches = [
        (rng.random((B * T, HW, HW, 3)) * 255).astype(np.uint8)
        for _ in range(N_BATCHES)
    ]
    staged = [jax.device_put(a, dev) for a in batches]

    np.asarray(fwd(fused_vars, staged[0]))  # compile + warm
    # NB: plain jit dispatch on purpose — AOT `lower().compile()` never
    # completes on the axon remote-compile backend (round-3 postmortem: two
    # 600s bench timeouts). FLOPs for MFU come from the *lowered* module
    # after the measurements, alarm-guarded, so they can never sink the
    # number (see main's tail).

    # Pipelined dispatch: batches dispatched back-to-back (XLA async), one
    # blocking readback per window — the production scanner's regime
    # (scanner.py:_AsyncPipeline) and the headline videos/sec/chip metric.
    pipe_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fwd(fused_vars, staged[i % N_BATCHES]) for i in range(PIPELINE_DEPTH)]
        for o in outs:
            np.asarray(o)
        pipe_times.append((time.perf_counter() - t0) / PIPELINE_DEPTH)
    pipe_t = float(np.median(pipe_times))
    pipelined_vps = B / pipe_t

    # Sync dispatch: one readback per batch; on this dev box that pays a
    # ~30ms tunnel RTT per batch a locally-attached chip would not see.
    sync_times = []
    for x in staged * 3:
        t0 = time.perf_counter()
        np.asarray(fwd(fused_vars, x))
        sync_times.append(time.perf_counter() - t0)
    sync_vps = B / float(np.median(sync_times))

    # Streaming: includes per-batch uint8 H2D through the ~35 MB/s relay
    # tunnel (reflects the tunnel, not the hardware).
    stream_times = []
    for arr in batches:
        t0 = time.perf_counter()
        np.asarray(fwd(fused_vars, jnp.asarray(arr)))
        stream_times.append(time.perf_counter() - t0)
    stream_vps = B / float(np.median(stream_times))

    out = {
        "pipelined_vps": round(pipelined_vps, 3),
        "sync_per_batch_vps": round(sync_vps, 3),
        "streaming_vps_via_dev_tunnel": round(stream_vps, 3),
    }
    print(json.dumps(out), flush=True)  # measurements are safe on stdout now

    # MFU from client-side cost analysis of the lowered module (no backend
    # compile). Alarm-guarded: if analysis hangs or is unsupported on this
    # backend, the measurement line above already stands.
    import signal

    signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(TimeoutError()))
    signal.alarm(60)
    try:
        cost = fwd.lower(fused_vars, staged[0]).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_call = float(cost.get("flops", 0.0))
        if flops_per_call > 0:
            out["mfu_vs_v5e_bf16_peak"] = round(
                flops_per_call / pipe_t / V5E_BF16_PEAK_FLOPS, 4
            )
            out["tflops_per_batch"] = round(flops_per_call / 1e12, 3)
            print(json.dumps(out), flush=True)
    except Exception:
        pass
    finally:
        signal.alarm(0)


if __name__ == "__main__":
    main()
