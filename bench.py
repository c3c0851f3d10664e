#!/usr/bin/env python
"""Headline benchmark: fingerprint-extraction throughput (videos/sec/chip).

Workload: attention-model fingerprint extraction on 128-frame 64x64 clips
(BASELINE.md configs #1/#2 operating point), device path only (decode is a
host-side constant shared by both frameworks). Production scan configuration:
fused inference layout (eval BN folded into conv weights — models/fuse.py),
bfloat16 compute (cosine vs torch f32 goldens >0.999, gated in
tests/test_fused_inference.py), frames staged pre-flattened uint8 (avoids two
full-HBM relayout passes; see models/attention.py:forward_flat). Baseline: the
PyTorch reference model (torch CPU wheel, batch=1 — the reference scanner
cannot batch, fingerprint.py:18).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

B = 512        # device batch (amortizes the ~30ms dev-tunnel RTT per call)
T = 128        # frames per video
HW = 64
N_BATCHES = 4
PIPELINE_DEPTH = 12  # dispatches per pipelined timing window
REF_VIDEOS = 3  # reference torch-CPU videos to time (slow)


def bench_tpu():
    """Returns (pipelined_vps, sync_vps, streaming_vps).

    pipelined: batches dispatched back-to-back (XLA async dispatch), one
    blocking readback at the end — the chip's sustained extraction throughput
    and the headline "videos/sec/chip" metric (the production scanner
    dispatches exactly this way, scanner.py:_AsyncPipeline). sync: one
    blocking readback per batch; on this dev box that adds a ~30ms tunnel
    RTT per batch that a locally-attached chip would not see. streaming:
    includes per-batch uint8 H2D through the ~35 MB/s relay tunnel (reflects
    the tunnel, not the hardware).
    """
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

    # D2H readback is the sync: block_until_ready is unreliable on the
    # experimental axon backend, and pulling embeddings to host is the real
    # pipeline's sync anyway. Median over windows: the tunnel shows transient
    # multi-second stalls unrelated to the workload.
    staged = [jax.device_put(a, dev) for a in batches]
    np.asarray(fwd(fused_vars, staged[0]))  # compile + warm

    pipe_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fwd(fused_vars, staged[i % N_BATCHES]) for i in range(PIPELINE_DEPTH)]
        for o in outs:
            np.asarray(o)
        pipe_times.append((time.perf_counter() - t0) / PIPELINE_DEPTH)
    pipelined_vps = B / float(np.median(pipe_times))

    sync_times = []
    for x in staged * 3:
        t0 = time.perf_counter()
        np.asarray(fwd(fused_vars, x))
        sync_times.append(time.perf_counter() - t0)
    sync_vps = B / float(np.median(sync_times))

    stream_times = []
    for arr in batches:
        t0 = time.perf_counter()
        np.asarray(fwd(fused_vars, jnp.asarray(arr)))
        stream_times.append(time.perf_counter() - t0)
    stream_vps = B / float(np.median(stream_times))
    return pipelined_vps, sync_vps, stream_vps


def bench_reference_torch() -> float:
    """The reference model, torch CPU, batch=1 (its scanner's regime)."""
    import numpy as np
    import torch

    ref_dir = Path("/root/reference")
    if not ref_dir.exists():
        return -1.0
    sys.path.insert(0, str(ref_dir))
    import model as ref  # executed, not copied

    torch.manual_seed(0)
    m = ref.create_model("attention")
    m.eval()
    rng = np.random.default_rng(0)
    clips = [
        torch.from_numpy(rng.random((1, T, 3, HW, HW), dtype=np.float32))
        for _ in range(REF_VIDEOS)
    ]
    with torch.no_grad():
        m(clips[0])  # warmup
        times = []
        for c in clips:
            t0 = time.perf_counter()
            m(c)
            times.append(time.perf_counter() - t0)
    # median per-video: the 1-core host shows multi-x noise across runs
    return 1.0 / float(np.median(times))


def bench_e2e_scan() -> dict:
    """Decode-inclusive scan throughput (BASELINE config #2; VERDICT #4).

    Runs tools/bench_scan_e2e.py in a SUBPROCESS so (a) it opens the TPU
    before this process does (must be called before bench_tpu) and (b) a
    corpus-generation or tunnel failure can never sink the headline metric.
    Skippable with VFP_BENCH_SKIP_E2E=1; hard 900s timeout.
    """
    import os
    import subprocess

    if os.environ.get("VFP_BENCH_SKIP_E2E", "0") == "1":
        return {}
    try:
        out = subprocess.run(
            [sys.executable, str(Path(__file__).parent / "tools" / "bench_scan_e2e.py"),
             "--videos", "60", "--frames", "96", "--workers", "8"],
            capture_output=True, text=True, timeout=900,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        print(f"# e2e bench produced no JSON (rc={out.returncode}): "
              f"{out.stderr.strip().splitlines()[-1:] }", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 - never sink the headline
        print(f"# e2e bench skipped: {e}", file=sys.stderr)
    return {}


def main():
    e2e = bench_e2e_scan()  # subprocess; must run before this process's jax init
    pipelined_vps, sync_vps, stream_vps = bench_tpu()
    baseline = bench_reference_torch()
    vs = pipelined_vps / baseline if baseline > 0 else -1.0
    result = {
        "metric": "fingerprint extraction throughput (attention, T=128, 64x64)",
        "value": round(pipelined_vps, 3),
        "unit": "videos/sec/chip",
        "vs_baseline": round(vs, 2),
        "sync_per_batch_vps": round(sync_vps, 3),
        "streaming_vps_via_dev_tunnel": round(stream_vps, 3),
        "reference_torch_cpu_vps": round(baseline, 3),
    }
    result.update(e2e)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
