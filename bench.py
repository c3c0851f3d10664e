#!/usr/bin/env python
"""Headline benchmark: fingerprint-extraction throughput (videos/sec/chip).

Workload: attention-model fingerprint extraction on 128-frame 64x64 clips
(BASELINE.md configs #1/#2 operating point), device path only (decode is a
host-side constant shared by both frameworks). Batched bucketed extraction on
the TPU vs the reference's own extraction regime measured by running the
PyTorch reference model (torch CPU wheel, batch=1 — the reference scanner
cannot batch, fingerprint.py:18).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

B = 512        # device batch (amortizes the ~30ms dev-tunnel RTT per call)
T = 128        # frames per video
HW = 64
N_WARMUP = 2
N_BATCHES = 4
REF_VIDEOS = 3  # reference torch-CPU videos to time (slow)


def bench_tpu():
    """Returns (chip_videos_per_sec, streaming_videos_per_sec).

    chip: inputs pre-staged in HBM — the chip's extraction throughput (the
    BASELINE "videos/sec/chip" metric). streaming: includes per-batch uint8
    H2D; on this dev box the TPU sits behind a ~35 MB/s relay tunnel, so
    streaming reflects the tunnel, not the hardware (a real deployment feeds
    over PCIe/ICI at GB/s).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_fingerprint_tpu.models import create_model

    model = create_model("attention")
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    variables = jax.device_put(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, HW, HW, 3), jnp.float32)),
        dev,
    )

    # uint8 + on-device normalize: the production scan pipeline ships uint8
    # frames (4x less transfer) and fuses x/255 into the first conv.
    fwd = jax.jit(lambda v, x: model.apply(v, x.astype(jnp.float32) / 255.0))
    batches = [
        (rng.random((B, T, HW, HW, 3)) * 255).astype(np.uint8)
        for _ in range(N_BATCHES)
    ]

    # D2H readback is the sync: block_until_ready is unreliable on the
    # experimental axon backend, and pulling embeddings to host is the real
    # pipeline's sync anyway. Median over batches: the tunnel shows transient
    # multi-second stalls unrelated to the workload.
    staged = [jax.device_put(a, dev) for a in batches[:4]]
    np.asarray(fwd(variables, staged[0]))  # compile + warm
    chip_times = []
    for x in staged * 3:
        t0 = time.perf_counter()
        np.asarray(fwd(variables, x))
        chip_times.append(time.perf_counter() - t0)
    chip_vps = B / float(np.median(chip_times))

    stream_times = []
    for arr in batches:
        t0 = time.perf_counter()
        np.asarray(fwd(variables, jnp.asarray(arr)))
        stream_times.append(time.perf_counter() - t0)
    stream_vps = B / float(np.median(stream_times))
    return chip_vps, stream_vps


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


def main():
    chip_vps, stream_vps = bench_tpu()
    baseline = bench_reference_torch()
    vs = chip_vps / baseline if baseline > 0 else -1.0
    print(json.dumps({
        "metric": "fingerprint extraction throughput (attention, T=128, 64x64)",
        "value": round(chip_vps, 3),
        "unit": "videos/sec/chip",
        "vs_baseline": round(vs, 2),
        "streaming_vps_via_dev_tunnel": round(stream_vps, 3),
        "reference_torch_cpu_vps": round(baseline, 3),
    }))


if __name__ == "__main__":
    main()
