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

B = 8          # device batch
T = 128        # frames per video
HW = 64
N_WARMUP = 2
N_BATCHES = 12
REF_VIDEOS = 3  # reference torch-CPU videos to time (slow)


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_fingerprint_tpu.models import create_model

    model = create_model("attention")
    rng = np.random.default_rng(0)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, HW, HW, 3), jnp.float32)
    )

    fwd = jax.jit(model.apply)
    batches = [
        rng.random((B, T, HW, HW, 3), dtype=np.float32) for _ in range(N_BATCHES)
    ]

    # sync via D2H readback of the (B, 256) embeddings: block_until_ready has
    # proven unreliable on the experimental axon backend; the readback is the
    # realistic pipeline sync anyway (the scanner pulls embeddings to host).
    for i in range(N_WARMUP):
        np.asarray(fwd(variables, jnp.asarray(batches[i % len(batches)])))

    t0 = time.perf_counter()
    for arr in batches:
        np.asarray(fwd(variables, jnp.asarray(arr)))
    dt = time.perf_counter() - t0
    return (N_BATCHES * B) / dt


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
        t0 = time.perf_counter()
        for c in clips:
            m(c)
        dt = time.perf_counter() - t0
    return REF_VIDEOS / dt


def main():
    value = bench_tpu()
    baseline = bench_reference_torch()
    vs = value / baseline if baseline > 0 else -1.0
    print(json.dumps({
        "metric": "fingerprint extraction throughput (attention, T=128, 64x64)",
        "value": round(value, 3),
        "unit": "videos/sec/chip",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
