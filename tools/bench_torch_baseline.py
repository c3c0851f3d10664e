#!/usr/bin/env python
"""Reference baseline: the PyTorch model, torch CPU, batch=1.

Batch=1 is the reference scanner's own regime — it cannot batch
(/root/reference/fingerprint.py:18 "TODO: parallelize, can't batch because
of variable frame lengths"). The reference is EXECUTED from /root/reference,
not copied. Measures >=20 videos and reports median + IQR (VERDICT r2 #7:
the old 3-video sample on this 1-core host had multi-x error bars).

Prints ONE JSON line: {"reference_torch_cpu_vps", "reference_torch_cpu_iqr_vps",
"reference_videos_timed"}.
"""

import json
import sys
import time
from pathlib import Path

T = 128
HW = 64
N_VIDEOS = 20


def main():
    import numpy as np
    import torch

    ref_dir = Path("/root/reference")
    if not ref_dir.exists():
        print(json.dumps({"reference_torch_cpu_vps": -1.0}), flush=True)
        return
    sys.path.insert(0, str(ref_dir))
    import model as ref  # executed, not copied

    torch.manual_seed(0)
    m = ref.create_model("attention")
    m.eval()
    rng = np.random.default_rng(0)
    clips = [
        torch.from_numpy(rng.random((1, T, 3, HW, HW), dtype=np.float32))
        for _ in range(4)
    ]
    with torch.no_grad():
        m(clips[0])  # warmup
        times = []
        for i in range(N_VIDEOS):
            c = clips[i % len(clips)]
            t0 = time.perf_counter()
            m(c)
            times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    q1, q3 = np.percentile(times, [25, 75])
    print(json.dumps({
        "reference_torch_cpu_vps": round(1.0 / med, 3),
        # per-video rate spread: 1/q3 (slow quartile) .. 1/q1 (fast quartile)
        "reference_torch_cpu_iqr_vps": [round(1.0 / float(q3), 3),
                                        round(1.0 / float(q1), 3)],
        "reference_videos_timed": N_VIDEOS,
    }), flush=True)


if __name__ == "__main__":
    main()
