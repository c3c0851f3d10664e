"""Multi-host (2-process) DP training smoke over a localhost coordinator.

Spawns two fresh processes so jax.distributed can form a real cluster (the
in-process test mesh cannot); each feeds its own input shard and both must
compute the identical global loss.
"""

import os
import re
import subprocess
import sys

from tests.conftest import REPO_ROOT

import pytest

pytestmark = pytest.mark.slow


def test_two_process_dp_train_step():
    worker = REPO_ROOT / "tools" / "multihost_smoke_worker.py"
    env = dict(os.environ)
    # one CPU device per process (conftest's 8-device flag must not leak)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", "12437"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO_ROOT, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]

    losses = []
    for out in outs:
        m = re.search(r"DP train step over 2 processes OK, loss=([0-9.]+)", out)
        assert m, out[-2000:]
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1]  # identical global loss on both ranks
