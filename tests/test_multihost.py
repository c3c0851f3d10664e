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


def test_two_process_full_epoch_single_writer(tmp_path):
    """Full Trainer epoch (train + validate with a partial trailing batch +
    checkpointing) over 2 processes x 2 devices. Asserts the reference's
    artifact semantics hold under N processes: exactly ONE writer."""
    worker = REPO_ROOT / "tools" / "multihost_smoke_worker.py"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", "12457", "full",
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO_ROOT, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    losses = []
    for out in outs:
        m = re.search(r"full epoch over 2 processes OK, val_loss=([0-9.]+)", out)
        assert m, out[-3000:]
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1]  # identical global val loss on both ranks

    # single-writer discipline: rank 0 owns the full artifact set ...
    rank0 = tmp_path / "rank0"
    for artifact in (
        "config.json", "training_info.txt", "training_log.txt",
        "training_summary.txt", "checkpoints/last.ckpt",
        "checkpoints/best.ckpt",
    ):
        assert (rank0 / artifact).exists(), f"missing {artifact}"
    # ... and rank 1 wrote NOTHING into its own run dir
    rank1_files = [p for p in (tmp_path / "rank1").rglob("*") if p.is_file()]
    assert rank1_files == [], f"rank 1 wrote: {rank1_files}"
