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


def test_two_process_training_matches_single_process(tmp_path):
    """Multi-host end-to-end training EQUIVALENCE (VERDICT r3 next #5): 4
    train steps + one validation (with a partial trailing batch) on
    deterministic global data must produce the same per-step loss curve and
    continuous val metrics under 2 processes x 2 devices as under 1 process
    x 4 devices. The cluster smoke above proves liveness; this proves the
    numbers."""
    worker = REPO_ROOT / "tools" / "multihost_smoke_worker.py"

    def run(nprocs: int, devices_per_proc: int, port: int, sub: str):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={devices_per_proc}"
        )
        env["JAX_PLATFORMS"] = "cpu"
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(pid), str(nprocs),
                 str(port), "equiv", str(tmp_path / sub)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                cwd=REPO_ROOT, env=env,
            )
            for pid in range(nprocs)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
            assert p.returncode == 0, out[-3000:]
        return outs

    pat = (r"equiv over \d+ processes OK curve=\[([0-9.,]+)\] "
           r"val_loss=([0-9.]+) intra=([-0-9.]+) inter=([-0-9.]+) "
           r"gap=([-0-9.]+)")

    def parse(out):
        m = re.search(pat, out)
        assert m, out[-3000:]
        curve = [float(x) for x in m.group(1).split(",")]
        return curve, [float(m.group(i)) for i in range(2, 6)]

    outs2 = run(2, 2, 12477, "two")
    out1 = run(1, 4, 12487, "one")[0]
    curve_a, scalars_a = parse(outs2[0])
    curve_b, scalars_b = parse(outs2[1])
    curve_1, scalars_1 = parse(out1)
    assert curve_a == curve_b and scalars_a == scalars_b  # ranks agree
    assert len(curve_1) == 4
    # loss curve strictly decreasing-ish sanity: training actually happened
    assert curve_1[0] != curve_1[-1]
    import numpy as np

    np.testing.assert_allclose(curve_a, curve_1, rtol=2e-4)
    np.testing.assert_allclose(scalars_a, scalars_1, rtol=2e-4, atol=2e-5)


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


def test_two_process_sharded_dedup():
    """Corpus-sharded dedup over a REAL 2-process cluster: the shard_map
    ring, the host-side certificate/repair logic, and the output replication
    (`_replicate_for_host` — without it every rank's np.asarray of the
    P('corpus')-sharded results raises `spans non-addressable devices`,
    reproduced) must work across processes, not just the in-process mesh.
    Exercises exact, certified (repairs forced), certified-bf16 and the
    query-vs-corpus search; each rank checks the numpy oracle itself."""
    worker = REPO_ROOT / "tools" / "multihost_smoke_worker.py"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", "12447", "dedup"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO_ROOT, env=env,
        )
        for pid in range(2)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=420)
        assert p.returncode == 0, out[-2000:]
        assert "sharded dedup over 2 processes OK" in out, out[-2000:]
