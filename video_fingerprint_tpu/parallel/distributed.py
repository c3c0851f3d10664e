"""Multi-host initialization and data-parallel placement helpers.

The reference is single-process/single-device (SURVEY.md §2 checklist); this
is the TPU-native replacement: DP over ICI within a slice via GSPMD shardings,
multi-host over DCN via `jax.distributed.initialize` (standard JAX runtime —
no custom transport). The per-host input shard comes from
(`jax.process_index()`, `jax.process_count()`) and is consumed by the
dataset index sharding (data/dataset.py).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_fingerprint_tpu.parallel.mesh import make_mesh


_initialized = False


def maybe_initialize_distributed() -> Tuple[int, int]:
    """Initialize multi-host JAX when a coordinator is configured via env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).

    Must run before ANY other jax call touches the backend —
    jax.distributed.initialize() raises once the XLA backend exists, so this
    function must not itself query devices/process_count before initializing.
    Safe no-op single-host. Returns (process_index, process_count).
    """
    global _initialized
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord and not _initialized:
        try:
            jax.distributed.initialize()
            _initialized = True
        except Exception as e:  # already initialized elsewhere / misconfigured
            print(f"jax.distributed.initialize failed: {e}")
    return jax.process_index(), jax.process_count()


class DataParallel:
    """Placement helper: replicate state, shard batches over axis 'data'."""

    def __init__(self, devices=None, axis_name: str = "data"):
        devices = list(devices) if devices is not None else jax.devices()
        self.mesh: Mesh = make_mesh(axis_name, devices)
        self.axis_name = axis_name
        self.n = len(devices)
        self.replicated = NamedSharding(self.mesh, P())
        self.batch_sharding = NamedSharding(self.mesh, P(axis_name))

    def shard_batch(self, batch: dict) -> dict:
        """Place a batch on the mesh.

        Single-process: the batch is the global batch; device_put splits it.
        Multi-process: each process passes ITS per-host shard (the dataset
        index is already host-sharded) and the global array is assembled
        from process-local data — the standard multi-host input pattern.
        """
        if jax.process_count() > 1:
            return {
                k: jax.make_array_from_process_local_data(self.batch_sharding, v)
                for k, v in batch.items()
            }
        return {k: jax.device_put(v, self.batch_sharding) for k, v in batch.items()}

    def replicate(self, tree):
        return jax.device_put(tree, self.replicated)

    def pad_batch_size(self, b: int) -> int:
        """Pad a PER-HOST batch size so the assembled global batch divides the
        mesh: local_pad * process_count % n == 0. Single-host this is simply
        pad-to-multiple-of-n-devices."""
        from video_fingerprint_tpu.parallel.mesh import pad_to_multiple

        per_host = max(1, self.n // jax.process_count())
        return pad_to_multiple(b, per_host)


def is_main_process() -> bool:
    """Single-writer discipline (reference train.py:538-568 artifact semantics
    under N processes): run-dir files, TensorBoard and flat-file checkpoints
    are written by process 0 only."""
    return jax.process_index() == 0


def broadcast_string(s: str, max_len: int = 128) -> str:
    """Broadcast a short string (e.g. the timestamped run-dir name) from
    process 0 to all processes. No-op single-host."""
    if jax.process_count() == 1:
        return s
    import numpy as np
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, np.uint8)
    raw = s.encode()[:max_len]
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(out)).rstrip(b"\x00").decode()
