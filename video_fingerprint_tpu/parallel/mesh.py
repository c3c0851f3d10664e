"""Device-mesh utilities.

Training uses a 1-D mesh over axis 'data' (DP over ICI: per-chip batch shard,
psum grad reduction). Dedup uses a 1-D mesh over axis 'corpus' (each chip
holds a shard of the embedding matrix). Multi-host extends both via
`jax.distributed.initialize` — the mesh helpers below take the global device
list, so the same code covers slice-local ICI and cross-host DCN.

The reference has no distributed backend at all (SURVEY.md §2 checklist); this
module is its TPU-native replacement.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_name: str = "data", devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
