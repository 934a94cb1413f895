"""Device mesh construction for multi-chip scaling.

The reference is single-process (SSE + TBB threads only; SURVEY.md 2.5);
all multi-chip structure here is new TPU-native design: a 1-D mesh whose
axis carries whatever the workload shards — frame pairs for alignment
waves (the DP analog), edges for distributed bundle adjustment, pixel
blocks for single-frame sharded alignment (the SP analog).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

BATCH_AXIS = "batch"


def make_mesh(n_devices: Optional[int] = None, axis: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = BATCH_AXIS) -> NamedSharding:
    """Shard the leading dimension over the mesh axis."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_leading_axis(tree, mesh: Mesh, axis: str = BATCH_AXIS):
    """Device-put every leaf with its leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
