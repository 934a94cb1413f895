"""Multi-host runtime: process initialization and host-level work partition.

The reference is strictly single-process (SURVEY.md §5 "Distributed
communication backend: none"); this is the new TPU-native layer that turns
the engine into a pod-scale system:

  * ``initialize()`` wraps ``jax.distributed.initialize`` — one call per
    host process; afterwards ``jax.devices()`` spans the slice and the
    collectives in parallel/ ride ICI within a slice, DCN across hosts.
  * ``HostWorkPartition`` assigns host-level work (frame ingest shards,
    keyframe ownership for loop-closure search, checkpoint IO) by process
    index — the DCN-level orchestration SURVEY.md §5 prescribes, kept off
    the device graph.

Device-level sharding (pair-parallel waves, pixel-parallel alignment,
edge-sharded BA) lives in the sibling modules and is mesh-size agnostic:
the same code runs on 1 chip, 8 virtual CPU devices, or a multi-host
slice once initialize() has run.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host runtime (idempotent).

    With no arguments, defers to environment auto-detection (TPU pod
    metadata or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID).  Returns True if a multi-process runtime is active.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


@dataclasses.dataclass(frozen=True)
class HostWorkPartition:
    """Deterministic host-level ownership by process index."""

    process_id: int
    num_processes: int

    @staticmethod
    def current() -> "HostWorkPartition":
        return HostWorkPartition(jax.process_index(), jax.process_count())

    def owns_keyframe(self, keyframe_id: int) -> bool:
        """Keyframe ownership for loop-closure search fan-out: each host
        searches/validates proposals only for its keyframes, then the
        accepted edges are all-gathered into every host's graph replica."""
        return keyframe_id % self.num_processes == self.process_id

    def frame_shard(self, num_frames: int) -> Tuple[int, int]:
        """Contiguous [start, stop) ingest range for this host (batch
        reprocessing / dataset sweep mode)."""
        per = -(-num_frames // self.num_processes)
        start = min(self.process_id * per, num_frames)
        return start, min(start + per, num_frames)

    def local_items(self, items: Sequence) -> List:
        return [x for i, x in enumerate(items) if i % self.num_processes == self.process_id]
