"""Sharded dense alignment: the multi-chip frame-alignment engines.

Two axes of scale, both absent from the single-process reference
(SURVEY.md 2.5, P7 "distributed backend is new work"):

  * **Pair-parallel** (the DP analog): a wave of frame pairs — loop
    proposal validation, multi-camera tracking, batch reprocessing — is
    sharded over the mesh's batch axis.  Each device runs the full IRLS
    solve for its pairs; no collectives beyond the vmapped while-loop's
    global termination test.
  * **Pixel-parallel** (the SP analog): ONE alignment sharded over pixel
    rows across chips.  Residual/Jacobian evaluation is local to each
    row shard; the 6x6+6 normal equations and the t-distribution scale
    statistics psum over ICI each iteration (P3 + P6).  This is the path
    that scales a single 640x480 alignment beyond one chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TrackerConfig
from ..models.dense_tracker import TrackingResult, match_pyramids
from ..ops.camera import Intrinsics
from .mesh import BATCH_AXIS, batch_sharding, replicated


def make_pair_parallel_matcher(
    cfg: TrackerConfig, intrinsics: Intrinsics, mesh: Mesh, axis: str = BATCH_AXIS
):
    """jit a vmapped matcher whose batch dimension is sharded over the mesh.

    Inputs: stacked ref/cur pyramids + [B, 4, 4] inits with B divisible by
    the mesh size.  XLA partitions the vmapped solver so each device
    processes B / n_devices pairs.
    """
    shard = batch_sharding(mesh, axis)
    repl = replicated(mesh)

    def matched(ref_stack, cur_stack, inits) -> TrackingResult:
        return jax.vmap(
            functools.partial(match_pyramids, cfg, intrinsics),
            in_axes=(0, 0, 0),
        )(ref_stack, cur_stack, inits)

    def in_shardings(tree_batch):
        return jax.tree.map(lambda _: shard, tree_batch)

    def run(ref_stack, cur_stack, inits):
        ref_stack = jax.tree.map(lambda x: jax.device_put(x, shard), ref_stack)
        cur_stack = jax.tree.map(lambda x: jax.device_put(x, shard), cur_stack)
        inits = jax.device_put(inits, shard)
        return jax.jit(matched)(ref_stack, cur_stack, inits)

    return run
