"""Multi-stream dense odometry: many RGB-D camera streams per chip.

The reference tracks ONE camera at ~30 Hz on a desktop CPU
(dvo_ros/src/camera_dense_tracking.cpp; SURVEY.md section 6's operating
point).  A TPU chip running a single 640x480 stream is latency-bound:
the solved pyramid levels (320x240 down to 80x60) are far too small to
fill the MXU/VPU, so most of the chip idles between while-loop steps.

The TPU-native answer is stream batching — the serving-throughput shape
of the tracker.  B independent streams advance in lockstep as ONE device
program: `lax.scan` over time, `vmap` over streams, so every warp/
residual/Gram-reduction runs on [B, ...] tiles that actually occupy the
hardware.  With a mesh, the stream axis is additionally DP-sharded over
chips (the reference's TBB dual-match generalized to N cameras,
local_tracker.cpp:180-185 -> SURVEY.md 2.5 P2/P7).

Streams are fully independent (no cross-stream collectives); the vmapped
while-loop runs until every stream's level converges — the lockstep cost
is bounded by the iteration cap and amortized by warm starts.

Input is camera-native u8 intensity / u16 depth (the real ingest format,
benchmark_slam.cpp:46-93): frames upload once, pyramids are built on
device, and only the [B, T-1, 4, 4] trajectories come back.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..config import TrackerConfig
from ..models.dense_tracker import (
    PreparedFrame,
    _build_refpack,
    _resolve_backend,
    match_prepared,
    match_pyramids,
)
from ..ops.camera import Intrinsics
from ..ops import interp
from ..ops.interp import build_quad_table_cm
from ..ops.pyramid import (
    build_acceleration_cm,
    build_pyramid,
    convert_raw_depth,
    selection_mask,
)
from .mesh import BATCH_AXIS, batch_sharding


def _track_streams_vmapped(
    cfg: TrackerConfig, intrinsics: Intrinsics, intensity_u8, depth_u16
):
    """Plain-vmap lockstep (any backend): each stream keeps its own quad
    tables, so the warp gather lowers as a BATCHED gather.  Kept as the
    oracle/fallback for non-fused backends; the fused production path is
    :func:`_track_streams_tuple`."""

    def build(int_u8, dep_u16):
        depth, valid = convert_raw_depth(dep_u16)
        # levels finer than the solved range are skipped: no derivative
        # kernels for them and nothing full-resolution in the scan carry
        return build_pyramid(
            int_u8.astype(jnp.float32), depth, valid, cfg.num_levels,
            skip_below=cfg.last_level,
        )

    matcher = functools.partial(match_pyramids, cfg, intrinsics)

    def step(carry, frames_t):
        prev_pyr, pose, rel_prev = carry
        cur_pyr = jax.vmap(build)(frames_t[0], frames_t[1])
        r = jax.vmap(matcher)(prev_pyr, cur_pyr, rel_prev)
        pose = pose @ r.transformation
        return (cur_pyr, pose, r.transformation), pose

    first = jax.vmap(build)(intensity_u8[:, 0], depth_u16[:, 0])
    B = intensity_u8.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))

    # scan over time: inputs arranged [T-1, B, H, W]
    xs = (
        jnp.swapaxes(intensity_u8[:, 1:], 0, 1),
        jnp.swapaxes(depth_u16[:, 1:], 0, 1),
    )
    (_, _, _), poses_t = jax.lax.scan(step, (first, eye, eye), xs)
    return jnp.swapaxes(poses_t, 0, 1)  # [B, T-1, 4, 4]


def _track_streams_tuple(
    cfg: TrackerConfig, intrinsics: Intrinsics, intensity_u8, depth_u16
):
    """Standalone-table lockstep: B streams advance together, but each
    stream's per-level quad table stays a SEPARATE standalone array (a
    tuple, never one stacked [B, 32, N] operand), and the vmapped solver
    gathers through interp._quad_sampler, whose batching rule
    unrolls one single-stream-shaped gather per table.

    Why: the TPU gather rate collapses superlinearly with the gathered
    operand's footprint (v5e, 32-channel rows: 0.127 ms/iter at 76800
    lanes but 34 ms at 8x76800 — tools/gather_probe.py), and slices of a
    stacked table inherit the stacked buffer's layout, gathering ~4.5x
    slower than the same data as standalone buffers.  Unrolled standalone
    gathers run at ~0.2 ms/stream at B=8 — near-linear in B — so lockstep
    batching amortizes the serial dispatch chain instead of drowning in
    the gather.  Per-stream math, carries, and termination are identical
    to the vmapped oracle form.

    The N-camera generalization of the reference's dual concurrent match
    (tbb::parallel_invoke, local_tracker.cpp:180-185) — SURVEY.md 2.5 P2.
    """
    B = intensity_u8.shape[0]
    num_levels = cfg.num_levels
    none = (None,) * num_levels
    solve_range = range(cfg.last_level, cfg.first_level + 1)

    def build(int_u8, dep_u16):
        depth, valid = convert_raw_depth(dep_u16)
        return build_pyramid(
            int_u8.astype(jnp.float32), depth, valid, num_levels,
            skip_below=cfg.last_level,
        )

    def prep_ref(pyr):
        """Per-stream reference-role artifacts (vmapped)."""
        sel = [None] * num_levels
        refpack = [None] * num_levels
        for level in solve_range:
            lv = pyr[level]
            sel[level] = selection_mask(
                lv,
                cfg.intensity_derivative_threshold,
                cfg.depth_derivative_threshold,
            )
            refpack[level] = _build_refpack(
                lv, sel[level], intrinsics.at_level(level)
            )
        return tuple(sel), tuple(refpack)

    def prep_cur_tuple(pyr_b):
        """Per-stream standalone quad tables from the BATCHED pyramid:
        per level, a tuple of B separate [32, N] arrays.

        The quad BUILD is unrolled per stream so each table is the output
        of its own roll/concat chain — a fresh standalone allocation.
        This matters: the TPU gather rate depends on the underlying
        BUFFER, not the logical shape — gathering from a leading-axis
        slice of a stacked [B, 32, N] array (a sub-region of one big
        allocation) runs ~4x slower than the identical gather on a
        standalone buffer (tools/gather_probe.py: 'prepped' 4.4 ms vs
        'tuple' 1.6 ms/iter at B=8)."""
        # per-level None for unsolved levels (BatchedMatcher's none_quad
        # convention) — NOT the whole-pyramid `none` tuple, whose length
        # coincidentally matches but types the slot wrong
        quads = [None] * num_levels
        for level in solve_range:
            lv_b = pyr_b[level]
            accel_b = jax.vmap(build_acceleration_cm)(lv_b)  # [B, 8, N]
            w = lv_b.intensity.shape[-1]
            quads[level] = tuple(
                build_quad_table_cm(accel_b[b], w) for b in range(B)
            )
        return tuple(quads)

    def matcher(sel, refpack, quads, stream, init):
        ref = PreparedFrame(
            levels=none, sel=sel, refpack=refpack, accel=none, quad=none
        )
        cur = PreparedFrame(
            levels=none, sel=none, refpack=none, accel=none, quad=quads
        )
        return match_prepared(
            cfg, intrinsics, ref, cur, init, stream_index=stream
        )

    streams = interp.lockstep_stream_indices(B)

    def step(carry, frames_t):
        (prev_sel, prev_refpack), pose, rel_prev = carry
        cur_pyr_b = jax.vmap(build)(frames_t[0], frames_t[1])
        sel_b, refpack_b = jax.vmap(prep_ref)(cur_pyr_b)
        quads = prep_cur_tuple(cur_pyr_b)
        r = jax.vmap(matcher, in_axes=(0, 0, None, 0, 0))(
            prev_sel, prev_refpack, quads, streams, rel_prev
        )
        pose = pose @ r.transformation
        return ((sel_b, refpack_b), pose, r.transformation), pose

    first_pyr = jax.vmap(build)(intensity_u8[:, 0], depth_u16[:, 0])
    first_ref = jax.vmap(prep_ref)(first_pyr)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))

    xs = (
        jnp.swapaxes(intensity_u8[:, 1:], 0, 1),
        jnp.swapaxes(depth_u16[:, 1:], 0, 1),
    )
    _, poses_t = jax.lax.scan(step, (first_ref, eye, eye), xs)
    return jnp.swapaxes(poses_t, 0, 1)  # [B, T-1, 4, 4]


def _track_streams(cfg: TrackerConfig, intrinsics: Intrinsics, intensity_u8, depth_u16):
    """[B, T, H, W] u8/u16 -> [B, T-1, 4, 4] absolute poses (pose of frame
    t+1 in the frame-0 camera, per stream).

    Each stream is the reference's frame-to-frame accumulation loop
    (camera_dense_tracking.cpp:269-276) with constant-velocity warm
    starts; `vmap` lifts it to a batch, `lax.scan` walks time on device.
    The fused backends route through the standalone-table form (one
    separate quad table per stream); other backends use the per-stream
    vmap.  Under a mesh this runs INSIDE shard_map on the local batch
    (see make_multistream_tracker).
    """
    backend = _resolve_backend(cfg)
    if backend in ("fused", "pallas"):
        if backend == "pallas":
            # under stream vmap the XLA twin beats the Pallas kernel
            # (vmapped pallas_call grid-batches at 0.40 ms/iter vs the
            # batched XLA form's 0.19 at B=8/L1 — tools/lockstep_profile);
            # the twin is the same math (twin-oracle tested)
            import dataclasses

            cfg = dataclasses.replace(cfg, kernel_backend="fused")
        return _track_streams_tuple(cfg, intrinsics, intensity_u8, depth_u16)
    return _track_streams_vmapped(cfg, intrinsics, intensity_u8, depth_u16)


def _track_one_stream(cfg: TrackerConfig, intrinsics: Intrinsics, intensity_u8, depth_u16):
    """[T, H, W] u8/u16 -> [T-1, 4, 4]: the truly-unbatched scanned
    tracker (no vmap anywhere, so no batched-gather lowering)."""

    def build(int_u8, dep_u16):
        depth, valid = convert_raw_depth(dep_u16)
        return build_pyramid(
            int_u8.astype(jnp.float32), depth, valid, cfg.num_levels,
            skip_below=cfg.last_level,
        )

    def step(carry, frame):
        prev_pyr, pose, rel_prev = carry
        cur_pyr = build(frame[0], frame[1])
        r = match_pyramids(cfg, intrinsics, prev_pyr, cur_pyr, rel_prev)
        pose = pose @ r.transformation
        return (cur_pyr, pose, r.transformation), pose

    first = build(intensity_u8[0], depth_u16[0])
    eye = jnp.eye(4, dtype=jnp.float32)
    _, poses = jax.lax.scan(step, (first, eye, eye), (intensity_u8[1:], depth_u16[1:]))
    return poses


def _track_streams_sequential(cfg: TrackerConfig, intrinsics: Intrinsics, intensity_u8, depth_u16):
    """Streams tracked one after another inside ONE device program
    (``lax.map`` over the stream axis of the single-stream scan).

    The offline-throughput schedule: XLA's batched-gather lowering makes
    the LOCKSTEP schedule lose per-stream efficiency on one chip (see
    BASELINE.md), while sequential streams keep the single-stream
    program's exact per-frame cost — aggregate fps ~= single-stream fps,
    at B x the wall-clock per stream.  Use lockstep for live multi-camera
    batches, sequential for batch reprocessing.
    """

    def one_stream(stream):
        iu8, du16 = stream
        return _track_one_stream(cfg, intrinsics, iu8, du16)

    return jax.lax.map(one_stream, (intensity_u8, depth_u16))


def make_multistream_tracker(
    cfg: TrackerConfig,
    intrinsics: Intrinsics,
    mesh: Optional[Mesh] = None,
    axis: str = BATCH_AXIS,
    schedule: str = "lockstep",
):
    """jit-compiled multi-stream tracker.

    Returns ``run(intensity_u8 [B,T,H,W], depth_u16 [B,T,H,W]) ->
    poses [B,T-1,4,4]``.  With a mesh, the stream axis is sharded over it
    (B must be divisible by the mesh size); without one, all B streams
    batch onto the local device.  ``schedule``: "lockstep" advances all
    streams together (live serving shape); "sequential" tracks them one
    after another in one program (offline throughput shape — see
    _track_streams_sequential).
    """
    if schedule == "sequential":
        inner = functools.partial(_track_streams_sequential, cfg, intrinsics)
    elif schedule == "lockstep":
        inner = functools.partial(_track_streams, cfg, intrinsics)
    else:
        raise ValueError(f"unknown schedule {schedule!r}")

    if mesh is None:
        return jax.jit(inner)

    # DP over the mesh via shard_map: each device traces the LOCAL-batch
    # program (streams are independent — no collectives), so a device with
    # local batch 1 runs the literal single-stream tracker program and the
    # batched-gather lowering question never arises across shards.  The
    # flat-table form still applies WITHIN a device's local batch.
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    fn = jax.jit(
        shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(axis),
            check_rep=False,
        )
    )
    shard = batch_sharding(mesh, axis)

    def run(intensity_u8, depth_u16):
        intensity_u8 = jax.device_put(intensity_u8, shard)
        depth_u16 = jax.device_put(depth_u16, shard)
        return fn(intensity_u8, depth_u16)

    run.jitted = fn  # for lowering/HLO inspection (tests, tooling)
    return run
