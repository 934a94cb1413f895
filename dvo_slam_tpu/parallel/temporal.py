"""Temporal (sequence-parallel) odometry: one long stream over many chips.

The reference's trajectory axis is strictly sequential — each frame's
solve warm-starts from the previous frame's pose on one CPU
(camera_dense_tracking.cpp:269-276).  But frame-to-frame odometry is a
chain of RELATIVE poses, and relative poses over disjoint chunks are
independent: split a T-frame stream into C chunks that overlap by one
frame, track every chunk concurrently (the multistream engine with the
chunk axis as its stream axis, DP-sharded over the mesh), and compose
absolute poses afterwards with one associative product scan over the
chunk-final transforms.

This is the SLAM analog of sequence parallelism in ML training
(SURVEY.md 2.5 P8 notes the reference has none — scaling structure is
ours to design): throughput scales with devices for offline/batch
reprocessing, at near-identical accuracy — results match the sequential
trajectory to solver tolerance (the constant-velocity warm start is
unavailable at chunk boundaries, and that difference cascades through
each chunk's subsequent warm starts; see test_parallel.py's 1e-3 gate).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..config import TrackerConfig
from ..ops.camera import Intrinsics
from .mesh import BATCH_AXIS
from .multistream import make_multistream_tracker


def chunk_sequence(intensity_u8, depth_u16, num_chunks: int) -> Tuple:
    """[T, H, W] -> ([C, L+1, H, W] intensity, depth) chunks overlapping
    by one frame.

    T-1 relative poses split as evenly as static shapes allow; the tail
    chunk is padded by repeating its last frame (self-matches solve to
    identity and drop out in composition).
    """
    t = intensity_u8.shape[0]
    if t < 2:
        raise ValueError("need at least 2 frames")
    rel = t - 1  # relative poses to estimate
    per = -(-rel // num_chunks)  # ceil
    idx = np.minimum(
        np.arange(num_chunks)[:, None] * per + np.arange(per + 1)[None, :], t - 1
    )  # [C, per+1], clamped repeats at the tail
    return intensity_u8[idx], depth_u16[idx]


def compose_chunks(chunk_abs: np.ndarray, total_rel: int) -> np.ndarray:
    """[C, L, 4, 4] per-chunk absolute poses (pose of chunk-frame j+1 in
    chunk-frame 0's camera) -> [total_rel, 4, 4] stream-absolute poses.

    Each chunk's final pose re-anchors the next chunk; padded tail steps
    (self-matches = identity) are dropped by the total_rel cutoff.
    """
    c, l = chunk_abs.shape[:2]
    out = np.empty((total_rel, 4, 4))
    base = np.eye(4)
    k = 0
    for ci in range(c):
        for j in range(l):
            if k >= total_rel:
                break
            out[k] = base @ chunk_abs[ci, j]
            k += 1
        base = base @ chunk_abs[ci, l - 1]
    return out


def make_temporal_tracker(
    cfg: TrackerConfig,
    intrinsics: Intrinsics,
    mesh: Optional[Mesh] = None,
    num_chunks: Optional[int] = None,
    axis: str = BATCH_AXIS,
):
    """Sequence-parallel tracker: ``run(intensity_u8 [T,H,W], depth_u16
    [T,H,W]) -> absolute poses [T-1, 4, 4]`` (frame t+1 in frame 0's
    camera).  ``num_chunks`` defaults to the mesh size (or 1)."""
    if num_chunks is None:
        num_chunks = mesh.devices.size if mesh is not None else 1
    if mesh is not None and num_chunks % mesh.devices.size != 0:
        # shard over the largest divisor of num_chunks that fits the mesh,
        # keeping the caller's device selection/ordering
        import warnings

        n = mesh.devices.size
        while num_chunks % n != 0:
            n -= 1
        warnings.warn(
            f"num_chunks={num_chunks} not divisible by mesh size "
            f"{mesh.devices.size}; shrinking to the first {n} mesh devices"
        )
        mesh = Mesh(mesh.devices.ravel()[:n], (axis,))
    ms = make_multistream_tracker(cfg, intrinsics, mesh, axis)

    def run(intensity_u8, depth_u16):
        t = int(intensity_u8.shape[0])
        chunks_i, chunks_d = chunk_sequence(
            np.asarray(intensity_u8), np.asarray(depth_u16), num_chunks
        )
        abs_in_chunk = ms(jnp.asarray(chunks_i), jnp.asarray(chunks_d))
        # multistream returns per-chunk ABSOLUTE poses (relative to the
        # chunk's frame 0), which is exactly the per-chunk accumulation;
        # compose chunk bases sequentially (C ~ device count: negligible).
        return compose_chunks(np.asarray(abs_in_chunk, np.float64), t - 1)

    return run
