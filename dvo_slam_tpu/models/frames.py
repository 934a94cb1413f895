"""Frame and keyframe records + batched alignment infrastructure.

The reference parallelizes concurrent DenseTracker::match calls with TBB
(dual keyframe/odometry match, local_tracker.cpp:180-185; loop-proposal
fan-out with thread-local tracker pools, keyframe_graph.cpp:524-593).
The TPU-native equivalent is batching: frame pairs become a leading batch
dimension of one vmapped aligner (SURVEY.md section 2.5, P2/P4), padded to
bucket sizes so XLA compiles once per bucket.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrackerConfig
from ..ops.camera import Intrinsics
from ..ops.pyramid import PyramidLevel, build_pyramid
from .dense_tracker import TrackingResult, match_pyramids


@dataclass
class Frame:
    """A device-resident RGB-D frame pyramid with host metadata."""

    levels: Tuple[PyramidLevel, ...]
    timestamp: float

    @staticmethod
    def from_arrays(intensity, depth, valid, timestamp: float, num_levels: int) -> "Frame":
        return Frame(
            levels=build_pyramid(
                jnp.asarray(intensity, jnp.float32),
                jnp.asarray(depth, jnp.float32),
                jnp.asarray(valid),
                num_levels,
            ),
            timestamp=timestamp,
        )


@dataclass
class Keyframe:
    """Keyframe record (reference: dvo_slam keyframe.h:36-55)."""

    id: int
    frame: Frame
    pose: np.ndarray  # [4, 4] world pose
    evaluation: Any = None

    @property
    def timestamp(self) -> float:
        return self.frame.timestamp


def stack_frames(frames: Sequence[Frame]) -> Tuple[PyramidLevel, ...]:
    """Stack per-frame pyramids into batched pyramids (leading dim = batch)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *[f.levels for f in frames])


class BatchedMatcher:
    """Batched dense alignment with per-(config, batch-size) jit caching.

    ``match_many([(ref, cur, init), ...])`` pads the request list to the
    next power-of-two bucket, runs one vmapped solve, and unpacks.  This is
    the single engine behind the dual keyframe/odometry match (batch 2) and
    loop-closure validation waves (batch K).
    """

    def __init__(self, cfg: TrackerConfig, intrinsics: Intrinsics):
        self.cfg = cfg
        self.intrinsics = intrinsics
        self._cache = {}

    def _fn(self, batch: int):
        if batch not in self._cache:
            single = functools.partial(match_pyramids, self.cfg, self.intrinsics)
            self._cache[batch] = jax.jit(jax.vmap(single, in_axes=(0, 0, 0)))
        return self._cache[batch]

    def match_many(
        self,
        requests: Sequence[Tuple[Frame, Frame, Optional[np.ndarray]]],
    ) -> List[TrackingResult]:
        """Align [(reference, current, initial_pose_or_None), ...]."""
        if not requests:
            return []
        n = len(requests)
        bucket = 1 << (n - 1).bit_length()
        pad = bucket - n
        refs = [r[0] for r in requests] + [requests[-1][0]] * pad
        curs = [r[1] for r in requests] + [requests[-1][1]] * pad
        inits = [
            np.eye(4, dtype=np.float32) if r[2] is None else np.asarray(r[2], np.float32)
            for r in requests
        ] + [np.eye(4, dtype=np.float32)] * pad

        ref_b = stack_frames(refs)
        cur_b = stack_frames(curs)
        init_b = jnp.asarray(np.stack(inits))
        batched: TrackingResult = self._fn(bucket)(ref_b, cur_b, init_b)
        # unpack to per-request results (host loop over leading axis)
        out = []
        for i in range(n):
            out.append(jax.tree.map(lambda x: x[i], batched))
        return out

    def match(self, ref: Frame, cur: Frame, initial=None) -> TrackingResult:
        return self.match_many([(ref, cur, initial)])[0]
