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
from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrackerConfig
from ..ops import interp
from ..ops.camera import Intrinsics
from ..ops.pyramid import PyramidLevel, build_pyramid
from .dense_tracker import (
    PreparedFrame,
    TrackingResult,
    match_prepared,
    match_pyramids,
    prepare_frame,
)


@functools.lru_cache(maxsize=8)
def _pyramid_builder(num_levels: int):
    """One compiled pyramid-build executable per level count (XLA caches
    per input shape).  Eager per-op dispatch costs ~30 ms of relay latency
    PER OP in this sandbox (BASELINE.md measurement notes); one jitted
    call is one round trip."""
    return jax.jit(
        lambda intensity, depth, valid: build_pyramid(
            intensity, depth, valid, num_levels
        )
    )


@dataclass
class Frame:
    """A device-resident RGB-D frame pyramid with host metadata."""

    levels: Tuple[PyramidLevel, ...]
    timestamp: float

    @staticmethod
    def from_arrays(intensity, depth, valid, timestamp: float, num_levels: int) -> "Frame":
        return Frame(
            levels=_pyramid_builder(num_levels)(
                jnp.asarray(intensity, jnp.float32),
                jnp.asarray(depth, jnp.float32),
                jnp.asarray(valid),
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


class HostLevelStats(NamedTuple):
    """Host-side copy of one pyramid level's statistics."""

    valid_pixels: int
    valid_constraints: int
    iterations: int
    termination: int


class HostTrackingResult(NamedTuple):
    """Host-side tracking result, decoded from ONE flat device download.

    Mirrors TrackingResult's interface (transformation/information/
    neg_log_likelihood/level_stats) with NumPy fields so the keyframe
    policy, voters, and graph insertion never touch the device again.
    ``level_stats`` covers EVERY solved level, coarse first, matching the
    reference's Stats::Levels (dense_tracking.h:108-123) — coarse-level
    termination reasons survive to the host.
    """

    transformation: np.ndarray  # [4, 4]
    information: np.ndarray  # [6, 6]
    neg_log_likelihood: float
    level_stats: Tuple[HostLevelStats, ...]  # coarse -> fine

    @property
    def last_level(self) -> HostLevelStats:
        """Finest solved level (the reference's Levels.back(),
        keyframe_tracker.cpp:165-168)."""
        return self.level_stats[-1]

    def is_nan(self) -> bool:
        return bool(np.isnan(self.transformation).any())


# flat layout: 16 (T) + 36 (info) + 1 (nll) + 4 per solved level
_FLAT_BASE = 53


def _flatten_result(r: TrackingResult):
    stats = jnp.stack(
        [
            jnp.stack(
                [
                    s.valid_pixels.astype(jnp.float32),
                    s.valid_constraints.astype(jnp.float32),
                    s.iterations.astype(jnp.float32),
                    s.termination.astype(jnp.float32),
                ]
            )
            for s in r.level_stats
        ]
    ).reshape(-1)
    return jnp.concatenate(
        [
            r.transformation.reshape(16),
            r.information.reshape(36),
            r.neg_log_likelihood[None],
            stats,
        ]
    )


def _decode_result(flat: np.ndarray) -> HostTrackingResult:
    n_levels = (flat.shape[0] - _FLAT_BASE) // 4
    levels = tuple(
        HostLevelStats(
            valid_pixels=int(flat[_FLAT_BASE + 4 * i]),
            valid_constraints=int(flat[_FLAT_BASE + 4 * i + 1]),
            iterations=int(flat[_FLAT_BASE + 4 * i + 2]),
            termination=int(flat[_FLAT_BASE + 4 * i + 3]),
        )
        for i in range(n_levels)
    )
    return HostTrackingResult(
        transformation=flat[:16].reshape(4, 4).astype(np.float64),
        information=flat[16:52].reshape(6, 6).astype(np.float64),
        neg_log_likelihood=float(flat[52]),
        level_stats=levels,
    )


class BatchedMatcher:
    """Batched dense alignment with per-(config, batch-size) jit caching
    and per-frame prepared-artifact caching.

    ``match_many([(ref, cur, init), ...])`` pads the request list to the
    next power-of-two bucket, runs one vmapped solve, and downloads ONE
    flat [B, F] result array (a single host<->device round trip per wave
    — the policy/voting code is pure host logic).  This is the single
    engine behind the dual keyframe/odometry match (batch 2) and
    loop-closure validation waves (batch K).

    Frames are PREPARED once (selection mask, refpack, acceleration
    tensor, quad table per level — prepare_frame) and the artifacts cached
    on the Frame object, so a keyframe matched against every incoming
    frame never recomputes them — the reference's PointSelection /
    acceleration-structure caching (point_selection.cpp:89-117,
    local_tracker.cpp:162-169).
    """

    # jit caches are MODULE-level, keyed by (cfg, intrinsics[, bucket]):
    # tracing a batch-8 wave costs ~14 s on host (the persistent compile
    # cache skips XLA, not tracing), and every test / validator / tracker
    # instance constructs fresh matchers with the same frozen configs —
    # per-instance caches re-paid the trace each time.
    _WAVE_FNS: dict = {}
    _PREPARE_JITS: dict = {}

    def __init__(self, cfg: TrackerConfig, intrinsics: Intrinsics):
        self.cfg = cfg
        self.intrinsics = intrinsics
        self._key = (cfg, intrinsics)
        self._cache = BatchedMatcher._WAVE_FNS.setdefault(self._key, {})
        if self._key not in BatchedMatcher._PREPARE_JITS:
            BatchedMatcher._PREPARE_JITS[self._key] = jax.jit(
                functools.partial(prepare_frame, cfg, intrinsics)
            )
        self._prepare_jit = BatchedMatcher._PREPARE_JITS[self._key]

    def prepared(self, frame: Frame) -> PreparedFrame:
        """The frame's cached solver artifacts (computed on first use).

        The cache lives on the Frame, keyed by (cfg, intrinsics), so its
        device memory is released with the frame and a reconfigured
        matcher never reuses stale artifacts.
        """
        cache = frame.__dict__.setdefault("_prepared", {})
        key = (self.cfg, self.intrinsics)
        if key not in cache:
            cache[key] = self._prepare_jit(frame.levels)
        return cache[key]

    def evict(self, frame: Frame):
        """Release this matcher's cached artifacts for a frame (used when a
        keyframe retires from active tracking; its Frame lives on in the
        graph for loop-closure validation, which prepares under its own
        coarser config key)."""
        frame.__dict__.get("_prepared", {}).pop((self.cfg, self.intrinsics), None)

    def _prepare_many(self, frames):
        """Prepare every UNPREPARED frame of a wave in ONE unrolled jit
        call — one dispatch round trip per wave instead of one per frame
        (~30 ms each through this sandbox's relay; a loop-closure wave
        touches several new frames).  The unrolled body keeps each
        frame's artifacts STANDALONE arrays (outputs of separate
        subgraphs, never slices of a stacked buffer — the gather-rate
        invariant, interp._quad_sampler).  Padded slots repeat the last
        frame; only first occurrences are cached."""
        key = (self.cfg, self.intrinsics)
        todo, seen = [], set()
        for f in frames:
            cache = f.__dict__.setdefault("_prepared", {})
            if key not in cache and id(f) not in seen:
                seen.add(id(f))
                todo.append(f)
        if not todo:
            return
        # FIXED chunk size: exactly one executable per matcher, so a warm
        # run closes the compile set (per-count buckets compiled fresh
        # executables mid-benchmark through the remote-compile tunnel)
        chunk = 4
        ck = ("prep_many", chunk)
        if ck not in self._cache:
            single = functools.partial(prepare_frame, self.cfg, self.intrinsics)
            self._cache[ck] = jax.jit(
                lambda levels: tuple(single(lv) for lv in levels)
            )
        fn = self._cache[ck]
        for i in range(0, len(todo), chunk):
            part = todo[i : i + chunk]
            padded = part + [part[-1]] * (chunk - len(part))
            outs = fn(tuple(f.levels for f in padded))
            for f, p in zip(part, outs[: len(part)]):
                f.__dict__["_prepared"][key] = p

    def _fn(self, batch: int):
        if batch not in self._cache:
            single = functools.partial(match_prepared, self.cfg, self.intrinsics)

            def flat_batch(ref_b, cur_b, quads, streams, init_b):
                # cur quad tables ride OUTSIDE the vmap as per-proposal
                # tuples of STANDALONE arrays selected by stream index —
                # stacked [B, 32, N] tables make every solver-loop gather
                # read slices of one big buffer, ~3x slower than the same
                # gathers on standalone tables (interp._quad_sampler)
                def one(r, c, s, i):
                    if quads is not None:
                        return _flatten_result(
                            single(r, c._replace(quad=quads), i, stream_index=s)
                        )
                    return _flatten_result(single(r, c, i))

                return jax.vmap(one, in_axes=(0, 0, 0, 0))(
                    ref_b, cur_b, streams, init_b
                )

            self._cache[batch] = jax.jit(flat_batch)
        return self._cache[batch]

    def match_many(
        self,
        requests: Sequence[Tuple[Frame, Frame, Optional[np.ndarray]]],
    ) -> List[HostTrackingResult]:
        """Align [(reference, current, initial_pose_or_None), ...]."""
        if not requests:
            return []
        n = len(requests)
        # QUANTIZED buckets {2, 8, 16}: each new bucket size traces the
        # whole unrolled wave function, and the trace cost scales with
        # the unroll width (~14 s for batch 8 on host; tracing is per
        # process and per size — the persistent cache only skips the XLA
        # compile).  Loop-closure waves grow with the keyframe count, so
        # unbounded pow2 buckets kept minting wider traces mid-run;
        # waves beyond 16 CHUNK into several dispatches instead (two
        # extra round trips beat a fresh minute-scale trace, on host and
        # through the TPU relay alike).  Padded slots re-run the last
        # proposal: a few wasted solves vs a fresh trace.
        if n > 16:
            out: List[HostTrackingResult] = []
            for s in range(0, n, 16):
                out.extend(self.match_many(requests[s : s + 16]))
            return out
        if n <= 2:
            bucket = 2
        elif n <= 8:
            bucket = 8
        else:
            bucket = 16
        pad = bucket - n
        self._prepare_many([f for r in requests for f in (r[0], r[1])])
        refs = [self.prepared(r[0]) for r in requests]
        curs = [self.prepared(r[1]) for r in requests]
        refs += [refs[-1]] * pad
        curs += [curs[-1]] * pad
        inits = [
            np.eye(4, dtype=np.float32) if r[2] is None else np.asarray(r[2], np.float32)
            for r in requests
        ] + [np.eye(4, dtype=np.float32)] * pad

        ref_b = jax.tree.map(lambda *xs: jnp.stack(xs), *refs)
        # current-role quad tables stay per-proposal STANDALONE arrays
        # (never stacked — see _fn); everything else stacks for the vmap
        fused = any(q is not None for q in curs[0].quad)
        if fused:
            quads = tuple(
                None
                if curs[0].quad[level] is None
                else tuple(c.quad[level] for c in curs)
                for level in range(len(curs[0].quad))
            )
            none_quad = (None,) * len(curs[0].quad)
            curs = [c._replace(quad=none_quad) for c in curs]
        else:
            quads = None
        cur_b = jax.tree.map(lambda *xs: jnp.stack(xs), *curs)
        streams = interp.lockstep_stream_indices(bucket)
        init_b = jnp.asarray(np.stack(inits))
        flat = np.asarray(
            self._fn(bucket)(ref_b, cur_b, quads, streams, init_b)
        )  # one download
        return [_decode_result(flat[i]) for i in range(n)]

    def match(self, ref: Frame, cur: Frame, initial=None) -> HostTrackingResult:
        return self.match_many([(ref, cur, initial)])[0]
