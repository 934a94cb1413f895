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


@functools.lru_cache(maxsize=8)
def _raw_pyramid_builder(num_levels: int):
    """Pyramid build from RAW camera arrays (u8 intensity, u16 depth):
    the u8->f32 cast and the TUM u16/5000 depth conversion run ON DEVICE,
    so the host->device transfer ships 3 bytes/pixel instead of the 9 of
    pre-converted f32+f32+bool — through this sandbox's ~27 MB/s relay
    that's the difference between ~0.1 s and ~0.033 s per keyframe Frame
    (the replay feeder builds one per keyframe while the scan runs).
    Bit-exact: both paths perform the same IEEE f32 ops."""
    from ..ops.pyramid import convert_raw_depth

    def build(intensity_u8, depth_u16):
        depth, valid = convert_raw_depth(depth_u16)
        return build_pyramid(
            intensity_u8.astype(jnp.float32), depth, valid, num_levels
        )

    return jax.jit(build)


@functools.lru_cache(maxsize=16)
def _raw_build_prepare_jit(cfg: TrackerConfig, intrinsics: Intrinsics,
                           num_levels: int):
    """Fused raw-ingest + pyramid build + solver-artifact prepare — one
    device program, one dispatch (see Frame.from_raw's prepare_for)."""
    from ..ops.pyramid import convert_raw_depth

    def build(intensity_u8, depth_u16):
        depth, valid = convert_raw_depth(depth_u16)
        levels = build_pyramid(
            intensity_u8.astype(jnp.float32), depth, valid, num_levels
        )
        return levels, prepare_frame(cfg, intrinsics, levels)

    return jax.jit(build)


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

    @staticmethod
    def from_raw(
        intensity_u8,
        depth_u16,
        timestamp: float,
        num_levels: int,
        prepare_for: Optional[Tuple[TrackerConfig, Intrinsics]] = None,
    ) -> "Frame":
        """Build from raw camera arrays; conversion happens on device
        (see _raw_pyramid_builder — 3x fewer upload bytes, bit-exact).

        ``prepare_for=(cfg, intrinsics)`` fuses the solver-artifact
        PREPARE into the same program and pre-populates the frame's
        prepared cache under that key — the live per-frame path
        (KeyframeTracker.update) then runs build+prepare+match in TWO
        dispatches instead of three (each dispatch costs ~30 ms through
        this sandbox's relay; the reference's per-frame handleImages
        budget is 33 ms total)."""
        if prepare_for is None:
            return Frame(
                levels=_raw_pyramid_builder(num_levels)(
                    jnp.asarray(intensity_u8), jnp.asarray(depth_u16)
                ),
                timestamp=timestamp,
            )
        cfg, intrinsics = prepare_for
        levels, prepared = _raw_build_prepare_jit(cfg, intrinsics, num_levels)(
            jnp.asarray(intensity_u8), jnp.asarray(depth_u16)
        )
        frame = Frame(levels=levels, timestamp=timestamp)
        frame.__dict__["_prepared"] = {(cfg, intrinsics): prepared}
        return frame


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

    def __init__(
        self,
        cfg: TrackerConfig,
        intrinsics: Intrinsics,
        artifact_cfg: Optional[TrackerConfig] = None,
    ):
        """``artifact_cfg``: prepare frames under THIS config instead of
        ``cfg`` (default: ``cfg`` itself).  Per-level artifacts (selection
        mask, refpack, quad table) are identical between configs sharing
        thresholds/backend — they differ only in WHICH levels exist — so a
        matcher solving a sub-range (the coarse validation screen) can
        read the fine config's artifacts directly.  One prepared set per
        frame replaces one per stage, deleting a full prepare dispatch
        round trip per validation wave (~30 ms through this sandbox's
        relay)."""
        self.cfg = cfg
        self.intrinsics = intrinsics
        self.artifact_cfg = cfg if artifact_cfg is None else artifact_cfg
        if (
            self.artifact_cfg.first_level < cfg.first_level
            or self.artifact_cfg.last_level > cfg.last_level
        ):
            raise ValueError(
                "artifact_cfg level range must cover the match config's: "
                f"artifacts {self.artifact_cfg.last_level}.."
                f"{self.artifact_cfg.first_level} vs match "
                f"{cfg.last_level}..{cfg.first_level}"
            )
        self._key = (cfg, intrinsics)
        self._prep_key = (self.artifact_cfg, intrinsics)
        self._cache = BatchedMatcher._WAVE_FNS.setdefault(self._key, {})
        self._prep_cache = BatchedMatcher._WAVE_FNS.setdefault(
            ("prep", self._prep_key), {}
        )
        if self._prep_key not in BatchedMatcher._PREPARE_JITS:
            BatchedMatcher._PREPARE_JITS[self._prep_key] = jax.jit(
                functools.partial(prepare_frame, self.artifact_cfg, intrinsics)
            )
        self._prepare_jit = BatchedMatcher._PREPARE_JITS[self._prep_key]

    def prepared(self, frame: Frame) -> PreparedFrame:
        """The frame's cached solver artifacts (computed on first use).

        The cache lives on the Frame, keyed by (artifact_cfg, intrinsics),
        so its device memory is released with the frame and a reconfigured
        matcher never reuses stale artifacts.
        """
        cache = frame.__dict__.setdefault("_prepared", {})
        if self._prep_key not in cache:
            cache[self._prep_key] = self._prepare_jit(frame.levels)
        return cache[self._prep_key]

    def evict(self, frame: Frame):
        """Release this matcher's cached artifacts for a frame (used when a
        keyframe retires from active tracking; its Frame lives on in the
        graph for loop-closure validation, which prepares under its own
        coarser config key)."""
        frame.__dict__.get("_prepared", {}).pop(self._prep_key, None)

    def _prepare_many(self, frames):
        """Prepare every UNPREPARED frame of a wave in ONE unrolled jit
        call — one dispatch round trip per wave instead of one per frame
        (~30 ms each through this sandbox's relay; a loop-closure wave
        touches several new frames).  The unrolled body keeps each
        frame's artifacts STANDALONE arrays (outputs of separate
        subgraphs, never slices of a stacked buffer — the gather-rate
        invariant, interp._quad_sampler).  Padded slots repeat the last
        frame; only first occurrences are cached."""
        key = self._prep_key
        todo, seen = [], set()
        for f in frames:
            cache = f.__dict__.setdefault("_prepared", {})
            if key not in cache and id(f) not in seen:
                seen.add(id(f))
                todo.append(f)
        if not todo:
            return
        # FIXED chunk size: exactly one executable per artifact config, so
        # a warm run closes the compile set (per-count buckets compiled
        # fresh executables mid-benchmark through the remote-compile
        # tunnel)
        chunk = 4
        ck = ("prep_many", chunk)
        if ck not in self._prep_cache:
            single = functools.partial(
                prepare_frame, self.artifact_cfg, self.intrinsics
            )
            self._prep_cache[ck] = jax.jit(
                lambda levels: tuple(single(lv) for lv in levels)
            )
        fn = self._prep_cache[ck]
        for i in range(0, len(todo), chunk):
            part = todo[i : i + chunk]
            padded = part + [part[-1]] * (chunk - len(part))
            outs = fn(tuple(f.levels for f in padded))
            for f, p in zip(part, outs[: len(part)]):
                f.__dict__["_prepared"][key] = p

    def _fn(self, batch: int):
        if batch not in self._cache:
            single = functools.partial(match_prepared, self.cfg, self.intrinsics)

            def flat_batch(refs, curs, quads, streams, init_b):
                # Per-request prepared frames arrive as TUPLES and stack
                # INSIDE the program: eager host-side stacking is one
                # relay dispatch per pytree leaf before the wave starts
                # (and fine-prepared frames carry ~12 MB of leaves).
                # Cur quad tables ride OUTSIDE the vmap as per-proposal
                # tuples of STANDALONE arrays selected by stream index —
                # stacked [B, 32, N] tables make every solver-loop gather
                # read slices of one big buffer, ~3x slower than the same
                # gathers on standalone tables (interp._quad_sampler)
                ref_b = jax.tree.map(lambda *xs: jnp.stack(xs), *refs)
                cur_b = jax.tree.map(lambda *xs: jnp.stack(xs), *curs)

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

        # current-role quad tables stay per-proposal STANDALONE arrays
        # (never stacked — see _fn); everything else stacks IN-PROGRAM
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
        streams = interp.lockstep_stream_indices(bucket)
        init_b = jnp.asarray(np.stack(inits))
        flat = np.asarray(
            self._fn(bucket)(tuple(refs), tuple(curs), quads, streams, init_b)
        )  # one download
        return [_decode_result(flat[i]) for i in range(n)]

    def match(self, ref: Frame, cur: Frame, initial=None) -> HostTrackingResult:
        return self.match_many([(ref, cur, initial)])[0]


class TwoStageMatcher:
    """Fused two-stage validation wave: ONE dispatch computes, per frame
    pair, the coarse forward + backward screens AND the fine forward +
    backward refinements seeded by their own coarse results.

    The reference's proposal validator runs its two stages as separate
    tracker passes with host logic between
    (constraint_proposal_validator.cpp:69-160); here the host round trip
    between stages costs ~2 relay dispatches + a download (~80 ms) PER
    KEYFRAME EVENT, which round 4 measured as 46% of the e2e frame
    budget.  Stage 1's vote/removal logic only ever selects WHICH
    direction's stage-2 solve to keep — so the device simply computes
    stage 2 for BOTH directions (the extra solves ride the same wave; a
    vmap lane is far cheaper than a dispatch) and the host applies the
    exact same voting to precomputed results.  4 solves per pair, one
    [B, 2*F1+2*F2] download.

    Artifacts are prepared ONCE under the fine config and shared by the
    coarse solves (per-level artifacts are config-independent; the coarse
    config just reads fewer levels — see BatchedMatcher.artifact_cfg).
    """

    def __init__(
        self,
        coarse_cfg: TrackerConfig,
        fine_cfg: TrackerConfig,
        intrinsics: Intrinsics,
    ):
        self.coarse_cfg = coarse_cfg
        self.fine_cfg = fine_cfg
        self.intrinsics = intrinsics
        # artifact owner: prepares/evicts under the fine config's key
        self.artifacts = BatchedMatcher(fine_cfg, intrinsics)
        self._key = ("two_stage", coarse_cfg, fine_cfg, intrinsics)
        self._cache = BatchedMatcher._WAVE_FNS.setdefault(self._key, {})
        # flat widths of one coarse / fine result (for the host decode)
        self._f1 = _FLAT_BASE + 4 * (coarse_cfg.first_level - coarse_cfg.last_level + 1)
        self._f2 = _FLAT_BASE + 4 * (fine_cfg.first_level - fine_cfg.last_level + 1)

    def _fn(self, batch: int):
        if batch not in self._cache:
            from ..ops import se3

            coarse = functools.partial(
                match_prepared, self.coarse_cfg, self.intrinsics
            )
            fine = functools.partial(match_prepared, self.fine_cfg, self.intrinsics)

            def flat_batch(refs, curs, ref_quads, cur_quads, streams, init_b):
                # per-pair prepared frames arrive as TUPLES and are
                # stacked INSIDE the program: an eager host-side stack of
                # the fine artifacts is one relay dispatch per pytree
                # leaf (~12 MB of HBM traffic each) before the wave even
                # starts.  Quad tables ride OUTSIDE the vmap as per-pair
                # tuples of STANDALONE arrays selected positionally by
                # stream index (the gather-rate invariant — see
                # BatchedMatcher._fn); each frame serves BOTH roles, so
                # both sides' tables are passed (ref's tables feed the
                # backward solves).
                ref_b = jax.tree.map(lambda *xs: jnp.stack(xs), *refs)
                cur_b = jax.tree.map(lambda *xs: jnp.stack(xs), *curs)

                def one(r, c, s, i):
                    if cur_quads is not None:
                        cq = c._replace(quad=cur_quads)
                        rq = r._replace(quad=ref_quads)
                        kw_f = dict(stream_index=s)
                        kw_b = dict(stream_index=s)
                    else:
                        cq, rq = c, r
                        kw_f = kw_b = {}
                    i_inv = se3.inverse(i)
                    t1f = coarse(r, cq, i, **kw_f)
                    t1b = coarse(c, rq, i_inv, **kw_b)
                    t2f = fine(r, cq, t1f.transformation, **kw_f)
                    t2b = fine(c, rq, t1b.transformation, **kw_b)
                    return jnp.concatenate(
                        [
                            _flatten_result(t1f),
                            _flatten_result(t1b),
                            _flatten_result(t2f),
                            _flatten_result(t2b),
                        ]
                    )

                return jax.vmap(one, in_axes=(0, 0, 0, 0))(
                    ref_b, cur_b, streams, init_b
                )

            self._cache[batch] = jax.jit(flat_batch)
        return self._cache[batch]

    def match_pairs(
        self,
        requests: Sequence[Tuple[Frame, Frame, Optional[np.ndarray]]],
    ) -> List[
        Tuple[
            HostTrackingResult,
            HostTrackingResult,
            HostTrackingResult,
            HostTrackingResult,
        ]
    ]:
        """[(ref, cur, init), ...] -> [(s1_fwd, s1_bwd, s2_fwd, s2_bwd)]
        where the stage-2 results were seeded by the matching direction's
        stage-1 transformation (the validator's feed-forward)."""
        if not requests:
            return []
        n = len(requests)
        # buckets {2, 4, 8}: each slot is 4 unrolled solves, so bucket 8
        # traces like a 32-wide single-stage wave; chunk past 8
        if n > 8:
            out = []
            for s in range(0, n, 8):
                out.extend(self.match_pairs(requests[s : s + 8]))
            return out
        bucket = 2 if n <= 2 else (4 if n <= 4 else 8)
        pad = bucket - n
        self.artifacts._prepare_many(
            [f for r in requests for f in (r[0], r[1])]
        )
        refs = [self.artifacts.prepared(r[0]) for r in requests]
        curs = [self.artifacts.prepared(r[1]) for r in requests]
        refs += [refs[-1]] * pad
        curs += [curs[-1]] * pad
        inits = [
            np.eye(4, dtype=np.float32) if r[2] is None
            else np.asarray(r[2], np.float32)
            for r in requests
        ] + [np.eye(4, dtype=np.float32)] * pad

        fused = any(q is not None for q in curs[0].quad)
        if fused:
            levels = len(curs[0].quad)
            cur_quads = tuple(
                None if curs[0].quad[lv] is None
                else tuple(c.quad[lv] for c in curs)
                for lv in range(levels)
            )
            ref_quads = tuple(
                None if refs[0].quad[lv] is None
                else tuple(r.quad[lv] for r in refs)
                for lv in range(levels)
            )
            none_quad = (None,) * levels
            refs = [r._replace(quad=none_quad) for r in refs]
            curs = [c._replace(quad=none_quad) for c in curs]
        else:
            cur_quads = ref_quads = None
        streams = interp.lockstep_stream_indices(bucket)
        init_b = jnp.asarray(np.stack(inits))
        flat = np.asarray(
            self._fn(bucket)(
                tuple(refs), tuple(curs), ref_quads, cur_quads, streams,
                init_b,
            )
        )  # ONE download for both stages, both directions
        f1, f2 = self._f1, self._f2
        out = []
        for k in range(n):
            row = flat[k]
            out.append(
                (
                    _decode_result(row[:f1]),
                    _decode_result(row[f1 : 2 * f1]),
                    _decode_result(row[2 * f1 : 2 * f1 + f2]),
                    _decode_result(row[2 * f1 + f2 :]),
                )
            )
        return out
