"""Streaming SLAM front end: the keyframe tracking loop as ONE device program.

The reference's front end is a per-frame host loop (LocalTracker::update,
local_tracker.cpp:157-216, driven at camera rate).  On TPU a per-frame
host round trip dominates the budget, so the whole steady-state loop —
pyramid build, prepare, dual keyframe/odometry match, the keyframe-accept
policy, and the keyframe SWITCH itself — runs inside one ``lax.scan``:

  * carried state holds the PREPARED keyframe and last frame (switching
    keyframes is a masked select of the carried pytree, the TPU-native
    form of the reference's pointer swap, local_tracker.cpp:200-213);
  * the accept criteria (keyframe_tracker.cpp:105-195) are evaluated on
    device as pure arithmetic on the match statistics;
  * each frame emits a flat record (accept/divergence flags, both
    rewritten results, the pose) — ONE download for the whole sequence.

The host then REPLAYS the recorded decisions through the existing
LocalMap/KeyframeGraph back end (models/keyframe_graph.py): the graph
bookkeeping, loop-closure search, validation waves, and optimization are
per-keyframe work the reference itself runs on a background thread
(keyframe_graph.cpp:401-432 — SURVEY.md 2.5 P5), so the front-end scan is
the throughput-critical path and the replay consumes its records without
re-deciding anything.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..ops.camera import Intrinsics
from ..ops.pyramid import build_pyramid, convert_raw_depth
from .dense_tracker import (
    PreparedFrame,
    _resolve_backend,
    match_prepared,
    prepare_frame,
    ref_artifacts,
)
from .frames import Frame
from .keyframe_graph import KeyframeGraph
from .local_map import LocalMap

# Per-result flat block: 16 (T) + 36 (info) + 1 (nll) + 2 (n, pixels)
_RES = 55


class _State(NamedTuple):
    kf: PreparedFrame
    last: PreparedFrame
    kf_pose: jnp.ndarray  # [4, 4] keyframe world pose
    last_pose: jnp.ndarray  # [4, 4] last frame world pose
    last_to_kf: jnp.ndarray  # [4, 4] policy state (keyframe_tracker.cpp:123-158)
    last_kf_estimate: jnp.ndarray  # [4, 4] warm start for the keyframe match
    eval_first: jnp.ndarray  # [] first -nll of the current local map


def _flat_res(T, info, nll, n, pixels):
    return jnp.concatenate(
        [
            T.reshape(16),
            info.reshape(36),
            nll[None],
            n.astype(jnp.float32)[None],
            pixels.astype(jnp.float32)[None],
        ]
    )


class FrameRecord(NamedTuple):
    """Host-side decode of one frame's record."""

    accept: bool
    diverged: bool
    forced: bool
    entropy_ratio: float
    kf_T: np.ndarray
    kf_info: np.ndarray
    kf_nll: float
    kf_n: int
    kf_pixels: int
    odo_T: np.ndarray
    odo_info: np.ndarray
    odo_nll: float
    odo_n: int
    odo_pixels: int
    pose: np.ndarray


def _decode(row: np.ndarray) -> FrameRecord:
    k = row[4 : 4 + _RES]
    o = row[4 + _RES : 4 + 2 * _RES]
    return FrameRecord(
        accept=bool(row[0] > 0.5),
        diverged=bool(row[1] > 0.5),
        forced=bool(row[2] > 0.5),
        entropy_ratio=float(row[3]),
        kf_T=k[:16].reshape(4, 4).astype(np.float64),
        kf_info=k[16:52].reshape(6, 6).astype(np.float64),
        kf_nll=float(k[52]),
        kf_n=int(k[53]),
        kf_pixels=int(k[54]),
        odo_T=o[:16].reshape(4, 4).astype(np.float64),
        odo_info=o[16:52].reshape(6, 6).astype(np.float64),
        odo_nll=float(o[52]),
        odo_n=int(o[53]),
        odo_pixels=int(o[54]),
        pose=row[4 + 2 * _RES :].reshape(4, 4).astype(np.float64),
    )


def host_reduce_ingest(intensity_u8, depth_u16, levels: int):
    """EXACT host-side reduction of camera frames to pyramid level
    ``levels``: intensity as a lossless u16 4^k-scaled 2x2 mean (four u8
    summands per step fit u16 up to k=3), depth as the reference's
    subsample decimation (a stride-2 slice — free on host, a cross-lane
    gather on TPU).

    Why: the benchmark operating point solves levels 3->1
    (dense_tracking_config.cpp:27-42 + benchmark.yaml) — level 0 pixels
    are read exactly once, by the L0->L1 downsample.  Shipping them to
    the device first costs 3 bytes/pixel of host->HBM bandwidth for one
    trivially host-computable reduction (through this sandbox's ~27 MB/s
    relay: 184 MB -> 61 MB per 200-frame sequence, measured).  The
    reference's own ingest does comparable per-frame host work (BGR->
    gray float, benchmark_slam.cpp:46-93).  Bit-exact: the device path's
    f32 mean of u8 values and the u16-sum/4 produce identical floats.
    """
    if levels > 3:
        # the u16 block sums bound the depth: 255 * 4^3 = 16320 < 65535,
        # one more level would silently wrap
        raise ValueError(f"host_reduce_ingest supports levels <= 3, got {levels}")
    if intensity_u8.ndim == 3 and levels >= 1:
        try:  # C++ path: two threads, ~10x the single-thread NumPy form
            from ..native import reduce_ingest_native

            return reduce_ingest_native(intensity_u8, depth_u16, levels)
        except Exception:
            pass  # NumPy oracle below (also the parity reference in tests)
    i = intensity_u8.astype(np.uint16)
    d = depth_u16
    for _ in range(levels):
        # floor-halved dims, like the device pyramid (odd trailing
        # row/column never reaches the next level on either path)
        h2, w2 = i.shape[-2] // 2, i.shape[-1] // 2
        i = i[..., : 2 * h2, : 2 * w2]
        i = (
            i[..., 0::2, 0::2] + i[..., 0::2, 1::2]
            + i[..., 1::2, 0::2] + i[..., 1::2, 1::2]
        )
        d = d[..., : 2 * h2 : 2, : 2 * w2 : 2]
    return i, d


def make_streaming_frontend(cfg: SlamConfig, intrinsics: Intrinsics,
                            ingest_level: int = 0, chunked: bool = False):
    """jit-compiled whole-sequence keyframe front end.

    Returns ``run(intensity [T,H,W], depth_u16 [T,H,W],
    force [T] bool, init_T [4,4]) -> records [T, 4+2*55+16]`` — rows 0/1
    cover the bootstrap frames (keyframe_tracker.cpp:227-246).

    With ``ingest_level`` = L > 0 the inputs are the
    :func:`host_reduce_ingest` products (u16, intensity scaled 4^L) and
    the whole solve runs on the physically identical shifted pyramid —
    bit-exact results, 1/4^L the upload bytes per level dropped.

    With ``chunked`` = True returns ``(run_first, run_cont)`` for the
    pipelined driver (see StreamingSLAM.track_sequence's
    ``pipeline_chunk``): run_first also returns the scan carry, run_cont
    advances it over further fixed-size chunks.
    """
    tcfg = cfg.tracker
    kcfg = cfg.keyframe
    if ingest_level:
        import dataclasses

        if ingest_level > tcfg.last_level:
            raise ValueError(
                f"ingest_level {ingest_level} would drop levels the "
                f"solve reads (last_level {tcfg.last_level})"
            )
        intrinsics = intrinsics.at_level(ingest_level)
        tcfg = dataclasses.replace(
            tcfg,
            first_level=tcfg.first_level - ingest_level,
            last_level=tcfg.last_level - ingest_level,
        )
    iscale = 1.0 / (4.0 ** ingest_level)

    def build(iu, du16):
        depth, valid = convert_raw_depth(du16)
        return build_pyramid(
            iu.astype(jnp.float32) * iscale if ingest_level
            else iu.astype(jnp.float32),
            depth, valid, tcfg.num_levels,
            skip_below=tcfg.last_level,
        )

    prep = functools.partial(prepare_frame, tcfg, intrinsics)
    match = functools.partial(match_prepared, tcfg, intrinsics)
    eye = jnp.eye(4, dtype=jnp.float32)
    info_reset = jnp.eye(6, dtype=jnp.float32) * (0.008 * 0.008)

    def res_of(r):
        return (
            r.transformation,
            r.information,
            r.neg_log_likelihood,
            r.last_level.valid_constraints,
            r.last_level.valid_pixels,
        )

    fused = _resolve_backend(tcfg) in ("fused", "pallas")

    def step(state: _State, inputs):
        iu8, du16, force_flag = inputs
        cur = prep(build(iu8, du16))
        # the dual keyframe/odometry match as ONE batch-2 vmapped solve
        # (the reference's tbb::parallel_invoke, local_tracker.cpp:180-185):
        # the two level while-loops run in lockstep, halving the serial
        # kernel chain vs two sequential matches
        init_kf = (
            state.last_kf_estimate if tcfg.use_initial_estimate else eye
        )
        ref_b = jax.tree.map(
            lambda a, b: jnp.stack([a, b]), state.kf, state.last
        )
        init_b = jnp.stack([init_kf, eye])
        if fused:
            # both matches sample the SAME current frame, so its quad
            # table enters UNBATCHED (in_axes=None): the solver loop runs
            # one flat 2M-row gather instead of XLA's slow batched-gather
            # lowering, and the 12+MB of per-frame tables are never
            # duplicated (see interp.bilinear_sample_quad_cm)
            r = jax.vmap(match, in_axes=(0, None, 0))(ref_b, cur, init_b)
        else:
            cur_b = jax.tree.map(lambda x: jnp.stack([x, x]), cur)
            r = jax.vmap(match)(ref_b, cur_b, init_b)
        r_kf = jax.tree.map(lambda x: x[0], r)
        r_odo = jax.tree.map(lambda x: x[1], r)
        kf_T, kf_info, kf_nll, kf_n, kf_pix = res_of(r_kf)
        odo_T, odo_info, odo_nll, odo_n, odo_pix = res_of(r_odo)

        nan = ~(jnp.isfinite(kf_T).all() & jnp.isfinite(odo_T).all())
        force = force_flag | nan

        # criterion 1: entropy ratio vs the map's first frame (:105-121)
        ratio = -kf_nll / state.eval_first
        c1 = ratio > kcfg.min_entropy_ratio

        # criterion 2: divergence rejection with result rewriting (:123-158)
        odo_t = jnp.linalg.norm(odo_T[:3, 3])
        kf_t = jnp.linalg.norm(kf_T[:3, 3])
        diverged = (odo_t > 0.1) | (kf_t > 1.5 * kcfg.max_translational_distance)
        odo_T = jnp.where(diverged, eye, odo_T)
        odo_info = jnp.where(diverged, info_reset, odo_info)
        kf_T = jnp.where(diverged, state.last_to_kf.astype(kf_T.dtype), kf_T)
        new_last_to_kf = kf_T

        # criterion 3: translational distance on the REWRITTEN result (:160-163)
        c3 = jnp.linalg.norm(kf_T[:3, 3]) < kcfg.max_translational_distance

        # criterion 4: constraint ratio (:165-168)
        c4 = (
            kf_n.astype(jnp.float32) / jnp.maximum(kf_pix.astype(jnp.float32), 1.0)
            > kcfg.min_equation_system_constraint_ratio
        )

        accept = c1 & ~diverged & c3 & c4 & ~force

        # keyframe switch: on reject the old last frame becomes the new
        # keyframe and `cur` starts the new map seeded by the odometry
        # result (local_tracker.cpp:200-213; NaN -> identity reset :141-148)
        switch_T = jnp.where(jnp.isfinite(odo_T).all(), odo_T, eye)
        sel = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(accept, x, y), a, b
        )
        # the carry holds only the ref-role artifacts in the fused path:
        # carried quad tables / full levels would cost a >12MB masked
        # select per frame and are never read by the next dual match
        new_state = _State(
            kf=sel(state.kf, state.last),
            last=ref_artifacts(cur) if fused else cur,
            kf_pose=jnp.where(accept, state.kf_pose, state.last_pose),
            last_pose=jnp.where(
                accept, state.kf_pose @ kf_T, state.last_pose @ switch_T
            ),
            last_to_kf=jnp.where(accept, new_last_to_kf, switch_T),
            last_kf_estimate=jnp.where(accept, kf_T, switch_T),
            eval_first=jnp.where(accept, state.eval_first, -odo_nll),
        )
        record = jnp.concatenate(
            [
                jnp.stack(
                    [
                        accept.astype(jnp.float32),
                        diverged.astype(jnp.float32),
                        force.astype(jnp.float32),
                        ratio,
                    ]
                ),
                _flat_res(kf_T, kf_info, kf_nll, kf_n, kf_pix),
                _flat_res(odo_T, odo_info, odo_nll, odo_n, odo_pix),
                new_state.last_pose.reshape(16),
            ]
        )
        return new_state, record

    @jax.jit
    def run(intensity_u8, depth_u16, force, init_T):
        f0 = prep(build(intensity_u8[0], depth_u16[0]))
        f1 = prep(build(intensity_u8[1], depth_u16[1]))
        # bootstrap: second frame initializes the first local map
        # (keyframe_tracker.cpp:227-246 -> local_tracker.cpp:127-155)
        r0 = match(f0, f1, None)
        T0, info0, nll0, n0, pix0 = res_of(r0)
        ok0 = jnp.isfinite(T0).all()
        T0m = jnp.where(ok0, T0, eye)
        init_T = init_T.astype(jnp.float32)
        state = _State(
            kf=ref_artifacts(f0) if fused else f0,
            last=ref_artifacts(f1) if fused else f1,
            kf_pose=init_T,
            last_pose=init_T @ T0m,
            last_to_kf=T0,
            last_kf_estimate=T0,
            eval_first=-nll0,
        )
        zeros = jnp.zeros(_RES, jnp.float32)
        rec0 = jnp.concatenate(
            [jnp.zeros(4, jnp.float32), zeros, zeros, init_T.reshape(16)]
        )
        rec1 = jnp.concatenate(
            [
                jnp.asarray([1.0, 0.0, 0.0, 1.0], jnp.float32),
                _flat_res(T0m, jnp.where(ok0, info0, jnp.eye(6, dtype=jnp.float32)), nll0, n0, pix0),
                zeros,
                state.last_pose.reshape(16),
            ]
        )
        _, records = jax.lax.scan(
            step, state, (intensity_u8[2:], depth_u16[2:], force[2:])
        )
        return jnp.concatenate([rec0[None], rec1[None], records], axis=0)

    if not chunked:
        return run

    # Chunked pair for the PIPELINED driver: run_first covers the
    # bootstrap + the first chunk, run_cont advances the carried _State
    # over one more chunk.  Record semantics identical to `run` — the
    # scan is merely segmented, the carry crosses the jit boundary as a
    # device-resident pytree (so chunk k+1 can be DISPATCHED before chunk
    # k's records are downloaded: the device pipeline stays full while
    # the host decodes and the back-end worker consumes).
    @jax.jit
    def run_first_state(intensity_u8, depth_u16, force, init_T):
        # same as run_first but ALSO returns the carry for continuation
        f0 = prep(build(intensity_u8[0], depth_u16[0]))
        f1 = prep(build(intensity_u8[1], depth_u16[1]))
        r0 = match(f0, f1, None)
        T0, info0, nll0, n0, pix0 = res_of(r0)
        ok0 = jnp.isfinite(T0).all()
        T0m = jnp.where(ok0, T0, eye)
        init_T = init_T.astype(jnp.float32)
        state = _State(
            kf=ref_artifacts(f0) if fused else f0,
            last=ref_artifacts(f1) if fused else f1,
            kf_pose=init_T,
            last_pose=init_T @ T0m,
            last_to_kf=T0,
            last_kf_estimate=T0,
            eval_first=-nll0,
        )
        zeros = jnp.zeros(_RES, jnp.float32)
        rec0 = jnp.concatenate(
            [jnp.zeros(4, jnp.float32), zeros, zeros, init_T.reshape(16)]
        )
        rec1 = jnp.concatenate(
            [
                jnp.asarray([1.0, 0.0, 0.0, 1.0], jnp.float32),
                _flat_res(
                    T0m,
                    jnp.where(ok0, info0, jnp.eye(6, dtype=jnp.float32)),
                    nll0, n0, pix0,
                ),
                zeros,
                state.last_pose.reshape(16),
            ]
        )
        state, records = jax.lax.scan(
            step, state, (intensity_u8[2:], depth_u16[2:], force[2:])
        )
        return state, jnp.concatenate([rec0[None], rec1[None], records], axis=0)

    @jax.jit
    def run_cont(state, intensity_u8, depth_u16, force):
        return jax.lax.scan(step, state, (intensity_u8, depth_u16, force))

    return run_first_state, run_cont


class _StubFrame:
    """Timestamp-only stand-in for intermediate frames in the replayed
    LocalMap (the reference also only keeps vertices + timestamps for
    non-keyframe frames, keyframe_graph.cpp:759-772)."""

    __slots__ = ("timestamp", "index", "levels")

    def __init__(self, timestamp: float, index: int):
        self.timestamp = timestamp
        self.index = index
        self.levels = None


class _ReplayEvaluation:
    """LogLikelihoodEvaluation reconstructed from recorded values
    (tracking_result_evaluation.cpp:26-62 semantics)."""

    def __init__(self, first_value: float):
        self._first = first_value
        self._average = first_value
        self._n = 1.0

    def add_value(self, v: float):
        self._average += v
        self._n += 1.0

    # the voters' interface (constraint_proposal_voter.cpp:101-121)
    def value(self, r) -> float:
        return -float(r.neg_log_likelihood)

    def ratio_with_first(self, r) -> float:
        return self.value(r) / self._first

    def ratio_with_average(self, r) -> float:
        return self.value(r) / self._average * self._n


class StreamingSLAM:
    """Batch SLAM driver: scanned front end + replayed back end.

    ``track_sequence`` runs the whole front end as one device program,
    then replays the recorded per-frame decisions through the standard
    KeyframeGraph (loop closures, optimization schedules and all).
    """

    def __init__(self, intrinsics: Intrinsics, cfg: Optional[SlamConfig] = None,
                 ingest_level: Optional[int] = None):
        """``ingest_level``: pyramid level the host pre-reduces camera
        frames to before upload (host_reduce_ingest).  Default: the
        tracker's last solved level — never ship pixels the solve cannot
        read (bit-exact; the host->device link is the e2e bottleneck,
        BASELINE.md).  Pass 0 to upload raw full-resolution frames."""
        self.cfg = cfg or SlamConfig()
        self.intrinsics = intrinsics
        self.ingest_level = (
            min(self.cfg.tracker.last_level, 3)  # u16-sum bound, see
            if ingest_level is None else ingest_level  # host_reduce_ingest
        )
        self._run = make_streaming_frontend(
            self.cfg, intrinsics, ingest_level=self.ingest_level
        )
        self.graph = KeyframeGraph(intrinsics, self.cfg.graph, self.cfg.tracker)
        self.records: List[FrameRecord] = []

    def reset(self):
        """Fresh SLAM state with WARM executables: replaces the keyframe
        graph but keeps the compiled front end and the validator's
        compiled alignment buckets (a deployed tracker restarting on a new
        sequence pays no recompilation)."""
        # don't leak the old optimizer worker; a captured worker error is
        # DISCARDED with the graph (reset IS the documented recovery path
        # after a poisoned back end — it must not re-raise the failure)
        self.graph.shutdown(raise_errors=False)
        self.graph = KeyframeGraph(
            self.intrinsics, self.cfg.graph, self.cfg.tracker,
            validator=self.graph.validator,
        )
        self.records = []

    def track_frontend(self, intensity_u8, depth_u16, initial=None, force_last=True):
        """Run only the device front end; returns (records, poses [T,4,4]).

        This is the throughput-critical path (what the bench measures);
        the back end consumes the records asynchronously (the reference's
        optimizer-thread split, SURVEY.md 2.5 P5).
        """
        t = intensity_u8.shape[0]
        force = np.zeros(t, bool)
        if force_last:
            force[-1] = True  # benchmark_slam.cpp:477-481
        init_T = (
            np.eye(4, dtype=np.float32)
            if initial is None
            else np.asarray(initial, np.float32)
        )
        if self.ingest_level:
            # pipelined ingest: reduce chunk k+1 on host while chunk k's
            # upload is in flight (jnp.asarray dispatches the transfer
            # asynchronously); the device-side concatenate is HBM-speed
            chunk = 64
            iu_np, du_np = np.asarray(intensity_u8), np.asarray(depth_u16)
            parts_i, parts_d = [], []
            for s in range(0, t, chunk):
                ic, dc = host_reduce_ingest(
                    iu_np[s : s + chunk], du_np[s : s + chunk],
                    self.ingest_level,
                )
                parts_i.append(jnp.asarray(ic))
                parts_d.append(jnp.asarray(dc))
            d_iu = (
                jnp.concatenate(parts_i, axis=0)
                if len(parts_i) > 1 else parts_i[0]
            )
            d_du = (
                jnp.concatenate(parts_d, axis=0)
                if len(parts_d) > 1 else parts_d[0]
            )
        else:
            d_iu = jnp.asarray(intensity_u8)
            d_du = jnp.asarray(depth_u16)
        raw = np.asarray(
            self._run(
                d_iu,
                d_du,
                jnp.asarray(force),
                jnp.asarray(init_T),
            )
        )
        records = [_decode(raw[i]) for i in range(t)]
        poses = np.stack([r.pose for r in records])
        return records, poses

    def track_sequence(
        self,
        intensity_u8,
        depth_u16,
        timestamps,
        initial=None,
        force_last=True,
        finish=True,
        pipeline_chunk: Optional[int] = None,
    ):
        """Front end + replayed back end; returns online poses [T, 4, 4].

        ``pipeline_chunk`` = C runs the PIPELINED form: the scan is
        segmented into C-frame chunks whose carry crosses jit calls, so
        chunk k+1 is already dispatched (and its ingest reduced/uploaded)
        while chunk k's records download, decode, and feed the
        worker-threaded back end — the front-end device work, the
        host↔device transfers, and the back end's validation waves
        overlap instead of running as three serial phases.  Records are
        BIT-IDENTICAL to the monolithic scan (the scan is merely
        segmented); None keeps the single-program form."""
        if pipeline_chunk is not None and pipeline_chunk < 2:
            # a 1-frame chunk would make run_first read frames [0] and [1]
            # of a 1-row array (JAX clamps the OOB index -> silent
            # duplicate bootstrap + misaligned records)
            raise ValueError(
                f"pipeline_chunk must be >= 2 (the first chunk holds the "
                f"two bootstrap frames), got {pipeline_chunk}"
            )
        if pipeline_chunk is None or intensity_u8.shape[0] <= pipeline_chunk:
            records, poses = self.track_frontend(
                intensity_u8, depth_u16, initial, force_last
            )
            self.records = records
            self._replay(records, intensity_u8, depth_u16, timestamps)
        else:
            records, poses = self._track_pipelined(
                intensity_u8, depth_u16, timestamps, initial, force_last,
                pipeline_chunk,
            )
            self.records = records
        if finish:
            self.graph.final_optimization()
        return poses

    def _chunked_runs(self, chunk: int):
        cache = self.__dict__.setdefault("_chunked_cache", {})
        if chunk not in cache:
            cache[chunk] = make_streaming_frontend(
                self.cfg, self.intrinsics, ingest_level=self.ingest_level,
                chunked=True,
            )
        return cache[chunk]

    def _track_pipelined(self, intensity_u8, depth_u16, timestamps, initial,
                         force_last, chunk):
        run_first, run_cont = self._chunked_runs(chunk)
        t = intensity_u8.shape[0]
        t_pad = -(-t // chunk) * chunk
        force = np.zeros(t_pad, bool)
        if force_last:
            force[t - 1] = True  # padded tail rides with force off
        init_T = (
            np.eye(4, dtype=np.float32)
            if initial is None
            else np.asarray(initial, np.float32)
        )
        iu_np, du_np = np.asarray(intensity_u8), np.asarray(depth_u16)
        feeder = _ReplayFeeder(self, iu_np, du_np, timestamps)
        records: List[FrameRecord] = []

        def chunk_arrays(s):
            e = min(s + chunk, t)
            iu_c, du_c = iu_np[s:e], du_np[s:e]
            if e - s < chunk:  # pad with repeats of the last real frame
                reps = chunk - (e - s)
                iu_c = np.concatenate([iu_c, np.repeat(iu_c[-1:], reps, 0)])
                du_c = np.concatenate([du_c, np.repeat(du_c[-1:], reps, 0)])
            if self.ingest_level:
                iu_c, du_c = host_reduce_ingest(iu_c, du_c, self.ingest_level)
            return jnp.asarray(iu_c), jnp.asarray(du_c)

        def consume(raw_handle, s):
            raw = np.asarray(raw_handle)  # sync point for chunk s
            for k in range(min(chunk, t - s)):
                rec = _decode(raw[k])
                records.append(rec)
                feeder.feed(rec)

        pending = None
        state = None
        for s in range(0, t_pad, chunk):
            d_i, d_d = chunk_arrays(s)
            d_f = jnp.asarray(force[s : s + chunk])
            if s == 0:
                state, raw = run_first(d_i, d_d, d_f, jnp.asarray(init_T))
            else:
                state, raw = run_cont(state, d_i, d_d, d_f)
            if pending is not None:
                consume(*pending)  # chunk s executes while s-chunk feeds
            pending = (raw, s)
        consume(*pending)
        feeder.finish()
        poses = np.stack([r.pose for r in records])
        return records, poses

    def _frame(self, intensity_u8, depth_u16, timestamps, i) -> Frame:
        # raw u8/u16 upload; u16/5000 + validity conversion on device
        # (bit-exact vs the host form — convert_raw_depth).  Every frame
        # built here is a KEYFRAME: its first consumer is a loop-closure
        # validation wave, so the validator's (fine-config) solver
        # artifacts are prepared in the SAME program — the wave then
        # issues zero prepare dispatches for it, and the build+prepare
        # happens while the scan of later chunks is still running
        # (validation dispatch count is the weather-sensitive part of
        # the e2e budget).  The validator's LRU evicts these artifacts
        # like any others (same cache key).
        from .constraints import constraint_tracker_config

        return Frame.from_raw(
            np.asarray(intensity_u8[i]),
            np.asarray(depth_u16[i]),
            timestamps[i],
            self.cfg.tracker.num_levels,
            prepare_for=(
                constraint_tracker_config(self.cfg.tracker), self.intrinsics
            ),
        )

    def _replay(self, records, intensity_u8, depth_u16, timestamps):
        """Rebuild the local maps / keyframe graph from the records —
        every decision comes from the device scan, nothing is re-decided."""
        feeder = _ReplayFeeder(self, intensity_u8, depth_u16, timestamps)
        for rec in records:
            feeder.feed(rec)
        feeder.finish()

    def trajectory(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.graph.trajectory()


class _ReplayFeeder:
    """Incremental consumer of front-end records: the _replay state
    machine fed one record at a time, so the PIPELINED driver can hand
    each scan chunk's records to the (worker-threaded) back end while the
    next chunk is still uploading/scanning.  Results are identical to the
    batch loop — the machine is strictly forward."""

    def __init__(self, slam: "StreamingSLAM", intensity_u8, depth_u16,
                 timestamps):
        self.slam = slam
        self.mk = lambda i: slam._frame(intensity_u8, depth_u16, timestamps, i)
        self.timestamps = timestamps
        self.kcfg = slam.cfg.keyframe
        self._i = 0
        self._kf_index = 0
        self._prev_pose = None
        self.local_map: Optional[LocalMap] = None
        self.evaluation: Optional[_ReplayEvaluation] = None

    def feed(self, rec: FrameRecord):
        i = self._i
        self._i += 1
        if i == 0:
            self._first_pose = rec.pose
        elif i == 1:
            self.local_map = LocalMap.create(self.mk(0), self._first_pose)
            self.local_map.add_frame(_StubFrame(self.timestamps[1], 1))
            self.local_map.add_keyframe_measurement(rec.kf_T, rec.kf_info)
            self.evaluation = _ReplayEvaluation(-rec.kf_nll)
        else:
            # the entropy criterion's add() side effect fires whenever ITS
            # vote passes — even on frames other criteria reject; the host
            # loop runs all criteria before branching
            # (keyframe_tracker.cpp:105-121, local_tracker.cpp:192)
            if rec.entropy_ratio > self.kcfg.min_entropy_ratio:
                self.evaluation.add_value(-rec.kf_nll)
            if rec.accept:
                self.local_map.add_frame(_StubFrame(self.timestamps[i], i))
                self.local_map.add_odometry_measurement(rec.odo_T, rec.odo_info)
                self.local_map.add_keyframe_measurement(rec.kf_T, rec.kf_info)
            else:
                new_kf_index = getattr(
                    self.local_map.current_frame, "index", self._kf_index
                )
                self.local_map.evaluation = self.evaluation
                # the completed map's current frame must be a REAL frame:
                # it becomes the next keyframe in the graph
                self.local_map.current_frame = self.mk(new_kf_index)
                self.slam.graph.add(self.local_map)
                # the new map anchors at the previous frame's pose
                # (local_tracker.cpp:200-213)
                self.local_map = LocalMap.create(
                    self.mk(new_kf_index), self._prev_pose
                )
                self.local_map.add_frame(_StubFrame(self.timestamps[i], i))
                self.local_map.add_keyframe_measurement(
                    rec.odo_T if np.isfinite(rec.odo_T).all() else np.eye(4),
                    rec.odo_info,
                )
                self.evaluation = _ReplayEvaluation(-rec.odo_nll)
                self._kf_index = new_kf_index
        self._prev_pose = rec.pose

    def finish(self):
        """Flush the tail map (KeyframeTracker.finish semantics)."""
        if self.local_map is not None and self.local_map.num_frames > 0:
            self.local_map.evaluation = self.evaluation
            idx = getattr(self.local_map.current_frame, "index", self._kf_index)
            self.local_map.current_frame = self.mk(idx)
            self.slam.graph.add(self.local_map)
            self.local_map = None
