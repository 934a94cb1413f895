"""Dense RGB-D tracker: coarse-to-fine IRLS Gauss-Newton on SE(3).

TPU-native redesign of the reference's DenseTracker
(dvo_core/src/dense_tracking.cpp:131-376).  Architectural translations:

  * The data-dependent do/while per pyramid level becomes a
    ``lax.while_loop`` with the accept/revert logic (the reference's
    ``Revertable`` rollback, util/revertable.h:29-58) encoded as carried
    state — rejected steps simply keep the previous carry.
  * Point compaction becomes dense masking (static shapes for XLA).
  * The whole multi-level solve is one jittable, vmap-able pure function:
    batching over frame pairs replaces the reference's TBB task parallelism
    (local_tracker.cpp:180-185) and its per-proposal thread pools
    (keyframe_graph.cpp:524-593).

Solver scheme per level (reference line citations in SURVEY.md section 3.4):
iterate { apply increment; evaluate residuals; IRLS weights from the
*previous* precision (weight lag, dense_tracking.cpp:286-301); re-estimate
the 2x2 t-distribution precision; accept if the negative log-likelihood
decreased else revert and stop; assemble 6x6 normal equations on the MXU;
solve } until the increment's infinity norm drops below ``cfg.precision``
or the iteration cap is hit (dense_tracking.cpp:357-363).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import InfluenceFunction, ScaleEstimator, TrackerConfig
from ..ops import least_squares, pallas_kernels, robust, se3
from ..ops.camera import Intrinsics, unproject
from ..ops.pyramid import (
    PyramidLevel,
    build_acceleration,
    build_pyramid,
    selection_mask,
)
from ..ops.residuals import (
    ResidualData,
    compute_residuals,
    normal_equations,
    warp_and_sample,
    warp_and_sample_cm,
)

_DEBUG = False  # set True to trace per-iteration solver state

# Termination criteria (reference: dense_tracking.h TerminationCriteria).
TERM_NONE = 0
TERM_ITERATIONS_EXCEEDED = 1
TERM_INCREMENT_TOO_SMALL = 2
TERM_LOG_LIKELIHOOD_DECREASED = 3
TERM_TOO_FEW_CONSTRAINTS = 4

# Information-matrix scaling applied to the final Hessian
# (reference: dense_tracking.cpp:371-372) — load-bearing for the keyframe
# policy's divergence reset (keyframe_tracker.cpp:144-148).
INFORMATION_SCALE = 0.008 * 0.008


class LevelStats(NamedTuple):
    """Per-level statistics (reference: LevelStats, dense_tracking.h:96-106)."""

    valid_pixels: jnp.ndarray  # selected reference points on this level
    valid_constraints: jnp.ndarray  # surviving constraints, last iteration
    iterations: jnp.ndarray
    termination: jnp.ndarray


class IterationStats(NamedTuple):
    """Per-iteration solver telemetry, one [max_iterations, ...] row per
    executed iteration (reference: IterationStats, dense_tracking.h:83-95).
    Rows past ``LevelStats.iterations`` are zero.  Only populated when
    ``match_pyramids(..., collect_iteration_stats=True)``.
    """

    valid_constraints: jnp.ndarray  # [I]
    log_likelihood: jnp.ndarray  # [I] t-distribution LL of the iteration
    precision: jnp.ndarray  # [I, 2, 2] estimated t-dist precision
    increment: jnp.ndarray  # [I, 6] solved increment (next step)
    information: jnp.ndarray  # [I, 6, 6] normal-equation A


class TrackingResult(NamedTuple):
    """Result of one dense alignment
    (reference: DenseTracker::Result, dense_tracking.h:42-81).

    ``transformation`` is the pose of the current camera in the reference
    frame (the inverse of the warp estimate, dense_tracking.cpp:371).
    ``neg_log_likelihood`` follows the reference's Result.LogLikelihood
    semantics: it is the *negative* t-distribution log-likelihood plus the
    prior term — lower is better.  ``iteration_stats`` carries the full
    per-iteration debug telemetry (one IterationStats per solved level,
    coarse first) when requested, else an empty tuple.
    """

    transformation: jnp.ndarray  # [4, 4]
    information: jnp.ndarray  # [6, 6]
    neg_log_likelihood: jnp.ndarray  # []
    level_stats: Tuple[LevelStats, ...]
    iteration_stats: Tuple[IterationStats, ...] = ()

    @property
    def last_level(self) -> LevelStats:
        return self.level_stats[-1]

    def is_nan(self):
        """Reference: Result::isNaN (dense_tracking_config.cpp:96-99)."""
        return ~jnp.all(jnp.isfinite(self.transformation))


class _Carry(NamedTuple):
    x: jnp.ndarray  # [6] increment to apply next iteration
    T: jnp.ndarray  # [4, 4] current warp estimate
    initial: jnp.ndarray  # [4, 4] remaining prior offset
    inc_applied: jnp.ndarray  # [4, 4] last successfully applied increment
    precision: jnp.ndarray  # [2, 2]
    error: jnp.ndarray  # [] previous -log-likelihood
    A: jnp.ndarray  # [6, 6] information of last accepted iteration
    ll: jnp.ndarray  # [] log-likelihood of last accepted iteration
    n: jnp.ndarray  # [] valid constraints of last accepted iteration
    iteration: jnp.ndarray  # []
    termination: jnp.ndarray  # []
    done: jnp.ndarray  # [] bool


# The production 6x6 solve (see ops/least_squares.py for the full solver
# registry: LDLT-equivalent, EVD-truncated, SVD).
_solve_jacobi_preconditioned = least_squares.solve_ldlt


def _weights_for(cfg: TrackerConfig, residuals, precision, mask):
    """Influence-function dispatch (static on cfg).

    The bivariate t-distribution is the production path
    (dense_tracking_impl.cpp:640-707); Huber/Tukey operate on the
    Mahalanobis distance for the univariate registry parity."""
    if not cfg.use_weighting or cfg.influence_function is InfluenceFunction.UNIT:
        return mask.astype(residuals.dtype)
    if cfg.influence_function is InfluenceFunction.TDISTRIBUTION:
        return robust.tdist_weights(
            residuals, precision, mask, cfg.influence_function_param
        )
    d = jnp.sqrt(jnp.maximum(robust.mahalanobis_sq(residuals, precision), 0.0))
    if cfg.influence_function is InfluenceFunction.HUBER:
        w = robust.huber_weights(d)
    elif cfg.influence_function is InfluenceFunction.TUKEY:
        w = robust.tukey_weights(d)
    else:
        raise ValueError(f"unknown influence function {cfg.influence_function}")
    return jnp.where(mask, w, 0.0)


def _scale_for(cfg: TrackerConfig, residuals, weights, n, prev_precision):
    """Scale-estimator dispatch (static on cfg) returning a precision."""
    if cfg.scale_estimator is ScaleEstimator.TDISTRIBUTION:
        sigma = robust.tdist_scale(residuals, weights, n)
        return robust.precision_from_scale(sigma)
    if cfg.scale_estimator is ScaleEstimator.UNIT:
        return jnp.eye(2, dtype=residuals.dtype)
    if cfg.scale_estimator is ScaleEstimator.NORMAL:
        mask = weights > 0
        s_i = robust.normal_scale(residuals[:, 0], mask)
        s_z = robust.normal_scale(residuals[:, 1], mask)
        return jnp.diag(
            1.0 / jnp.maximum(jnp.stack([s_i, s_z]) ** 2, 1e-12)
        )
    if cfg.scale_estimator is ScaleEstimator.MAD:
        mask = weights > 0
        s_i = robust.mad_scale(residuals[:, 0], mask)
        s_z = robust.mad_scale(residuals[:, 1], mask)
        return jnp.diag(
            1.0 / jnp.maximum(jnp.stack([s_i, s_z]) ** 2, 1e-12)
        )
    raise ValueError(f"unknown scale estimator {cfg.scale_estimator}")


def _resolve_backend(cfg: TrackerConfig) -> str:
    """Pick the inner-loop implementation (static decision at trace time).

    The fused kernels hard-code the production t-distribution statistics;
    any other influence/scale configuration falls back to the modular XLA
    oracle path.
    """
    backend = cfg.kernel_backend
    tdist = (
        cfg.use_weighting
        and cfg.influence_function is InfluenceFunction.TDISTRIBUTION
        and cfg.scale_estimator is ScaleEstimator.TDISTRIBUTION
    )
    if backend == "auto":
        if not tdist:
            return "xla"
        return "pallas" if jax.default_backend() != "cpu" else "fused"
    if backend in ("fused", "pallas") and not tdist:
        raise ValueError(
            f"kernel_backend={backend!r} requires t-distribution weighting"
        )
    return backend


def _build_refpack(ref_level: PyramidLevel, sel_mask, intrinsics: Intrinsics):
    """Reference-side channel pack, channel-MAJOR [8, N]:
    (intensity, depth, idx, idy, x, y, selected, 0) — pixels ride the
    TPU lane axis (see pallas_kernels.fused_partials_xla's layout note).
    Rows 4/5 cache the unprojected x/y so the per-iteration warp never
    re-unprojects (the reference's precomputed point cloud,
    rgbd_image.cpp:245-262)."""
    h, w = ref_level.intensity.shape
    n = h * w
    dtype = ref_level.intensity.dtype
    z = ref_level.depth.reshape(n)
    col = jax.lax.iota(dtype, n) % w
    row = jax.lax.iota(dtype, n) // w
    x = (col - intrinsics.ox) / intrinsics.fx * z
    y = (row - intrinsics.oy) / intrinsics.fy * z
    return jnp.stack(
        [
            ref_level.intensity.reshape(n),
            ref_level.depth.reshape(n),
            ref_level.idx.reshape(n),
            ref_level.idy.reshape(n),
            x,
            y,
            sel_mask.reshape(n).astype(dtype),
            jnp.zeros(n, dtype),
        ]
    )


def _match_level(
    cfg: TrackerConfig,
    intrinsics: Intrinsics,
    ref_level: PyramidLevel,
    sel_mask,
    cur_accel,
    x0,
    T0,
    initial0,
    precision0,
    collect_stats: bool = False,
    refpack=None,
    quad=None,
    quad_offset=None,
    stream_index=None,
):
    """Run the IRLS Gauss-Newton iteration on one pyramid level.

    ``refpack``/``quad`` are the per-level cached artifacts of the fused
    path (see :func:`prepare_frame`); computed on the fly when absent.
    ``ref_level`` may be None when ``refpack`` is given (the fused path
    needs only the level SHAPE, taken from ``sel_mask``) — this keeps
    scanned front-end carries free of unused full-resolution tensors.
    Stream batching: ``quad`` may be a TUPLE of per-stream standalone
    tables selected by ``stream_index`` (the lockstep engine's form — see
    interp._quad_sampler), or a flat shared [32, B*N] table indexed
    at ``quad_offset`` (only for small tables).
    """
    backend = _resolve_backend(cfg)
    dof = cfg.influence_function_param
    if ref_level is None:
        if backend == "xla" or refpack is None:
            raise ValueError(
                "ref_level=None requires the fused/pallas backend with a "
                "prepared refpack"
            )
        dtype = refpack.dtype
        level_shape = sel_mask.shape
    else:
        dtype = ref_level.intensity.dtype
        level_shape = ref_level.intensity.shape
    if backend in ("fused", "pallas") and refpack is None:
        refpack = _build_refpack(ref_level, sel_mask, intrinsics)

    def evaluate_xla(T, P_prev, first):
        """Modular oracle path (one op per reference kernel)."""
        rd: ResidualData = compute_residuals(
            ref_level.intensity,
            ref_level.depth,
            ref_level.idx,
            ref_level.idy,
            sel_mask,
            cur_accel,
            intrinsics,
            T,
        )
        n = rd.num_valid
        w_lagged = _weights_for(cfg, rd.residuals, P_prev, rd.mask)
        weights = jnp.where(first, rd.mask.astype(dtype), w_lagged)
        precision_new = _scale_for(cfg, rd.residuals, weights, n, P_prev)
        ll = robust.tdist_log_likelihood(rd.residuals, precision_new, rd.mask, dof)
        A, b = normal_equations(rd, weights, precision_new)
        return n, precision_new, ll, A, b

    if backend in ("fused", "pallas") and quad is None:
        from ..ops.interp import build_quad_table_cm

        # loop-invariant, built per level (channel-major; see refpack note);
        # the uncached fallback accepts the [H, W, 8] oracle-path tensor
        accel_cm = (
            cur_accel.reshape(-1, cur_accel.shape[-1]).T
            if cur_accel.ndim == 3
            else cur_accel
        )
        quad = build_quad_table_cm(accel_cm, level_shape[1])

    def evaluate_fused(T, P_prev, first):
        """Fused path: the warp gather feeds the two-pass kernel (Pallas
        on TPU, XLA twin elsewhere), which emits the Gram partials AND the
        log1p sum — per-pixel residuals/weights never round-trip HBM."""
        sampled = warp_and_sample_cm(
            refpack, quad, level_shape, intrinsics, T,
            lane_offset=quad_offset, stream_index=stream_index,
            depth_buffered=cfg.depth_buffered_sampling,
        )
        p3 = jnp.stack([P_prev[0, 0], P_prev[0, 1], P_prev[1, 1]])
        fn = (
            pallas_kernels.fused_stats_pallas
            if backend == "pallas"
            else pallas_kernels.fused_stats_xla
        )
        stats = fn(sampled, refpack, p3, first.astype(jnp.int32), intrinsics, dof)
        n = stats.num_valid.astype(jnp.int32)
        denom = jnp.maximum(stats.num_valid - 3.0, 1.0)
        precision_new = robust.precision_from_scale(
            pallas_kernels.scale_matrix(stats) / denom
        )
        det = (
            precision_new[0, 0] * precision_new[1, 1]
            - precision_new[0, 1] * precision_new[1, 0]
        )
        logdet = jnp.log(jnp.maximum(det, jnp.asarray(1e-38, dtype)))
        ll = 0.5 * stats.num_valid * logdet - 0.5 * (dof + 2.0) * stats.log_sum
        A, b = pallas_kernels.assemble_normal_equations(stats, precision_new)
        return n, precision_new, ll, A, b

    evaluate = evaluate_xla if backend == "xla" else evaluate_fused

    def step(c: _Carry):
        inc = se3.exp_se3(c.x)
        T_new = inc @ c.T
        initial_new = se3.inverse(inc) @ c.initial

        first = c.iteration == 0
        n, precision_new, ll, A, b = evaluate(T_new, c.precision, first)
        too_few = n < 6
        error = -ll

        accept = error < c.error
        reject = too_few | ~accept

        if cfg.use_estimate_smoothing:
            # Prior toward the initial guess (dense_tracking.cpp:345-346).
            A = A + cfg.mu * jnp.eye(6, dtype=dtype)
            b = b + cfg.mu * se3.log_se3(initial_new)
        x_new = _solve_jacobi_preconditioned(A, b)

        converged = jnp.max(jnp.abs(x_new)) <= cfg.precision
        exceeded = c.iteration + 1 >= cfg.max_iterations_per_level

        if _DEBUG:
            jax.debug.print(
                "it={i} n={n} err={e} acc={a} xmax={x} P={p}",
                i=c.iteration, n=n, e=error, a=accept,
                x=jnp.max(jnp.abs(x_new)), p=precision_new.ravel(),
            )

        termination = jnp.where(
            too_few,
            TERM_TOO_FEW_CONSTRAINTS,
            jnp.where(
                ~accept,
                TERM_LOG_LIKELIHOOD_DECREASED,
                jnp.where(
                    converged,
                    TERM_INCREMENT_TOO_SMALL,
                    jnp.where(exceeded, TERM_ITERATIONS_EXCEEDED, TERM_NONE),
                ),
            ),
        ).astype(jnp.int32)

        # On reject, keep the previous estimate (the Revertable rollback) and
        # the previous accepted statistics; the loop then stops.
        keep = lambda new, old: jnp.where(reject, old, new)
        new_c = _Carry(
            x=keep(x_new, c.x),
            T=keep(T_new, c.T),
            initial=keep(initial_new, c.initial),
            inc_applied=jnp.where(reject, c.inc_applied, inc),
            precision=keep(precision_new, c.precision),
            error=keep(error, c.error),
            A=keep(A, c.A),
            ll=keep(ll, c.ll),
            n=jnp.where(reject, c.n, n),
            iteration=c.iteration + 1,
            termination=termination,
            done=reject | converged | exceeded,
        )
        # Per-iteration telemetry of the iteration as executed (pre-revert),
        # matching the reference's per-iteration IterationStats record
        # (dense_tracking.cpp:286-355 pushes one entry per loop pass).
        row = IterationStats(
            valid_constraints=n.astype(dtype),
            log_likelihood=ll,
            precision=precision_new,
            increment=x_new,
            information=A,
        )
        return new_c, row

    init = _Carry(
        x=x0,
        T=T0,
        initial=initial0,
        inc_applied=se3.exp_se3(x0),
        precision=precision0,
        error=jnp.asarray(jnp.inf, dtype),
        A=jnp.eye(6, dtype=dtype),
        ll=jnp.asarray(-jnp.inf, dtype),
        n=jnp.asarray(0, jnp.int32),
        iteration=jnp.asarray(0, jnp.int32),
        termination=jnp.asarray(TERM_NONE, jnp.int32),
        done=jnp.asarray(False),
    )
    if collect_stats:
        max_it = cfg.max_iterations_per_level
        trace0 = IterationStats(
            valid_constraints=jnp.zeros(max_it, dtype),
            log_likelihood=jnp.zeros(max_it, dtype),
            precision=jnp.zeros((max_it, 2, 2), dtype),
            increment=jnp.zeros((max_it, 6), dtype),
            information=jnp.zeros((max_it, 6, 6), dtype),
        )

        def body_traced(ct):
            c, tr = ct
            new_c, row = step(c)
            tr = jax.tree.map(lambda buf, r: buf.at[c.iteration].set(r), tr, row)
            return new_c, tr

        final, trace = jax.lax.while_loop(
            lambda ct: ~ct[0].done, body_traced, (init, trace0)
        )
    else:
        final = jax.lax.while_loop(lambda c: ~c.done, lambda c: step(c)[0], init)
        trace = None
    stats = LevelStats(
        valid_pixels=sel_mask.sum(dtype=jnp.int32),
        valid_constraints=final.n,
        iterations=final.iteration,
        termination=final.termination,
    )
    return final, stats, trace


class PreparedFrame(NamedTuple):
    """Per-frame cached solver artifacts, one entry per pyramid level
    (``None`` outside the solve range).

    The reference caches exactly these across match calls: PointSelection
    per keyframe (point_selection.cpp:89-117), the acceleration structure
    per frame (local_tracker.cpp:162-169).  ``sel``/``refpack`` serve the
    frame's REFERENCE role, ``accel``/``quad`` its CURRENT role; a frame
    prepared once serves both (cur this update, ref the next — and a
    keyframe's ref artifacts live for its whole lifetime).
    """

    levels: Tuple[Optional[PyramidLevel], ...]
    sel: Tuple[Optional[jnp.ndarray], ...]
    refpack: Tuple[Optional[jnp.ndarray], ...]
    accel: Tuple[Optional[jnp.ndarray], ...]
    quad: Tuple[Optional[jnp.ndarray], ...]


def prepare_frame(
    cfg: TrackerConfig,
    intrinsics: Intrinsics,
    levels: Sequence[PyramidLevel],
) -> PreparedFrame:
    """Precompute both roles' per-level artifacts for the solve range.

    The fused path's artifacts are channel-MAJOR (refpack [8, N], quad
    [32, N] — see pallas_kernels.fused_partials_xla's layout note); the
    modular XLA oracle keeps the channel-last acceleration tensor.
    """
    backend = _resolve_backend(cfg)
    fused = backend in ("fused", "pallas")
    if fused:
        from ..ops.interp import build_quad_table_cm
        from ..ops.pyramid import build_acceleration_cm

    n = len(levels)
    sel = [None] * n
    refpack = [None] * n
    accel = [None] * n
    quad = [None] * n
    out_levels = [None] * n
    for level in range(cfg.last_level, cfg.first_level + 1):
        lv = levels[level]
        out_levels[level] = lv
        sel[level] = selection_mask(
            lv,
            cfg.intensity_derivative_threshold,
            cfg.depth_derivative_threshold,
        )
        if fused:
            refpack[level] = _build_refpack(lv, sel[level], intrinsics.at_level(level))
            quad[level] = build_quad_table_cm(
                build_acceleration_cm(lv), lv.intensity.shape[1]
            )
        else:
            accel[level] = build_acceleration(lv)
    return PreparedFrame(
        levels=tuple(out_levels),
        sel=tuple(sel),
        refpack=tuple(refpack),
        accel=tuple(accel),
        quad=tuple(quad),
    )


def ref_artifacts(prepared: PreparedFrame) -> PreparedFrame:
    """Strip a PreparedFrame down to its REFERENCE-role artifacts
    (selection mask + refpack) for the fused path.

    The cur-role artifacts (quad table, acceleration tensor) and the full
    pyramid levels are dropped — scanned front ends carry keyframes across
    steps and every carried byte is a per-frame select/copy, so the carry
    should hold only what the next match reads (local_tracker.cpp:162-169
    caches exactly the per-role structures too).
    """
    none = (None,) * len(prepared.levels)
    return PreparedFrame(
        levels=none,
        sel=prepared.sel,
        refpack=prepared.refpack,
        accel=none,
        quad=none,
    )


def match_prepared(
    cfg: TrackerConfig,
    intrinsics: Intrinsics,
    ref: PreparedFrame,
    cur: PreparedFrame,
    initial_transformation=None,
    collect_iteration_stats: bool = False,
    quad_offset=None,
    stream_index=None,
) -> TrackingResult:
    """Align two PREPARED frames — the cached-artifact core of
    :func:`match_pyramids` (which prepares on the fly).  Use this with
    :func:`prepare_frame` to amortize per-keyframe selection/refpack and
    per-frame acceleration/quad-table builds across match calls, as the
    reference does (point_selection.cpp:89-117, local_tracker.cpp:162-169).

    Stream batching: when ``cur.quad`` holds per-level TUPLES of
    per-stream standalone tables, ``stream_index`` selects this stream's
    table (the lockstep engine — interp._quad_sampler);
    ``quad_offset`` (per-level tuple of scalars) instead selects a lane
    segment of flat shared tables (small-table form).
    """
    first = ref.levels[cfg.first_level]
    dtype = (
        first.intensity.dtype if first is not None
        else ref.refpack[cfg.first_level].dtype
    )
    if initial_transformation is None:
        guess = jnp.eye(4, dtype=dtype)
    else:
        # Result space is estimate^{-1}; the first increment is the estimate.
        guess = se3.inverse(jnp.asarray(initial_transformation, dtype))

    x = se3.log_se3(guess)
    T = se3.identity(dtype)
    initial = guess
    precision = jnp.eye(2, dtype=dtype)

    level_stats = []
    iteration_stats = []
    final = None
    for level in range(cfg.first_level, cfg.last_level - 1, -1):
        k_level = intrinsics.at_level(level)
        final, stats, trace = _match_level(
            cfg,
            k_level,
            ref.levels[level],
            ref.sel[level],
            cur.accel[level],
            x,
            T,
            initial,
            precision,
            collect_stats=collect_iteration_stats,
            refpack=ref.refpack[level],
            quad=cur.quad[level],
            quad_offset=None if quad_offset is None else quad_offset[level],
            stream_index=stream_index,
        )
        level_stats.append(stats)
        if collect_iteration_stats:
            iteration_stats.append(trace)
        # Next level starts from the last *applied* increment, matching the
        # reference's `x = inc.log()` at level entry (dense_tracking.cpp:241).
        x = se3.log_se3(final.inc_applied)
        T = final.T
        initial = final.initial
        precision = final.precision

    if cfg.use_estimate_smoothing:
        prior = cfg.mu * jnp.sum(se3.log_se3(final.initial) ** 2)
    else:
        prior = jnp.zeros((), dtype)
    return TrackingResult(
        transformation=se3.inverse(final.T),
        information=final.A * INFORMATION_SCALE,
        neg_log_likelihood=-final.ll + prior,
        level_stats=tuple(level_stats),
        iteration_stats=tuple(iteration_stats),
    )


def match_pyramids(
    cfg: TrackerConfig,
    intrinsics: Intrinsics,
    ref_levels: Sequence[PyramidLevel],
    cur_levels: Sequence[PyramidLevel],
    initial_transformation=None,
    collect_iteration_stats: bool = False,
) -> TrackingResult:
    """Align a current frame against a reference frame.

    Pure function of its array arguments: jit it with (cfg, intrinsics)
    static, or vmap it over a leading batch dimension for the dual
    keyframe/odometry match and loop-closure proposal waves.  Prepares the
    per-level artifacts inline (see :func:`prepare_frame` /
    :func:`match_prepared` for the cached form the SLAM front end uses).

    ``initial_transformation`` follows the reference convention: it is the
    result-space pose guess (current-in-reference); internally the warp
    estimate is its inverse, applied as the first increment
    (dense_tracking.cpp:146-149 — "our first increment is the given guess").
    """
    if len(ref_levels) <= cfg.first_level or len(cur_levels) <= cfg.first_level:
        raise ValueError(
            f"config needs pyramid levels up to {cfg.first_level} but got "
            f"{len(ref_levels)} ref / {len(cur_levels)} cur levels; build "
            f"pyramids with cfg.num_levels = {cfg.num_levels}"
        )
    for level in range(cfg.last_level, cfg.first_level + 1):
        if ref_levels[level] is None or cur_levels[level] is None:
            raise ValueError(
                f"pyramid level {level} is None (built with skip_below > "
                f"cfg.last_level = {cfg.last_level}?); the solve range "
                f"{cfg.first_level}->{cfg.last_level} needs every level in it"
            )
    ref = prepare_frame(cfg, intrinsics, ref_levels)
    cur = prepare_frame(cfg, intrinsics, cur_levels)
    return match_prepared(
        cfg,
        intrinsics,
        ref,
        cur,
        initial_transformation,
        collect_iteration_stats=collect_iteration_stats,
    )


class DenseTracker:
    """Stateful convenience wrapper with jit caching.

    Mirrors the reference DenseTracker facade (dense_tracking.h:39-213):
    holds a config + intrinsics, compiles one XLA executable per pyramid
    shape, and exposes frame-level and pyramid-level match entry points.
    """

    def __init__(self, intrinsics: Intrinsics, cfg: Optional[TrackerConfig] = None):
        self.cfg = cfg or TrackerConfig()
        self.intrinsics = intrinsics
        self._jitted = functools.partial(
            jax.jit(
                functools.partial(match_pyramids, self.cfg, self.intrinsics),
            )
        )

    def build_pyramid(self, intensity, depth, valid):
        return build_pyramid(intensity, depth, valid, self.cfg.num_levels)

    def match(
        self, ref_levels, cur_levels, initial_transformation=None
    ) -> TrackingResult:
        if initial_transformation is None:
            initial_transformation = jnp.eye(
                4, dtype=ref_levels[self.cfg.first_level].intensity.dtype
            )
        return self._jitted(ref_levels, cur_levels, initial_transformation)
