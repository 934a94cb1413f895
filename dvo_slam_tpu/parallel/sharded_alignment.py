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
from ..models import dense_tracker as dt
from ..models.dense_tracker import TrackingResult, match_pyramids
from ..ops import pallas_kernels, robust, se3
from ..ops.camera import Intrinsics
from ..ops.interp import build_quad_table_cm
from ..ops.pyramid import build_acceleration_cm, selection_mask
from .mesh import BATCH_AXIS, batch_sharding, replicated

try:  # JAX >= 0.7 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


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


# ---------------------------------------------------------------------------
# Pixel-parallel alignment (the SP analog)
# ---------------------------------------------------------------------------


def _warp_sample_slice(refpack_slice, quad_cm, shape, intrinsics: Intrinsics, T):
    """Warp + sample one pixel shard: reference geometry comes from the
    channel-major refpack rows (x, y in 4/5, z in 1), so a lane slice
    [8, N_local] is all a device needs; the quad table is replicated."""
    from ..ops.residuals import warp_and_sample_cm

    return warp_and_sample_cm(refpack_slice, quad_cm, shape, intrinsics, T)


def _match_level_sharded(cfg, intrinsics, axis, refpack, quad, shape, x0, T0, precision0):
    """One pyramid level of the pixel-sharded IRLS solve.

    Runs inside shard_map: ``refpack`` is this device's pixel shard
    [N_local, 8]; ``quad`` is replicated.  Per iteration each device
    computes fused partials on its shard; ONE psum of the [8, ~136]
    partial block reduces the normal equations, scale statistics, and
    log-likelihood over ICI (P3 + P6 of SURVEY.md 2.5); the 6x6 solve and
    pose update run replicated.
    """
    dtype = refpack.dtype
    dof = cfg.influence_function_param

    def evaluate(T, P_prev, first):
        sampled = _warp_sample_slice(refpack, quad, shape, intrinsics, T)
        p3 = jnp.stack([P_prev[0, 0], P_prev[0, 1], P_prev[1, 1]])
        parts = pallas_kernels.fused_partials_xla(
            sampled, refpack, p3, first.astype(jnp.int32), intrinsics, dof
        )
        # the ICI reduction: all precision-independent partials at once
        m00 = jax.lax.psum(parts.m00, axis)
        m01 = jax.lax.psum(parts.m01, axis)
        m11 = jax.lax.psum(parts.m11, axis)
        v = jax.lax.psum(parts.v, axis)
        scale_sum = jax.lax.psum(parts.scale_sum, axis)
        n_total = jax.lax.psum(parts.num_valid, axis)

        s = scale_sum
        sigma = jnp.array([[s[0], s[1]], [s[1], s[2]]], dtype) / jnp.maximum(
            n_total - 3.0, 1.0
        )
        precision_new = robust.precision_from_scale(sigma)

        # log-likelihood: local log1p sum + psum, replicated logdet term
        r_i, r_z = parts.residuals[0], parts.residuals[1]
        p00, p01, p11 = (
            precision_new[0, 0], precision_new[0, 1], precision_new[1, 1],
        )
        d2 = r_i * (p00 * r_i + p01 * r_z) + r_z * (p01 * r_i + p11 * r_z)
        local = jnp.sum(jnp.where(parts.weights > 0, jnp.log1p(d2 / dof), 0.0))
        log_sum = jax.lax.psum(local, axis)
        det = (
            precision_new[0, 0] * precision_new[1, 1]
            - precision_new[0, 1] * precision_new[1, 0]
        )
        ll = 0.5 * n_total * jnp.log(jnp.maximum(det, 1e-30)) - 0.5 * (
            dof + 2.0
        ) * log_sum

        full = pallas_kernels.FusedPartials(
            m00=m00, m01=m01, m11=m11, v=v, scale_sum=scale_sum,
            num_valid=n_total, residuals=parts.residuals, weights=parts.weights,
        )
        A, b = pallas_kernels.assemble_normal_equations(full, precision_new)
        return n_total.astype(jnp.int32), precision_new, ll, A, b

    def body(c: dt._Carry) -> dt._Carry:
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
            A = A + cfg.mu * jnp.eye(6, dtype=dtype)
            b = b + cfg.mu * se3.log_se3(initial_new)
        x_new = dt._solve_jacobi_preconditioned(A, b)
        converged = jnp.max(jnp.abs(x_new)) <= cfg.precision
        exceeded = c.iteration + 1 >= cfg.max_iterations_per_level
        termination = jnp.where(
            too_few,
            dt.TERM_TOO_FEW_CONSTRAINTS,
            jnp.where(
                ~accept,
                dt.TERM_LOG_LIKELIHOOD_DECREASED,
                jnp.where(
                    converged,
                    dt.TERM_INCREMENT_TOO_SMALL,
                    jnp.where(exceeded, dt.TERM_ITERATIONS_EXCEEDED, dt.TERM_NONE),
                ),
            ),
        ).astype(jnp.int32)
        keep = lambda new, old: jnp.where(reject, old, new)
        return dt._Carry(
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

    init = dt._Carry(
        x=x0,
        T=T0,
        initial=se3.identity(dtype),
        inc_applied=se3.exp_se3(x0),
        precision=precision0,
        error=jnp.asarray(jnp.inf, dtype),
        A=jnp.eye(6, dtype=dtype),
        ll=jnp.asarray(-jnp.inf, dtype),
        n=jnp.asarray(0, jnp.int32),
        iteration=jnp.asarray(0, jnp.int32),
        termination=jnp.asarray(dt.TERM_NONE, jnp.int32),
        done=jnp.asarray(False),
    )
    return jax.lax.while_loop(lambda c: ~c.done, body, init)


def make_pixel_sharded_matcher(
    cfg: TrackerConfig, intrinsics: Intrinsics, mesh: Mesh, axis: str = BATCH_AXIS
):
    """ONE dense alignment sharded over pixels across the mesh.

    This is the single-stream scaling path: when one camera must track
    faster than a chip's serial solve, reference pixels are partitioned
    across devices, the quad sampling table is replicated, and every GN
    iteration reduces its normal equations over ICI.  Returns
    ``run(ref_levels, cur_levels, initial_pose) -> TrackingResult`` with
    the full per-level statistics (so the result can feed the keyframe
    policy and loop voters like any other match).
    """
    n_dev = mesh.shape[axis]

    def solve(ref_levels, cur_levels, initial):
        guess = se3.inverse(initial)
        x = se3.log_se3(guess)
        T = se3.identity(jnp.float32)
        precision = jnp.eye(2, dtype=jnp.float32)
        final = None
        level_stats = []

        for level in range(cfg.first_level, cfg.last_level - 1, -1):
            ref_level = ref_levels[level]
            cur_level = cur_levels[level]
            k_level = intrinsics.at_level(level)
            sel = selection_mask(
                ref_level,
                cfg.intensity_derivative_threshold,
                cfg.depth_derivative_threshold,
            )
            quad = build_quad_table_cm(
                build_acceleration_cm(cur_level), cur_level.intensity.shape[1]
            )
            refpack = dt._build_refpack(ref_level, sel, k_level)  # [8, N]
            n = refpack.shape[1]
            n_pad = -(-n // n_dev) * n_dev
            refpack = jnp.pad(refpack, ((0, 0), (0, n_pad - n)))
            shape = ref_level.intensity.shape

            @functools.partial(
                shard_map,
                mesh=mesh,
                in_specs=(P(None, axis), P(), P(), P(), P()),
                out_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
            )
            def run_level(refpack_sharded, quad_r, x_r, T_r, precision_r):
                c = _match_level_sharded(
                    cfg, k_level, axis, refpack_sharded, quad_r, shape,
                    x_r, T_r, precision_r,
                )
                return (
                    c.T,
                    se3.log_se3(c.inc_applied),
                    c.precision,
                    c.ll,
                    c.n,
                    c.A,
                    c.iteration,
                    c.termination,
                )

            T, x, precision, ll, n_valid, A, iters, term = run_level(
                refpack, quad, x, T, precision
            )
            level_stats.append(
                dt.LevelStats(
                    valid_pixels=sel.sum(dtype=jnp.int32),
                    valid_constraints=n_valid,
                    iterations=iters,
                    termination=term,
                )
            )
            final = (ll, A)

        return dt.TrackingResult(
            transformation=se3.inverse(T),
            information=final[1] * dt.INFORMATION_SCALE,
            neg_log_likelihood=-final[0],
            level_stats=tuple(level_stats),
        )

    return jax.jit(solve)
