"""Fused-kernel parity tests: the Pallas kernel, its XLA twin, and the
modular oracle path must agree (the scalar/SSE twin oracle pattern of the
reference, SURVEY.md section 4.3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.models.dense_tracker import (
    _build_refpack,
    match_pyramids,
)
from dvo_slam_tpu.ops import pallas_kernels, robust, se3
from dvo_slam_tpu.ops.camera import Intrinsics
from dvo_slam_tpu.ops.interp import build_quad_table_cm
from dvo_slam_tpu.ops.pyramid import (
    build_acceleration,
    build_acceleration_cm,
    build_pyramid,
    selection_mask,
)
from dvo_slam_tpu.ops.residuals import (
    compute_residuals,
    normal_equations,
    warp_and_sample_cm,
)
from dvo_slam_tpu.utils import synthetic

K = Intrinsics(80.0, 80.0, 39.5, 29.5)
SHAPE = (60, 80)


def _level_pair(twist, seed=0):
    T = np.asarray(se3.exp_se3(jnp.asarray(twist, jnp.float32)), np.float64)
    i0, d0, v0 = synthetic.render_frame(
        np.eye(4), K, SHAPE, seed=seed, depth_noise=0.002, invalid_fraction=0.03
    )
    i1, d1, v1 = synthetic.render_frame(
        T, K, SHAPE, seed=seed, depth_noise=0.002, invalid_fraction=0.03
    )
    ref = build_pyramid(jnp.asarray(i0), jnp.asarray(d0), jnp.asarray(v0), 1)[0]
    cur = build_pyramid(jnp.asarray(i1), jnp.asarray(d1), jnp.asarray(v1), 1)[0]
    return ref, cur, T


def _fused_inputs(ref, cur, T):
    sel = selection_mask(ref)
    accel = build_acceleration(cur)
    refpack = _build_refpack(ref, sel, K)  # [8, N] channel-major
    quad = build_quad_table_cm(build_acceleration_cm(cur), cur.intensity.shape[1])
    sampled = warp_and_sample_cm(
        refpack, quad, ref.intensity.shape, K, jnp.asarray(T, jnp.float32)
    )  # [8, N]
    return sel, accel, sampled, refpack


@pytest.mark.parametrize("first_iter", [1, 0])
def test_fused_xla_matches_modular_path(first_iter):
    ref, cur, T = _level_pair([0.01, 0.0, 0.005, 0.0, 0.0, 0.004])
    sel, accel, sampled, refpack = _fused_inputs(ref, cur, T)
    P_prev = jnp.asarray([[3000.0, 50.0], [50.0, 2.0e5]], jnp.float32)
    p3 = jnp.asarray([P_prev[0, 0], P_prev[0, 1], P_prev[1, 1]])

    parts = pallas_kernels.fused_partials_xla(
        sampled, refpack, p3, jnp.asarray(first_iter, jnp.int32), K
    )

    # modular oracle
    rd = compute_residuals(
        ref.intensity, ref.depth, ref.idx, ref.idy, sel, accel, K,
        jnp.asarray(T, jnp.float32),
    )
    w_oracle = (
        rd.mask.astype(jnp.float32)
        if first_iter
        else robust.tdist_weights(rd.residuals, P_prev, rd.mask)
    )

    assert int(parts.num_valid) == int(rd.num_valid) > 2000
    np.testing.assert_allclose(
        np.asarray(parts.residuals).T, np.asarray(rd.residuals), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(parts.weights), np.asarray(w_oracle), rtol=2e-4, atol=1e-6
    )

    # normal equations for an arbitrary new precision
    P_new = jnp.asarray([[5000.0, -30.0], [-30.0, 1.0e5]], jnp.float32)
    A_f, b_f = pallas_kernels.assemble_normal_equations(parts, P_new)
    A_o, b_o = normal_equations(rd, w_oracle, P_new)
    np.testing.assert_allclose(np.asarray(A_f), np.asarray(A_o), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(b_f), np.asarray(b_o), rtol=2e-3, atol=1e-2)

    # scale matrix numerator
    S_f = np.asarray(pallas_kernels.scale_matrix(parts))
    S_o = np.asarray(
        robust.tdist_scale(rd.residuals, w_oracle, rd.num_valid)
    ) * max(int(rd.num_valid) - 3, 1)
    np.testing.assert_allclose(S_f, S_o, rtol=2e-3, atol=1e-7)


def test_pallas_interpret_matches_xla_twin():
    ref, cur, T = _level_pair([0.008, -0.004, 0.0, 0.002, 0.0, -0.003], seed=3)
    _, _, sampled, refpack = _fused_inputs(ref, cur, T)
    p3 = jnp.asarray([4000.0, 10.0, 1.5e5], jnp.float32)
    first = jnp.asarray(0, jnp.int32)

    parts_x = pallas_kernels.fused_partials_xla(sampled, refpack, p3, first, K)
    parts_p = pallas_kernels.fused_partials_pallas(
        sampled, refpack, p3, first, K, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(parts_p.num_valid), np.asarray(parts_x.num_valid)
    )
    np.testing.assert_allclose(
        np.asarray(parts_p.residuals), np.asarray(parts_x.residuals), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(parts_p.weights), np.asarray(parts_x.weights), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(np.asarray(parts_p.m00), np.asarray(parts_x.m00), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(parts_p.m01), np.asarray(parts_x.m01), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(parts_p.m11), np.asarray(parts_x.m11), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(parts_p.v), np.asarray(parts_x.v), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(parts_p.scale_sum), np.asarray(parts_x.scale_sum), rtol=1e-4
    )


@pytest.mark.slow
def test_fused_match_recovers_motion():
    """End-to-end: the fused backend must track as well as the oracle."""
    import dataclasses

    twist = [0.01, -0.008, 0.012, 0.004, -0.005, 0.006]
    T_gt = np.asarray(se3.exp_se3(jnp.asarray(twist, jnp.float64)), np.float64)
    cfg_x = TrackerConfig(
        first_level=1, last_level=0, max_iterations_per_level=30, kernel_backend="xla"
    )
    cfg_f = dataclasses.replace(cfg_x, kernel_backend="fused")

    i0, d0, v0 = synthetic.render_frame(np.eye(4), K, SHAPE, seed=5, depth_noise=0.002)
    i1, d1, v1 = synthetic.render_frame(T_gt, K, SHAPE, seed=5, depth_noise=0.002)
    ref = build_pyramid(jnp.asarray(i0), jnp.asarray(d0), jnp.asarray(v0), 2)
    cur = build_pyramid(jnp.asarray(i1), jnp.asarray(d1), jnp.asarray(v1), 2)

    for cfg in (cfg_x, cfg_f):
        res = match_pyramids(cfg, K, ref, cur)
        est = np.asarray(res.transformation, np.float64)
        err = np.asarray(
            se3.log_se3(jnp.asarray(np.linalg.inv(T_gt) @ est, jnp.float32))
        )
        assert np.abs(err).max() < 5e-3, (cfg.kernel_backend, err)


def test_fused_stats_matches_partials_path():
    """The two-pass no-writeback kernel (FusedStats) must agree with the
    partials+host-LL path: same Gram sums, and its in-kernel precision +
    log1p sum reproduce the host-computed log-likelihood exactly."""
    ref, cur, T = _level_pair([0.009, -0.003, 0.004, 0.002, 0.001, -0.002], seed=4)
    _, _, sampled, refpack = _fused_inputs(ref, cur, T)
    p3 = jnp.asarray([4000.0, 10.0, 1.5e5], jnp.float32)
    first = jnp.asarray(0, jnp.int32)

    parts = pallas_kernels.fused_partials_xla(sampled, refpack, p3, first, K)
    stats_x = pallas_kernels.fused_stats_xla(sampled, refpack, p3, first, K)
    stats_p = pallas_kernels.fused_stats_pallas(
        sampled, refpack, p3, first, K, interpret=True
    )

    for a, b in ((stats_x, parts), (stats_p, parts)):
        np.testing.assert_allclose(np.asarray(a.m00), np.asarray(b.m00), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(a.m11), np.asarray(b.m11), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(a.v), np.asarray(b.v), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(a.scale_sum), np.asarray(b.scale_sum), rtol=1e-4
        )
        np.testing.assert_allclose(np.asarray(a.num_valid), np.asarray(b.num_valid))

    # the in-kernel LL equals the host LL computed from the partials
    denom = max(float(parts.num_valid) - 3.0, 1.0)
    precision_new = robust.precision_from_scale(
        pallas_kernels.scale_matrix(parts) / denom
    )
    ll_host = robust.tdist_log_likelihood_cm(
        parts.residuals, precision_new, parts.weights > 0, 5.0
    )
    dof = 5.0
    det = float(precision_new[0, 0] * precision_new[1, 1] - precision_new[0, 1] ** 2)
    for stats in (stats_x, stats_p):
        ll = 0.5 * float(stats.num_valid) * np.log(det) - 0.5 * (dof + 2.0) * float(
            stats.log_sum
        )
        np.testing.assert_allclose(ll, float(ll_host), rtol=1e-5)
