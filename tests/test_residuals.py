"""Residual/Jacobian kernel tests: bilinear sampling oracle, analytic
Jacobians vs finite differences, masked normal-equation assembly."""

import numpy as np
import jax.numpy as jnp

from dvo_slam_tpu.ops import pyramid, se3
from dvo_slam_tpu.ops.camera import Intrinsics, project, unproject
from dvo_slam_tpu.ops.interp import bilinear_sample_accel
from dvo_slam_tpu.ops.residuals import (
    compute_residuals,
    depth_stddev,
    normal_equations,
    projection_jacobian,
    transform_z_jacobian,
)


def test_bilinear_matches_scipy():
    from scipy.ndimage import map_coordinates

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (24, 32)).astype(np.float32)
    level = pyramid.make_level(
        jnp.asarray(img),
        jnp.asarray(np.full(img.shape, 2.0, np.float32)),
        jnp.ones(img.shape, bool),
    )
    accel = pyramid.build_acceleration(level)
    u = rng.uniform(0.0, 30.9, 100).astype(np.float32)
    v = rng.uniform(0.0, 22.9, 100).astype(np.float32)
    values, valid = bilinear_sample_accel(accel, jnp.asarray(u), jnp.asarray(v))
    expected = map_coordinates(img, np.stack([v, u]), order=1)
    np.testing.assert_allclose(np.asarray(values)[:, 0], expected, atol=1e-3)
    assert np.asarray(valid).all()


def test_bilinear_validity_poisons_all_four_neighbors():
    img = np.ones((8, 8), np.float32)
    depth = np.full((8, 8), 2.0, np.float32)
    valid = np.ones((8, 8), bool)
    valid[4, 4] = False  # one invalid depth pixel
    level = pyramid.make_level(jnp.asarray(img), jnp.asarray(depth), jnp.asarray(valid))
    accel = pyramid.build_acceleration(level)
    # Sampling inside the 2x2 cell that touches (4,4) must be invalid even
    # with tiny weight on the bad corner (NaN*0 semantics of the reference).
    _, ok = bilinear_sample_accel(
        accel, jnp.asarray([3.05, 1.0]), jnp.asarray([3.05, 1.0])
    )
    assert not bool(ok[0])
    # derivative support of the invalid pixel also poisons neighbors
    _, ok2 = bilinear_sample_accel(accel, jnp.asarray([1.0]), jnp.asarray([1.0]))
    assert bool(ok2[0])


def test_bilinear_out_of_bounds():
    img = np.ones((8, 8), np.float32)
    level = pyramid.make_level(
        jnp.asarray(img),
        jnp.asarray(np.full((8, 8), 2.0, np.float32)),
        jnp.ones((8, 8), bool),
    )
    accel = pyramid.build_acceleration(level)
    u = jnp.asarray([-0.5, 7.5, 3.0, 6.999])
    v = jnp.asarray([3.0, 3.0, 7.2, 6.5])
    _, ok = bilinear_sample_accel(accel, u, v)
    assert list(np.asarray(ok)) == [False, False, False, True]


def _np_exp_se3(xi):
    """Float64 NumPy exp for finite differencing (centered FD at 0 makes the
    axis-angle rotation + direct translation exact to O(eps^2))."""
    from dvo_slam_tpu.utils.synthetic import _pose_from_rt

    return _pose_from_rt(np.asarray(xi[3:], np.float64), np.asarray(xi[:3], np.float64))


def test_quad_table_matches_accel_sampling():
    """One-gather quad-table sampling must equal the four-gather path."""
    from dvo_slam_tpu.ops.interp import build_quad_table, bilinear_sample_quad

    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (24, 32)).astype(np.float32)
    depth = rng.uniform(0.5, 3.0, (24, 32)).astype(np.float32)
    valid = rng.random((24, 32)) > 0.1
    level = pyramid.make_level(
        jnp.asarray(img), jnp.asarray(np.where(valid, depth, 0).astype(np.float32)),
        jnp.asarray(valid),
    )
    accel = pyramid.build_acceleration(level)
    quad = build_quad_table(accel)
    u = jnp.asarray(rng.uniform(-2.0, 33.0, 300).astype(np.float32))
    v = jnp.asarray(rng.uniform(-2.0, 25.0, 300).astype(np.float32))
    vals_a, ok_a = bilinear_sample_accel(accel, u, v)
    vals_q, ok_q = bilinear_sample_quad(quad, (24, 32), u, v)
    np.testing.assert_array_equal(np.asarray(ok_a), np.asarray(ok_q))
    ok = np.asarray(ok_a)
    np.testing.assert_allclose(
        np.asarray(vals_q)[ok], np.asarray(vals_a)[ok], atol=1e-5
    )


def test_projection_jacobian_finite_difference():
    """Jw must equal d(project(exp(xi) p))/dxi at xi=0 in unit-focal coords."""
    rng = np.random.default_rng(1)
    pts = rng.uniform([-1, -1, 0.5], [1, 1, 4.0], (20, 3))
    J = np.asarray(projection_jacobian(jnp.asarray(pts, jnp.float32)))
    eps = 1e-6
    for n, p in enumerate(pts):
        for i in range(6):
            xi = np.zeros(6)
            xi[i] = eps
            Tp, Tm = _np_exp_se3(xi), _np_exp_se3(-xi)
            pp = Tp[:3, :3] @ p + Tp[:3, 3]
            pm = Tm[:3, :3] @ p + Tm[:3, 3]
            fd = (pp[:2] / pp[2] - pm[:2] / pm[2]) / (2 * eps)
            np.testing.assert_allclose(J[n, :, i], fd, rtol=1e-3, atol=1e-5)


def test_transform_z_jacobian_finite_difference():
    rng = np.random.default_rng(2)
    pts = rng.uniform([-1, -1, 0.5], [1, 1, 4.0], (10, 3))
    Jz = np.asarray(transform_z_jacobian(jnp.asarray(pts, jnp.float32)))
    eps = 1e-6
    for n, p in enumerate(pts):
        for i in range(6):
            xi = np.zeros(6)
            xi[i] = eps
            Tp, Tm = _np_exp_se3(xi), _np_exp_se3(-xi)
            zp = (Tp[:3, :3] @ p + Tp[:3, 3])[2]
            zm = (Tm[:3, :3] @ p + Tm[:3, 3])[2]
            fd = (zp - zm) / (2 * eps)
            np.testing.assert_allclose(Jz[n, i], fd, rtol=1e-3, atol=1e-6)


def test_depth_stddev_kinect_model():
    assert depth_stddev(0.4) == np.float32(0.0012)
    np.testing.assert_allclose(depth_stddev(1.4), 0.0012 + 0.0019, rtol=1e-6)


def _make_pair(seed=3):
    from dvo_slam_tpu.utils import synthetic

    k = Intrinsics(80.0, 80.0, 39.5, 29.5)
    T = np.eye(4)
    i0, d0, v0 = synthetic.render_frame(T, k, (60, 80), seed=seed)
    return k, (i0, d0, v0)


def test_identity_residuals_are_zero():
    """Same frame, identity transform -> residuals ~ 0 everywhere valid."""
    k, (i0, d0, v0) = _make_pair()
    ref = pyramid.make_level(jnp.asarray(i0), jnp.asarray(d0), jnp.asarray(v0))
    accel = pyramid.build_acceleration(ref)
    sel = pyramid.selection_mask(ref)
    rd = compute_residuals(
        ref.intensity,
        ref.depth,
        ref.idx,
        ref.idy,
        sel,
        accel,
        k,
        jnp.eye(4),
    )
    n = int(rd.num_valid)
    assert n > 3000
    r = np.asarray(rd.residuals)
    np.testing.assert_allclose(r, 0.0, atol=1e-3)


def test_residual_unproject_reproject_consistency():
    k, (i0, d0, v0) = _make_pair()
    pts = unproject(jnp.asarray(d0), k)
    uv = np.asarray(project(pts.reshape(-1, 3), k)).reshape(60, 80, 2)
    uu, vv = np.meshgrid(np.arange(80), np.arange(60))
    np.testing.assert_allclose(uv[..., 0], uu, atol=1e-3)
    np.testing.assert_allclose(uv[..., 1], vv, atol=1e-3)


def test_normal_equations_oracle():
    rng = np.random.default_rng(4)
    n = 64
    J = rng.normal(size=(n, 2, 6)).astype(np.float32)
    r = rng.normal(size=(n, 2)).astype(np.float32)
    mask = rng.random(n) > 0.3
    J[~mask] = 0.0
    r[~mask] = 0.0
    w = np.where(mask, rng.uniform(0.1, 1.0, n), 0.0).astype(np.float32)
    P = np.array([[2.0, 0.3], [0.3, 1.5]], np.float32)

    from dvo_slam_tpu.ops.residuals import ResidualData

    rd = ResidualData(
        residuals=jnp.asarray(r),
        jacobian=jnp.asarray(J),
        mask=jnp.asarray(mask),
        num_valid=jnp.asarray(mask.sum(), jnp.int32),
    )
    A, b = normal_equations(rd, jnp.asarray(w), jnp.asarray(P))

    A_ref = np.zeros((6, 6))
    b_ref = np.zeros(6)
    for i in range(n):
        A_ref += w[i] * J[i].T @ P @ J[i]
        b_ref -= w[i] * J[i].T @ P @ r[i]
    np.testing.assert_allclose(np.asarray(A), A_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b), b_ref, rtol=1e-4, atol=1e-4)


def test_least_squares_solver_registry():
    """solve_ldlt / solve_evd / solve_svd agree on a well-posed system;
    solve_evd drops the null direction of a rank-deficient one; combine
    merges partial accumulations exactly (the reference's
    NormalEquationsLeastSquares/Evd/Svd + combine, least_squares.cpp)."""
    from dvo_slam_tpu.ops import least_squares as ls

    rng = np.random.default_rng(1)
    J = rng.standard_normal((40, 6)).astype(np.float32)
    x_true = rng.standard_normal(6).astype(np.float32)
    r = (-J @ x_true).astype(np.float32)
    A = jnp.asarray(J.T @ J)
    b = jnp.asarray(-J.T @ r)

    for solver in (ls.solve_ldlt, ls.solve_evd):
        x = np.asarray(solver(A, b))
        np.testing.assert_allclose(x, x_true, rtol=1e-3, atol=1e-3)
    x = np.asarray(ls.solve_svd(jnp.asarray(J), jnp.asarray(r)))
    np.testing.assert_allclose(x, x_true, rtol=1e-3, atol=1e-3)

    # rank-deficient: last twist direction unobserved
    J5 = J.copy()
    J5[:, 5] = 0.0
    A5 = jnp.asarray(J5.T @ J5)
    b5 = jnp.asarray(J5.T @ J5 @ x_true)
    x5 = np.asarray(ls.solve_evd(A5, b5))
    np.testing.assert_allclose(x5[:5], x_true[:5], rtol=1e-3, atol=1e-3)
    assert abs(x5[5]) < 1e-4  # truncated, not amplified

    # partial-sum combine
    half = ls.NormalEquations(
        A=A / 2, b=b / 2, error=jnp.asarray(1.5), num_constraints=jnp.asarray(20)
    )
    merged = ls.combine(half, half)
    np.testing.assert_allclose(np.asarray(merged.A), np.asarray(A), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(merged.b), np.asarray(b), rtol=1e-6)
    assert float(merged.error) == 3.0 and int(merged.num_constraints) == 40
