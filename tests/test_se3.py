"""SE(3) op tests: exp/log roundtrips, group laws, analytic cross-checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvo_slam_tpu.ops import se3


def random_twists(n, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(0.0, scale, (n, 6)).astype(np.float64)


def test_exp_identity():
    T = se3.exp_se3(jnp.zeros(6))
    np.testing.assert_allclose(T, np.eye(4), atol=1e-7)


def test_exp_log_roundtrip():
    xis = random_twists(50, scale=0.5)
    T = se3.exp_se3(jnp.asarray(xis))
    back = se3.log_se3(T)
    np.testing.assert_allclose(back, xis, rtol=1e-4, atol=1e-5)


def test_exp_log_roundtrip_small_angles():
    xis = random_twists(20, scale=1e-6, seed=1)
    back = se3.log_se3(se3.exp_se3(jnp.asarray(xis)))
    np.testing.assert_allclose(back, xis, rtol=1e-3, atol=1e-10)


def test_exp_matches_scipy_rotation():
    from scipy.spatial.transform import Rotation

    xis = random_twists(20, scale=0.8, seed=2)
    T = np.asarray(se3.exp_se3(jnp.asarray(xis)))
    for xi, Ti in zip(xis, T):
        R_ref = Rotation.from_rotvec(xi[3:]).as_matrix()
        np.testing.assert_allclose(Ti[:3, :3], R_ref, atol=1e-6)


def test_pure_translation():
    xi = jnp.asarray([0.1, -0.2, 0.3, 0.0, 0.0, 0.0], dtype=jnp.float64)
    T = se3.exp_se3(xi)
    np.testing.assert_allclose(T[:3, 3], [0.1, -0.2, 0.3], atol=1e-9)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-9)


def test_inverse():
    xis = random_twists(10, scale=0.5, seed=3)
    T = se3.exp_se3(jnp.asarray(xis))
    eye = np.broadcast_to(np.eye(4), T.shape)
    np.testing.assert_allclose(T @ se3.inverse(T), eye, atol=1e-6)


def test_rotation_orthonormal():
    xis = random_twists(10, scale=1.5, seed=4)
    T = np.asarray(se3.exp_se3(jnp.asarray(xis)))
    for Ti in T:
        R = Ti[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-6)


def test_adjoint_conjugation_identity():
    """T exp(xi) T^{-1} == exp(Ad(T) xi)."""
    rng = np.random.default_rng(5)
    T = se3.exp_se3(jnp.asarray(rng.normal(0, 0.5, 6)))
    xi = jnp.asarray(rng.normal(0, 0.1, 6))
    lhs = T @ se3.exp_se3(xi) @ se3.inverse(T)
    rhs = se3.exp_se3(se3.adjoint(T) @ xi)
    np.testing.assert_allclose(lhs, rhs, atol=1e-6)


def test_transform_points():
    rng = np.random.default_rng(6)
    T = np.asarray(se3.exp_se3(jnp.asarray(rng.normal(0, 0.5, 6))))
    pts = rng.normal(0, 1.0, (7, 3))
    expected = pts @ T[:3, :3].T + T[:3, 3]
    got = se3.transform_points(jnp.asarray(T), jnp.asarray(pts))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_jit_and_vmap():
    xis = jnp.asarray(random_twists(8, scale=0.3, seed=7), dtype=jnp.float32)
    batched = jax.jit(jax.vmap(se3.exp_se3))(xis)
    single = np.stack([np.asarray(se3.exp_se3(x)) for x in xis])
    np.testing.assert_allclose(batched, single, atol=1e-6)
