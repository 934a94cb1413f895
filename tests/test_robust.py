"""Robust-statistics kernel tests against NumPy oracles
(the reference's scalar kernels, dense_tracking_impl.cpp:406-735)."""

import numpy as np
import jax.numpy as jnp

from dvo_slam_tpu.ops import robust


def _residuals(n=256, seed=0, outliers=0.1):
    rng = np.random.default_rng(seed)
    r = rng.normal(0, 0.05, (n, 2))
    m = rng.random(n) < outliers
    r[m] += rng.normal(0, 1.0, (m.sum(), 2))
    mask = rng.random(n) > 0.2
    r[~mask] = 0.0
    return r.astype(np.float32), mask


def test_tdist_weights_oracle():
    r, mask = _residuals()
    P = np.array([[30.0, 2.0], [2.0, 50.0]], np.float32)
    w = np.asarray(robust.tdist_weights(jnp.asarray(r), jnp.asarray(P), jnp.asarray(mask)))
    for i in range(len(r)):
        if mask[i]:
            expected = 7.0 / (5.0 + r[i] @ P @ r[i])
            np.testing.assert_allclose(w[i], expected, rtol=1e-5)
        else:
            assert w[i] == 0.0


def test_tdist_scale_oracle():
    r, mask = _residuals(seed=1)
    w = np.where(mask, 0.5, 0.0).astype(np.float32)
    n = mask.sum()
    sigma = np.asarray(
        robust.tdist_scale(jnp.asarray(r), jnp.asarray(w), jnp.asarray(n))
    )
    expected = np.zeros((2, 2))
    for i in range(len(r)):
        expected += w[i] * np.outer(r[i], r[i])
    expected /= n - 3
    np.testing.assert_allclose(sigma, expected, rtol=1e-4, atol=1e-8)


def test_tdist_log_likelihood_oracle():
    r, mask = _residuals(seed=2)
    P = np.array([[40.0, 1.0], [1.0, 60.0]], np.float32)
    ll = float(
        robust.tdist_log_likelihood(jnp.asarray(r), jnp.asarray(P), jnp.asarray(mask))
    )
    n = mask.sum()
    s = sum(np.log1p(0.2 * (r[i] @ P @ r[i])) for i in range(len(r)) if mask[i])
    expected = 0.5 * n * np.log(np.linalg.det(P)) - 0.5 * 7.0 * s
    np.testing.assert_allclose(ll, expected, rtol=1e-4)


def test_tdist_fixed_point_converges():
    """The fixed-point scale estimate should roughly recover the inlier
    covariance under heavy outlier contamination."""
    rng = np.random.default_rng(3)
    n = 4096
    r = rng.normal(0, 0.1, (n, 2))
    out = rng.random(n) < 0.2
    r[out] = rng.normal(0, 2.0, (out.sum(), 2))
    mask = np.ones(n, bool)
    sigma = np.asarray(
        robust.tdist_fixed_point(jnp.asarray(r, dtype=jnp.float32), jnp.asarray(mask))
    )
    # robust scale should stay near the inlier variance (0.01), far below
    # the contaminated sample variance (~0.8)
    assert 0.005 < sigma[0, 0] < 0.05
    assert 0.005 < sigma[1, 1] < 0.05


def test_huber_tukey_shapes():
    x = jnp.asarray(np.linspace(-10, 10, 101), dtype=jnp.float32)
    hw = np.asarray(robust.huber_weights(x))
    tw = np.asarray(robust.tukey_weights(x))
    assert hw.max() <= 1.0 and hw.min() > 0.0
    assert tw[0] == 0.0 and tw[50] == 1.0  # beyond b -> 0, at 0 -> 1
    # Huber: w = 1 inside the corner, k/|x| outside
    np.testing.assert_allclose(hw[50], 1.0)
    np.testing.assert_allclose(hw[0], 1.345 / 10.0, rtol=1e-5)


def test_mad_scale_oracle():
    rng = np.random.default_rng(4)
    x = rng.normal(0, 2.0, 1001).astype(np.float32)
    mask = np.ones_like(x, bool)
    got = float(robust.mad_scale(jnp.asarray(x), jnp.asarray(mask)))
    med = np.median(x)
    expected = 1.4826 * np.median(np.abs(x - med))
    np.testing.assert_allclose(got, expected, rtol=0.02)


def test_normal_scale_oracle():
    rng = np.random.default_rng(5)
    x = rng.normal(1.0, 3.0, 2000).astype(np.float32)
    mask = np.ones_like(x, bool)
    got = float(robust.normal_scale(jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(got, x.std(ddof=1), rtol=1e-3)
