"""Robust weighting statistics for the bivariate (r_I, r_Z) residuals.

TPU-native replacement of the reference's WeightCalculation strategy
hierarchy (dvo_core/src/core/weight_calculation.cpp) plus the fused
t-distribution kernels in dense_tracking_impl.cpp:406-735.  The reference
parallelizes the scale estimation with TBB `parallel_reduce`
(weight_calculation.cpp:84-193); here the reductions are masked sums that
XLA vectorizes on the VPU and, under pjit, turn into psum across shards
(P3 in SURVEY.md section 2.5).

Default configuration is the bivariate t-distribution with nu = 5
(dense_tracking_config.cpp:27-42); the univariate influence functions
(Tukey, Huber) and scale estimators (normal, MAD) are provided for config
parity with the reference registry (weight_calculation.cpp:255-416).
"""

from __future__ import annotations

import jax.numpy as jnp

TDIST_DOF = 5.0  # TDistributionScaleEstimator::DEFAULT_DOF

# Variance floors for the 2x2 residual scale matrix before inversion.
# Residual channels are (intensity/255, meters); real sensors never produce
# std below ~0.05/255 gray levels or ~0.1 mm depth, so these floors are
# inert on real data while keeping the float32 inversion well-conditioned
# when synthetic/near-perfect inputs drive a variance toward zero (the
# reference inverts in double and never hits this, dense_tracking.cpp:297).
SIGMA_FLOOR_INTENSITY = (0.05 / 255.0) ** 2
SIGMA_FLOOR_DEPTH = 1e-4**2


def precision_from_scale(sigma):
    """Invert the 2x2 scale matrix with variance floors and explicit
    adjugate formula (safe in float32 where generic LU can cancel)."""
    floors = jnp.asarray(
        [SIGMA_FLOOR_INTENSITY, SIGMA_FLOOR_DEPTH], dtype=sigma.dtype
    )
    s = sigma + jnp.diag(floors)
    det = s[0, 0] * s[1, 1] - s[0, 1] * s[1, 0]
    det = jnp.maximum(det, jnp.asarray(1e-30, sigma.dtype))
    inv = jnp.array(
        [[s[1, 1], -s[0, 1]], [-s[1, 0], s[0, 0]]], dtype=sigma.dtype
    )
    return inv / det


def mahalanobis_sq(residuals, precision, mean=None):
    """Per-residual squared Mahalanobis distance r^T P r ([N, 2] -> [N])."""
    if mean is not None:
        residuals = residuals - mean
    return jnp.einsum("ni,ij,nj->n", residuals, precision, residuals)


def tdist_weights(residuals, precision, mask, dof: float = TDIST_DOF):
    """IRLS weights w = (dof + 2) / (dof + r^T P r) of the bivariate
    t-distribution (reference: computeWeights,
    dense_tracking_impl.cpp:640-707; mean is fixed at zero there)."""
    d2 = mahalanobis_sq(residuals, precision)
    w = (dof + 2.0) / (dof + d2)
    return jnp.where(mask, w, 0.0)


def tdist_scale(residuals, weights, num_valid, dof: float = TDIST_DOF):
    """Weighted 2x2 scale matrix Sigma = 1/(n-3) sum_i w_i r_i r_i^T.

    Matches computeScale (dense_tracking_impl.cpp:574-588) including its
    1/(n - 2 - 1) normalization and zero mean.  Masked residuals are
    already zeroed, so the plain sum is the masked sum.
    """
    outer = jnp.einsum("ni,nj->ij", residuals * weights[:, None], residuals)
    denom = jnp.maximum(num_valid.astype(residuals.dtype) - 3.0, 1.0)
    return outer / denom


def tdist_log_likelihood(residuals, precision, mask, dof: float = TDIST_DOF):
    """Complete-data log-likelihood of the t-distribution fit:
      0.5 n log det(P) - 0.5 (dof + 2) sum_i log(1 + r^T P r / dof)

    Matches computeCompleteDataLogLikelihood
    (dense_tracking_impl.cpp:406-425) with exact log1p summation instead of
    the reference's blocked running product (which silently drops the tail
    block of up to 49 residuals — behavioral fix, not replicated).
    """
    n = mask.sum(dtype=residuals.dtype)
    d2 = mahalanobis_sq(residuals, precision)
    log_terms = jnp.where(mask, jnp.log1p(d2 / dof), 0.0)
    # closed-form 2x2 log-determinant: precision is SPD by construction, so
    # det > 0 — avoids the slogdet LU custom call inside the solver loop
    det = precision[0, 0] * precision[1, 1] - precision[0, 1] * precision[1, 0]
    logdet = jnp.log(jnp.maximum(det, jnp.asarray(1e-38, residuals.dtype)))
    return 0.5 * n * logdet - 0.5 * (dof + 2.0) * jnp.sum(log_terms)


def tdist_log_likelihood_cm(residuals_cm, precision, mask, dof: float = TDIST_DOF):
    """Channel-major twin of :func:`tdist_log_likelihood`: residuals are
    [2, N] (r_I, r_Z rows) so the quadratic form stays pixels-on-lanes."""
    r_i, r_z = residuals_cm[0], residuals_cm[1]
    p00, p01, p11 = precision[0, 0], precision[0, 1], precision[1, 1]
    d2 = r_i * (p00 * r_i + p01 * r_z) + r_z * (p01 * r_i + p11 * r_z)
    n = mask.sum(dtype=r_i.dtype)
    log_terms = jnp.where(mask, jnp.log1p(d2 / dof), 0.0)
    det = p00 * p11 - p01 * p01
    logdet = jnp.log(jnp.maximum(det, jnp.asarray(1e-38, r_i.dtype)))
    return 0.5 * n * logdet - 0.5 * (dof + 2.0) * jnp.sum(log_terms)


def tdist_fixed_point(residuals, mask, num_iters: int = 10, dof: float = TDIST_DOF):
    """Standalone fixed-point iteration for the t-distribution scale
    (reference: TDistributionScaleEstimator::compute,
    weight_calculation.cpp:48-82).  The tracker itself interleaves one
    fixed-point step per Gauss-Newton iteration instead (the weight-lag
    scheme, dense_tracking.cpp:286-301); this full iteration serves the
    standalone WeightCalculation API."""
    num_valid = mask.sum(dtype=jnp.int32)
    sigma = jnp.eye(2, dtype=residuals.dtype)
    for _ in range(num_iters):
        precision = precision_from_scale(sigma)
        w = tdist_weights(residuals, precision, mask, dof)
        sigma = tdist_scale(residuals, w, num_valid, dof)
    return sigma


# ---------------------------------------------------------------------------
# Univariate strategy registry (config parity with the reference).
# ---------------------------------------------------------------------------


def huber_weights(x, k: float = 1.345):
    """Huber influence (reference: weight_calculation.cpp:347-371)."""
    ax = jnp.abs(x)
    return jnp.where(ax < k, 1.0, k / jnp.maximum(ax, 1e-12))


def tukey_weights(x, b: float = 4.685):
    """Tukey biweight (reference: weight_calculation.cpp:300-326)."""
    ax = jnp.abs(x)
    t = 1.0 - (ax / b) ** 2
    return jnp.where(ax <= b, t * t, 0.0)


def tdist_weights_1d(x, dof: float = TDIST_DOF):
    """Univariate t-distribution influence
    (reference: weight_calculation.cpp:328-345)."""
    return (dof + 1.0) / (dof + x * x)


def normal_scale(x, mask):
    """Unbiased std estimate (reference NormalDistributionScaleEstimator,
    weight_calculation.cpp:36-46)."""
    n = jnp.maximum(mask.sum(dtype=x.dtype), 2.0)
    mean = jnp.sum(jnp.where(mask, x, 0.0)) / n
    var = jnp.sum(jnp.where(mask, (x - mean) ** 2, 0.0)) / (n - 1.0)
    return jnp.sqrt(var)


def mad_scale(x, mask):
    """Median absolute deviation scaled for normal consistency
    (reference MADScaleEstimator, weight_calculation.cpp:195-217; the
    reference approximates the median via histogram —
    util/histogram.cpp:28-99 — where XLA's exact sort is cheap)."""
    big = jnp.asarray(jnp.inf, x.dtype)
    n = mask.sum()
    med = _masked_median(jnp.where(mask, x, big), n)
    abs_dev = jnp.where(mask, jnp.abs(x - med), big)
    return 1.4826 * _masked_median(abs_dev, n)


def _masked_median(x, n):
    """Median of the n smallest entries (invalid entries pushed to +inf)."""
    s = jnp.sort(x.reshape(-1))
    idx = jnp.maximum(n // 2, 0)
    return s[jnp.clip(idx, 0, s.shape[0] - 1)]
