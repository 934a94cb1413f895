"""SE(3) Lie-group operations in JAX.

TPU-native replacement for the reference's Sophus dependency
(reference: dvo_core uses Sophus::SE3d for the incremental estimate,
e.g. dvo_core/src/dense_tracking.cpp:259-261, and sophus/ is a download
wrapper package).  Everything here is pure-functional, dtype-polymorphic
(float32 on device, float64 for host-side graph math when x64 is enabled),
`jit`/`vmap`/`grad`-compatible, and free of data-dependent control flow —
small-angle cases are handled with `jnp.where` on Taylor expansions so the
same compiled code serves all inputs.

Twist convention matches Sophus: ``xi = [v, w]`` with translation ``v``
first and rotation ``w = (wx, wy, wz)`` last.  Poses are 4x4 homogeneous
matrices.
"""

from __future__ import annotations

import jax.numpy as jnp

# Below this squared angle (theta < 0.1 rad), use Taylor expansions of the
# exp/log coefficient functions.  The threshold is deliberately large: the
# two-term Taylor truncation error at theta = 0.1 is ~1e-8, below float32
# eps, while the closed forms lose catastrophically in float32 well above
# the usual 1e-8-style guards (1 - cos(1e-4) rounds to exactly 0).
_SMALL_ANGLE_SQ = 1e-2


def hat_so3(w):
    """3-vector -> skew-symmetric matrix, so that hat(w) @ x == cross(w, x)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee_so3(W):
    """Inverse of :func:`hat_so3`."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _exp_coefficients(theta_sq):
    """Return (A, B, C) with R = I + A*what + B*what^2 and
    V = I + B*what + C*what^2, float32-stable at every angle.

    B uses the half-angle identity 1 - cos(t) = 2 sin^2(t/2) (no
    cancellation); A and C switch to two-term Taylor below theta = 0.1
    where their closed forms cancel.
    """
    safe = jnp.maximum(theta_sq, _SMALL_ANGLE_SQ)
    theta = jnp.sqrt(safe)
    small = theta_sq < _SMALL_ANGLE_SQ
    a = jnp.where(small, 1.0 - theta_sq / 6.0 + theta_sq * theta_sq / 120.0,
                  jnp.sin(theta) / theta)
    half = 0.5 * jnp.sqrt(theta_sq)
    sin_half = jnp.sin(half)
    b = jnp.where(
        theta_sq < 1e-12,
        0.5 - theta_sq / 24.0,
        2.0 * sin_half * sin_half / jnp.maximum(theta_sq, 1e-12),
    )
    c = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (1.0 - a) / safe)
    return a, b, c


def exp_so3(w):
    """Rodrigues' formula: rotation vector -> rotation matrix."""
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, _ = _exp_coefficients(theta_sq)
    what = hat_so3(w)
    what_sq = what @ what
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + a[..., None, None] * what + b[..., None, None] * what_sq


def log_so3(R):
    """Rotation matrix -> rotation vector.

    theta is recovered via atan2(|skew(R)|/2, (tr-1)/2), which is well
    conditioned at small angles where arccos alone loses half the mantissa
    (important: the float32 device path must round-trip exp/log to ~1e-6).
    Accurate for rotations away from pi; tracking increments and pose-graph
    residuals in this system are well inside that regime.
    """
    skew = 0.5 * (R - jnp.swapaxes(R, -1, -2))
    w_raw = vee_so3(skew)  # norm == sin(theta)
    sin_theta = jnp.sqrt(jnp.sum(w_raw * w_raw, axis=-1))
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = 0.5 * (trace - 1.0)
    theta = jnp.arctan2(sin_theta, cos_theta)
    theta_sq = theta * theta
    # theta / sin(theta), Taylor-guarded near 0; clamped near pi where this
    # parametrization is singular.
    small = theta_sq < _SMALL_ANGLE_SQ
    factor = jnp.where(
        small,
        1.0 + theta_sq / 6.0,
        theta / jnp.maximum(sin_theta, 1e-12),
    )
    return factor[..., None] * w_raw


def exp_se3(xi):
    """Twist [v, w] -> 4x4 homogeneous transform (Sophus::SE3::exp)."""
    v, w = xi[..., :3], xi[..., 3:]
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, c = _exp_coefficients(theta_sq)
    what = hat_so3(w)
    what_sq = what @ what
    eye = jnp.eye(3, dtype=xi.dtype)
    R = eye + a[..., None, None] * what + b[..., None, None] * what_sq
    V = eye + b[..., None, None] * what + c[..., None, None] * what_sq
    t = jnp.einsum("...ij,...j->...i", V, v)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype),
        top.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def log_se3(T):
    """4x4 homogeneous transform -> twist [v, w] (Sophus::SE3::log)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = log_so3(R)
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, _ = _exp_coefficients(theta_sq)
    safe = jnp.maximum(theta_sq, _SMALL_ANGLE_SQ)
    small = theta_sq < _SMALL_ANGLE_SQ
    # V^{-1} = I - what/2 + d * what^2,  d = (1 - a/(2b)) / theta^2;
    # the closed form cancels below theta = 0.1, use two-term Taylor there.
    d = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0, (1.0 - a / (2.0 * b)) / safe)
    what = hat_so3(w)
    what_sq = what @ what
    eye = jnp.eye(3, dtype=T.dtype)
    V_inv = eye - 0.5 * what + d[..., None, None] * what_sq
    v = jnp.einsum("...ij,...j->...i", V_inv, t)
    return jnp.concatenate([v, w], axis=-1)


def inverse(T):
    """Inverse of a rigid transform (exploits the SE(3) structure)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, t_inv[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype),
        top.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def compose(A, B):
    """A @ B for stacked 4x4 transforms."""
    return A @ B


def identity(dtype=jnp.float32, batch_shape=()):
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), batch_shape + (4, 4))


def adjoint(T):
    """6x6 adjoint of T mapping twists: Ad(T) xi acts as T exp(xi) T^{-1}.

    With the [v, w] ordering: Ad = [[R, hat(t) R], [0, R]].
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = hat_so3(t) @ R
    zeros = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([zeros, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def ad_se3(xi):
    """Small adjoint ad(xi) with [v, w] ordering: [[hat(w), hat(v)], [0, hat(w)]].

    Satisfies ad(xi) eta = [w x v' + v x w', w x w'] (the se(3) bracket).
    """
    v, w = xi[..., :3], xi[..., 3:]
    vh = hat_so3(v)
    wh = hat_so3(w)
    zeros = jnp.zeros_like(wh)
    top = jnp.concatenate([wh, vh], axis=-1)
    bottom = jnp.concatenate([zeros, wh], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def right_jacobian_inverse_approx(r):
    """Second-order approximation of the inverse right Jacobian of log:
    Jr^{-1}(r) ~= I + ad(r)/2 + ad(r)^2 / 12.

    Exact enough for pose-graph Gauss-Newton where residuals are small
    after the first iteration (standard practice; g2o's EdgeSE3 similarly
    approximates its error Jacobians).
    """
    a = ad_se3(r)
    eye = jnp.eye(6, dtype=r.dtype)
    return eye + 0.5 * a + (1.0 / 12.0) * (a @ a)


def transform_points(T, points):
    """Apply a rigid transform to points of shape [..., 3]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, points) + t[..., None, :]


def orthonormalize(T):
    """Re-project the rotation block onto SO(3) (polar via SVD).

    Used to control float32 drift after long chains of compositions.
    """
    R = T[..., :3, :3]
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    u = u.at[..., :, -1].multiply(jnp.sign(det)[..., None])
    Rn = u @ vt
    out = T.at[..., :3, :3].set(Rn) if hasattr(T, "at") else T
    return out
