"""Fused warp -> sample -> residual -> Jacobian computation (XLA path).

TPU-native replacement for the reference's hottest kernel chain:
``computeResidualsSse`` (dense_tracking_impl.cpp:133-393) plus the
per-point Jacobian build in the solver loop (dense_tracking.cpp:327-343).
The reference compacts surviving points; here everything stays dense
[H*W] with a boolean mask so shapes are static and XLA fuses the whole
chain into a few passes (SURVEY.md section 7, translation 1).

Math (see SURVEY.md section 3.4 for the full derivation with citations):

  p' = T p_ref;  (u, v) = project(p')
  r_I = (I_cur(u, v) - I_ref) / 255
  r_Z = Z_cur(u, v) - z'                (ref depth replaced by transformed z,
                                         dense_tracking_impl.cpp:113-115)
  occlusion gate: keep if r_Z > -20 * sigma_z(z_ref)
                                         (dense_tracking_impl.cpp:274-275)
  gradient blend (channel weights, dense_tracking.cpp:215-220):
    dI = 0.5 (dI_cur(u,v) + dI_ref) * (fx, fy) / 255     (ESM-style)
    dZ =      dZ_cur(u,v)           * (fx, fy)           (current only)
  J_I = dI . Jw(p_ref)
  J_Z = dZ . Jw(p_ref) - Jz(p_ref)       (dense_tracking.cpp:333-342)

with Jw the analytic 2x6 projection+transform Jacobian evaluated at the
*reference* point (forward-compositional; the reference stores p_ref into
the point-error record, dense_tracking_impl.cpp:111) and Jz the third row
of the transform Jacobian (dense_tracking.cpp:448-476).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .camera import Intrinsics, unproject
from .interp import bilinear_sample_accel


class ResidualData(NamedTuple):
    """Per-pixel residuals and Jacobians over a dense [N = H*W] layout.

    Masked-out entries are zeroed so downstream reductions are plain sums.
    """

    residuals: jnp.ndarray  # [N, 2] (r_I, r_Z)
    jacobian: jnp.ndarray  # [N, 2, 6]
    mask: jnp.ndarray  # [N] bool, True = valid constraint
    num_valid: jnp.ndarray  # [] int32


def depth_stddev(z):
    """Kinect axial noise model sigma_z = 0.0012 + 0.0019 (z - 0.4)^2
    (reference: dense_tracking_impl.cpp:122-128)."""
    d = z - 0.4
    return 0.0012 + 0.0019 * d * d


def projection_jacobian(p, dtype=None):
    """Analytic 2x6 Jacobian of (projection o transform) wrt the twist
    [v, w], in normalized (unit-focal) image coordinates — focal lengths are
    folded into the gradient channel weights, as in the reference.

    Matches computeJacobianOfProjectionAndTransformation
    (dense_tracking.cpp:446-466); ``p`` is [..., 3].
    """
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    zeros = jnp.zeros_like(x)
    row0 = jnp.stack(
        [iz, zeros, -x * iz2, -x * y * iz2, 1.0 + x * x * iz2, -y * iz], axis=-1
    )
    row1 = jnp.stack(
        [zeros, iz, -y * iz2, -(1.0 + y * y * iz2), x * y * iz2, x * iz], axis=-1
    )
    return jnp.stack([row0, row1], axis=-2)


def transform_z_jacobian(p):
    """Third row of d(T p)/d(twist): [0, 0, 1, y, -x, 0]
    (reference: compute3rdRowOfJacobianOfTransformation,
    dense_tracking.cpp:468-476)."""
    x, y = p[..., 0], p[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    return jnp.stack([zeros, zeros, ones, y, -x, zeros], axis=-1)


def warp_and_sample(
    ref_depth,  # [H, W]
    cur_accel,  # [H, W, 8]
    intrinsics: Intrinsics,
    T,  # [4, 4]
    quad=None,  # optional [H*W, 32] quad table (interp.build_quad_table)
):
    """Warp reference points into the current frame and bilinearly sample
    the acceleration tensor — the gather half of the residual kernel.

    Feeds the fused Pallas partials kernel (ops/pallas_kernels.py), which
    cannot gather on TPU; XLA performs the irregular access, the kernel
    fuses all the regular math.  When ``quad`` is provided the 2x2 support
    comes back in ONE gather (index-rate bound on TPU: measured ~1.7x
    faster than four row gathers).  Returns ``(sampled [N, 8], z_t [N],
    points [N, 3])`` where sampled channel 6 is the combined
    bounds+neighbor validity and channel 7 is unused.
    """
    from .interp import bilinear_sample_quad

    h, w = ref_depth.shape
    n = h * w
    points = unproject(ref_depth, intrinsics).reshape(n, 3)
    R = T[:3, :3].astype(ref_depth.dtype)
    t = T[:3, 3].astype(ref_depth.dtype)
    p_t = points @ R.T + t
    z_t = p_t[:, 2]
    z_safe = jnp.where(z_t > 1e-12, z_t, 1e-12)
    u = p_t[:, 0] / z_safe * intrinsics.fx + intrinsics.ox
    v = p_t[:, 1] / z_safe * intrinsics.fy + intrinsics.oy
    if quad is not None:
        sampled, sample_valid = bilinear_sample_quad(quad, (h, w), u, v, z_t)
    else:
        sampled, sample_valid = bilinear_sample_accel(cur_accel, u, v, z_t)
    validity = sample_valid & (z_t > 1e-12)
    sampled = sampled.at[:, 6].set(validity.astype(sampled.dtype))
    return sampled, z_t, points


def warp_and_sample_cm(
    refpack_cm,  # [8, N] channel-major (i, z, idx, idy, x, y, sel, 0)
    quad_cm,  # [32, N] quad table — or a TUPLE of per-stream tables
    shape,  # (H, W) of the level
    intrinsics: Intrinsics,
    T,  # [4, 4]
    lane_offset=None,  # [] lane offset into a flat [32, B*N] stream-batched table
    stream_index=None,  # [] table selector when quad_cm is a tuple
    depth_buffered: bool = True,  # TrackerConfig.depth_buffered_sampling
):
    """Channel-major warp + sample: the production gather of the fused
    path.  Reference geometry comes straight from the refpack channels
    (x, y in rows 4/5, z = depth in row 1 — the unprojection is cached at
    prepare time instead of recomputed per iteration), so ONE [32, N]
    column gather delivers each pixel's full 2x2 support and everything
    stays pixels-on-lanes.  Returns ``sampled [8, N]`` with channel 6 the
    combined bounds+neighbor validity and channel 7 the transformed depth
    z' (ready for the fused partials kernel).

    The sample is DEPTH-BUFFERED against the transformed depth z' (the
    reference's 5 cm rule, interpolation.cpp:55-110 — see
    interp._sample_quad_cols for why the hot path gets it for free here
    while the reference's residual kernel does not).
    """
    from .interp import bilinear_sample_quad_cm

    x, y, z = refpack_cm[4], refpack_cm[5], refpack_cm[1]
    R = T[:3, :3].astype(refpack_cm.dtype)
    t = T[:3, 3].astype(refpack_cm.dtype)
    p_x = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + t[0]
    p_y = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + t[1]
    z_t = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + t[2]
    z_safe = jnp.where(z_t > 1e-12, z_t, 1e-12)
    u = p_x / z_safe * intrinsics.fx + intrinsics.ox
    v = p_y / z_safe * intrinsics.fy + intrinsics.oy
    sampled, sample_valid = bilinear_sample_quad_cm(
        quad_cm, shape, u, v,
        z_expected=z_t if depth_buffered else None,
        lane_offset=lane_offset, stream_index=stream_index,
    )
    validity = sample_valid & (z_t > 1e-12)
    sampled = sampled.at[6].set(validity.astype(sampled.dtype))
    sampled = sampled.at[7].set(z_t)
    return sampled


def compute_residuals(
    ref_intensity,  # [H, W]
    ref_depth,  # [H, W]
    ref_idx,
    ref_idy,
    sel_mask,  # [H, W] bool — selected reference points
    cur_accel,  # [H, W, 8]
    intrinsics: Intrinsics,
    T,  # [4, 4] transform ref -> cur
) -> ResidualData:
    """One fused residual + Jacobian evaluation over a pyramid level."""
    h, w = ref_intensity.shape
    n = h * w
    dtype = ref_intensity.dtype

    points = unproject(ref_depth, intrinsics).reshape(n, 3)
    R = T[:3, :3].astype(dtype)
    t = T[:3, 3].astype(dtype)
    p_t = points @ R.T + t
    z_t = p_t[:, 2]

    z_safe = jnp.where(z_t > 1e-12, z_t, 1e-12)
    u = p_t[:, 0] / z_safe * intrinsics.fx + intrinsics.ox
    v = p_t[:, 1] / z_safe * intrinsics.fy + intrinsics.oy

    sampled, sample_valid = bilinear_sample_accel(cur_accel, u, v, z_t)

    i_ref = ref_intensity.reshape(n)
    r_i = (sampled[:, 0] - i_ref) * (1.0 / 255.0)
    r_z = sampled[:, 1] - z_t

    # Occlusion rejection against the reference depth's noise band
    # (dense_tracking_impl.cpp:274-275).
    not_occluded = r_z > -20.0 * depth_stddev(ref_depth.reshape(n))

    mask = sel_mask.reshape(n) & sample_valid & (z_t > 1e-12) & not_occluded

    # Gradient channel weights (dense_tracking.cpp:215-220): ESM blend for
    # intensity, current-only for depth, focal-length scaled.
    gi_x = 0.5 * (sampled[:, 2] + ref_idx.reshape(n)) * (intrinsics.fx / 255.0)
    gi_y = 0.5 * (sampled[:, 3] + ref_idy.reshape(n)) * (intrinsics.fy / 255.0)
    gz_x = sampled[:, 4] * intrinsics.fx
    gz_y = sampled[:, 5] * intrinsics.fy

    jw = projection_jacobian(points)  # [N, 2, 6]
    jz = transform_z_jacobian(points)  # [N, 6]
    j_i = gi_x[:, None] * jw[:, 0, :] + gi_y[:, None] * jw[:, 1, :]
    j_z = gz_x[:, None] * jw[:, 0, :] + gz_y[:, None] * jw[:, 1, :] - jz

    maskf = mask.astype(dtype)
    residuals = jnp.stack([r_i, r_z], axis=-1) * maskf[:, None]
    jacobian = jnp.stack([j_i, j_z], axis=-2) * maskf[:, None, None]

    return ResidualData(
        residuals=residuals,
        jacobian=jacobian,
        mask=mask,
        num_valid=mask.sum(dtype=jnp.int32),
    )


def normal_equations(residual_data: ResidualData, weights, precision):
    """Accumulate the 6x6 normal equations on the MXU.

    Replaces NormalEquationsLeastSquares::update + the SSE rank-update
    (least_squares.cpp:59-64, math_sse.cpp:82-178):
      A =  sum_i  w_i J_i^T P J_i
      b = -sum_i  w_i J_i^T P r_i
    Formulated as two batched contractions so XLA maps the accumulation to
    a [6, 2N] x [2N, 6] matmul (the canonical partial-sum merge of P6 in
    SURVEY.md section 2.5 — under pjit this reduction becomes a psum).
    """
    J = residual_data.jacobian  # [N, 2, 6]
    r = residual_data.residuals  # [N, 2]
    wJ = weights[:, None, None] * J
    PJ = jnp.einsum("ab,nbj->naj", precision, J)
    A = jnp.einsum("nai,naj->ij", wJ, PJ)
    A = 0.5 * (A + A.T)  # exact symmetry despite accumulation rounding
    Pr = r @ precision.T
    b = -jnp.einsum("nai,na->i", wJ, Pr)
    return A, b
