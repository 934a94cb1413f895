"""Fused Pallas TPU kernel for the dense-tracking inner loop.

The hottest compute in the system is the per-iteration chain
residual -> IRLS weight -> Jacobian -> weighted normal-equation
accumulation (the reference's SSE kernels computeResidualsSse +
computeWeightsSse/computeScaleSse + OptimizedSelfAdjointMatrix6x6f
rank-update, dense_tracking_impl.cpp / math_sse.cpp — P1 + P6 in
SURVEY.md 2.5).  This module fuses that chain into ONE Pallas pass over
pixel tiles, with a numerically identical XLA reference implementation
(the scalar/SSE "twin" pattern of the reference, SURVEY.md section 4.3).

Key design points:

  * The bilinear gather stays in XLA (``residuals.warp_and_sample``) —
    Mosaic has no reliable arbitrary-row gather; everything downstream is
    regular tile math and fuses here.
  * The 2x2 t-distribution precision of the CURRENT iteration depends on
    a global reduction mid-iteration, so the kernel emits
    precision-INDEPENDENT partials: with J = [J_I; J_Z] per pixel,
      M00 = sum w J_I^T J_I, M01 = sum w J_I^T J_Z, M11 = sum w J_Z^T J_Z
      v00 = sum w J_I r_I,  v01 = sum w J_I r_Z, v10/v11 analogous
      S   = sum w r r^T (the t-dist scale numerator), n = sum mask
    so that for any precision P:
      A =  P00 M00 + P01 (M01 + M01^T) + P11 M11
      b = -(P00 v00 + P01 (v01 + v10) + P11 v11)
    exactly reproducing A = sum w J^T P J, b = -sum w J^T P r
    (least_squares.cpp:59-64) in a single data pass.
  * Partial sums accumulate across the sequential TPU grid into single
    outputs; per-pixel residuals and weights are also emitted for the
    (cheap) log-likelihood pass once the new precision is known.

Data layout is SoA: inputs are [8, N] channel-major so tiles are
(8, BLOCK) with the 128-lane axis along pixels.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .camera import Intrinsics

BLOCK = 4096  # pixels per grid step (8 x 512 f32 tiles, ~a few 100KB VMEM)

# refpack channel layout: i, z, idx, idy, x, y, sel, unused
# sampled channel layout: i_c, z_c, idx_c, idy_c, zdx_c, zdy_c, valid, z_t


class FusedPartials(NamedTuple):
    m00: jnp.ndarray  # [6, 6]
    m01: jnp.ndarray  # [6, 6]
    m11: jnp.ndarray  # [6, 6]
    v: jnp.ndarray  # [4, 6]  rows: v00, v01, v10, v11
    scale_sum: jnp.ndarray  # [3]  (S_II, S_IZ, S_ZZ)
    num_valid: jnp.ndarray  # []
    residuals: jnp.ndarray  # [N, 2]
    weights: jnp.ndarray  # [N]


def _pixel_math(ref, cur, precision, first_iter, fx, fy, dof):
    """The shared elementwise chain: 8-channel tiles -> per-pixel residual
    pair, IRLS weight, and the 12 Jacobian components.  Identical math to
    residuals.compute_residuals (see citations there); shapes [...] are
    whatever tile the caller passes.
    """
    i_r, z_r, idx_r, idy_r, x_r, y_r, sel = (
        ref[0], ref[1], ref[2], ref[3], ref[4], ref[5], ref[6],
    )
    i_c, z_c, idx_c, idy_c, zdx_c, zdy_c, validf, z_t = (
        cur[0], cur[1], cur[2], cur[3], cur[4], cur[5], cur[6], cur[7],
    )

    r_i = (i_c - i_r) * (1.0 / 255.0)
    r_z = z_c - z_t

    sigma = z_r - 0.4
    sigma = 0.0012 + 0.0019 * sigma * sigma
    not_occluded = r_z > -20.0 * sigma

    mask = (sel > 0.5) & (validf > 0.5) & not_occluded
    maskf = mask.astype(r_i.dtype)
    r_i = r_i * maskf
    r_z = r_z * maskf

    # IRLS weight from the PREVIOUS precision (weight lag,
    # dense_tracking.cpp:286-301); unit weights on the first iteration
    p00, p01, p11 = precision[0], precision[1], precision[2]
    d2 = r_i * (p00 * r_i + p01 * r_z) + r_z * (p01 * r_i + p11 * r_z)
    w_t = (dof + 2.0) / (dof + d2)
    w = jnp.where(first_iter > 0, maskf, w_t * maskf)

    # gradient channel weights (dense_tracking.cpp:215-220)
    g_ix = 0.5 * (idx_c + idx_r) * (fx / 255.0)
    g_iy = 0.5 * (idy_c + idy_r) * (fy / 255.0)
    g_zx = zdx_c * fx
    g_zy = zdy_c * fy

    z_safe = jnp.where(jnp.abs(z_r) > 1e-12, z_r, 1e-12)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    x, y = x_r, y_r

    # Jw rows (dense_tracking.cpp:446-466), fused with the gradient dots
    jw0 = (iz, jnp.zeros_like(iz), -x * iz2, -x * y * iz2, 1.0 + x * x * iz2, -y * iz)
    jw1 = (jnp.zeros_like(iz), iz, -y * iz2, -(1.0 + y * y * iz2), x * y * iz2, x * iz)
    jz = (0.0, 0.0, 1.0, y, -x, 0.0)

    j_i = [g_ix * a + g_iy * b for a, b in zip(jw0, jw1)]
    j_z = [g_zx * a + g_zy * b - c for a, b, c in zip(jw0, jw1, jz)]
    j_i = [c * maskf for c in j_i]
    j_z = [c * maskf for c in j_z]
    return r_i, r_z, w, maskf, j_i, j_z


def _reduce_partials(r_i, r_z, w, maskf, j_i, j_z):
    """All precision-independent reductions from the pixel chain."""
    dtype = r_i.dtype
    wj_i = [w * c for c in j_i]
    wj_z = [w * c for c in j_z]

    def outer(rows_w, cols):
        return jnp.stack(
            [
                jnp.stack([jnp.sum(a * b) for b in cols], axis=0)
                for a in rows_w
            ],
            axis=0,
        )

    m00 = outer(wj_i, j_i)
    m01 = outer(wj_i, j_z)
    m11 = outer(wj_z, j_z)
    v = jnp.stack(
        [
            jnp.stack([jnp.sum(c * r_i) for c in wj_i]),
            jnp.stack([jnp.sum(c * r_z) for c in wj_i]),
            jnp.stack([jnp.sum(c * r_i) for c in wj_z]),
            jnp.stack([jnp.sum(c * r_z) for c in wj_z]),
        ],
        axis=0,
    )
    scale_sum = jnp.stack(
        [jnp.sum(w * r_i * r_i), jnp.sum(w * r_i * r_z), jnp.sum(w * r_z * r_z)]
    )
    n = jnp.sum(maskf)
    return m00, m01, m11, v, scale_sum, n


def fused_partials_xla(
    sampled,  # [N, 8]
    refpack,  # [N, 8]
    precision3,  # [3] (P00, P01, P11)
    first_iter,  # [] int32
    intrinsics: Intrinsics,
    dof: float = 5.0,
) -> FusedPartials:
    """XLA twin of the Pallas kernel (also the CPU/test oracle)."""
    ref = refpack.T
    cur = sampled.T
    r_i, r_z, w, maskf, j_i, j_z = _pixel_math(
        ref, cur, precision3, first_iter, intrinsics.fx, intrinsics.fy, dof
    )
    m00, m01, m11, v, scale_sum, n = _reduce_partials(r_i, r_z, w, maskf, j_i, j_z)
    return FusedPartials(
        m00=m00,
        m01=m01,
        m11=m11,
        v=v,
        scale_sum=scale_sum,
        num_valid=n,
        residuals=jnp.stack([r_i, r_z], axis=-1),
        weights=w,
    )


def _unpack_stats(stats, residuals, weights) -> FusedPartials:
    """stats layout (built by the kernel's iota-mask scatter):
    rows 0-2 = m00/m01/m11 (36 each), row 3 = v (24),
    row 4 = [S_II, S_IZ, S_ZZ, n]."""
    return FusedPartials(
        m00=stats[0, :36].reshape(6, 6),
        m01=stats[1, :36].reshape(6, 6),
        m11=stats[2, :36].reshape(6, 6),
        v=stats[3, :24].reshape(4, 6),
        scale_sum=stats[4, :3],
        num_valid=stats[4, 3],
        residuals=residuals,
        weights=weights,
    )


def _scalar_reductions(r_i, r_z, w, maskf, j_i, j_z):
    """All 136 precision-independent scalar sums as (row, col, value)
    entries of the stats tile (2D reductions only — Mosaic has no 1D)."""
    wj_i = [w * c for c in j_i]
    wj_z = [w * c for c in j_z]
    entries = []
    for a in range(6):
        for b in range(6):
            entries.append((0, a * 6 + b, jnp.sum(wj_i[a] * j_i[b])))
            entries.append((1, a * 6 + b, jnp.sum(wj_i[a] * j_z[b])))
            entries.append((2, a * 6 + b, jnp.sum(wj_z[a] * j_z[b])))
    for b in range(6):
        entries.append((3, 0 * 6 + b, jnp.sum(wj_i[b] * r_i)))
        entries.append((3, 1 * 6 + b, jnp.sum(wj_i[b] * r_z)))
        entries.append((3, 2 * 6 + b, jnp.sum(wj_z[b] * r_i)))
        entries.append((3, 3 * 6 + b, jnp.sum(wj_z[b] * r_z)))
    entries.append((4, 0, jnp.sum(w * r_i * r_i)))
    entries.append((4, 1, jnp.sum(w * r_i * r_z)))
    entries.append((4, 2, jnp.sum(w * r_z * r_z)))
    entries.append((4, 3, jnp.sum(maskf)))
    return entries


def _kernel(params_ref, ref_ref, cur_ref, stats_ref, rw_ref):
    """One grid step: an [8, R, 128] channel-plane tile of pixels ->
    accumulate the stats tile, write residuals/weights."""
    g = pl.program_id(0)

    fx = params_ref[0, 0]
    fy = params_ref[0, 1]
    dof = params_ref[0, 2]
    first = params_ref[0, 3]
    precision = (params_ref[0, 4], params_ref[0, 5], params_ref[0, 6])

    ref = ref_ref[:]  # [8, R, 128]
    cur = cur_ref[:]
    channels_ref = [ref[c] for c in range(7)]  # each [R, 128] — 2D tiles
    channels_cur = [cur[c] for c in range(8)]

    r_i, r_z, w, maskf, j_i, j_z = _pixel_math(
        channels_ref, channels_cur, precision, first, fx, fy, dof
    )

    rw_ref[0] = r_i
    rw_ref[1] = r_z
    rw_ref[2] = w
    rw_ref[3] = maskf

    # scatter the scalar sums into the [8, 128] stats tile via iota masks
    # (keeps every op 2D; 136 masked adds of an 8x128 tile are negligible)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    stats = jnp.zeros((8, 128), r_i.dtype)
    for row, col, val in _scalar_reductions(r_i, r_z, w, maskf, j_i, j_z):
        stats = stats + jnp.where((row_ids == row) & (col_ids == col), val, 0.0)

    @pl.when(g == 0)
    def _init():
        stats_ref[:] = stats

    @pl.when(g > 0)
    def _acc():
        stats_ref[:] = stats_ref[:] + stats


def fused_partials_pallas(
    sampled,  # [N, 8]
    refpack,  # [N, 8]
    precision3,  # [3]
    first_iter,  # [] int32
    intrinsics: Intrinsics,
    dof: float = 5.0,
    interpret: bool = False,
) -> FusedPartials:
    """Fused Pallas pass.  Pixels are laid out as [8 channels, rows, 128]
    planes; the grid walks row-blocks of R rows (BLOCK = R * 128 pixels).
    Padding lanes contribute nothing (sel/valid are 0 there)."""
    n = sampled.shape[0]
    rows_per_block = BLOCK // 128
    n_pad = -(-n // BLOCK) * BLOCK
    pad = n_pad - n
    rows = n_pad // 128
    dtype = sampled.dtype

    cur = jnp.pad(sampled, ((0, pad), (0, 0))).T.reshape(8, rows, 128)
    ref = jnp.pad(refpack, ((0, pad), (0, 0))).T.reshape(8, rows, 128)

    params = jnp.concatenate(
        [
            jnp.asarray([intrinsics.fx, intrinsics.fy, dof], dtype),
            first_iter.astype(dtype)[None],
            precision3.astype(dtype),
            jnp.zeros(1, dtype),
        ]
    )[None, :]  # [1, 8]

    grid = rows // rows_per_block
    stats, rw = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda g: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (8, rows_per_block, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, rows_per_block, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (4, rows_per_block, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 128), dtype),
            jax.ShapeDtypeStruct((4, rows, 128), dtype),
        ],
        interpret=interpret,
    )(params, ref, cur)

    rw_flat = rw.reshape(4, n_pad)
    return _unpack_stats(stats, rw_flat[:2, :n].T, rw_flat[2, :n])


def assemble_normal_equations(partials: FusedPartials, precision):
    """A, b for an arbitrary 2x2 precision from the fused partials
    (exactly sum w J^T P J / -sum w J^T P r)."""
    p00, p01, p11 = precision[0, 0], precision[0, 1], precision[1, 1]
    A = p00 * partials.m00 + p01 * (partials.m01 + partials.m01.T) + p11 * partials.m11
    A = 0.5 * (A + A.T)
    b = -(
        p00 * partials.v[0]
        + p01 * (partials.v[1] + partials.v[2])
        + p11 * partials.v[3]
    )
    return A, b


def scale_matrix(partials: FusedPartials):
    """The weighted 2x2 scale numerator as a matrix (tdist_scale's
    sum w r r^T; divide by n-3 outside)."""
    s = partials.scale_sum
    return jnp.array([[s[0], s[1]], [s[1], s[2]]], dtype=s.dtype)
