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
  * All 136 partial-sum scalars are one 16x16 Gram matrix on the MXU:
    with U = [sqrt(w) J_I(6); sqrt(w) J_Z(6); sqrt(w) r_I; sqrt(w) r_Z;
    mask; 0] stacked [16, BLOCK], U U^T contains every weighted product
    (m00/m01/m11 blocks, the four J^T r vectors, the 2x2 scale numerator,
    and n = sum mask on the diagonal).  One [16, B] x [B, 16] contraction
    per tile replaces 136 VPU cross-lane reductions — the TPU-idiomatic
    form of the reference's SSE rank-update (math_sse.cpp:82-178).
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
    residuals: jnp.ndarray  # [2, N] channel-major (r_I, r_Z rows)
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


def _gram_rows(r_i, r_z, w, maskf, j_i, j_z):
    """Stack the 16 weighted channel rows whose Gram matrix carries every
    precision-independent reduction.  Inputs are 2D [rows, cols] tiles (or
    [1, N]); output is [16, rows*cols-shaped] via concatenation on axis 0.
    """
    sw = jnp.sqrt(w)
    rows = (
        [sw * c for c in j_i]
        + [sw * c for c in j_z]
        + [sw * r_i, sw * r_z, maskf, jnp.zeros_like(maskf)]
    )
    return jnp.concatenate(rows, axis=0)


def _unpack_gram(g):
    """Gram [16, 16] -> (m00, m01, m11, v, scale_sum, n).

    Layout (see _gram_rows): rows 0-5 sqrt(w)J_I, 6-11 sqrt(w)J_Z,
    12 sqrt(w)r_I, 13 sqrt(w)r_Z, 14 mask, 15 zero."""
    m00 = g[0:6, 0:6]
    m01 = g[0:6, 6:12]
    m11 = g[6:12, 6:12]
    v = jnp.stack([g[0:6, 12], g[0:6, 13], g[6:12, 12], g[6:12, 13]], axis=0)
    scale_sum = jnp.stack([g[12, 12], g[12, 13], g[13, 13]])
    n = g[14, 14]
    return m00, m01, m11, v, scale_sum, n


def fused_partials_xla(
    sampled,  # [8, N] channel-major
    refpack,  # [8, N] channel-major
    precision3,  # [3] (P00, P01, P11)
    first_iter,  # [] int32
    intrinsics: Intrinsics,
    dof: float = 5.0,
) -> FusedPartials:
    """XLA twin of the Pallas kernel (also the CPU/test oracle).

    Inputs are channel-MAJOR [8, N]: on TPU the minor axis maps to the
    128-lane dimension, so a channel-minor [N, 8] array wastes 15/16 of
    every (8, 128) tile — channel-major keeps pixels on lanes (measured
    ~4x on the prepare stage; tools/hotpath4.py).
    """
    ref = refpack
    cur = sampled
    r_i, r_z, w, maskf, j_i, j_z = _pixel_math(
        ref, cur, precision3, first_iter, intrinsics.fx, intrinsics.fy, dof
    )
    two_d = lambda x: x[None, :]
    U = _gram_rows(
        two_d(r_i), two_d(r_z), two_d(w), two_d(maskf),
        [two_d(c) for c in j_i], [two_d(c) for c in j_z],
    )  # [16, N]
    gram = jax.lax.dot_general(
        U, U, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m00, m01, m11, v, scale_sum, n = _unpack_gram(gram)
    return FusedPartials(
        m00=m00,
        m01=m01,
        m11=m11,
        v=v,
        scale_sum=scale_sum,
        num_valid=n,
        residuals=jnp.stack([r_i, r_z]),
        weights=w,
    )


def _unpack_stats(stats, residuals, weights) -> FusedPartials:
    """stats = the accumulated [16, 128] tile whose [:, :16] block is the
    Gram matrix (see _gram_rows for the row layout)."""
    m00, m01, m11, v, scale_sum, n = _unpack_gram(stats[:, :16])
    return FusedPartials(
        m00=m00,
        m01=m01,
        m11=m11,
        v=v,
        scale_sum=scale_sum,
        num_valid=n,
        residuals=residuals,
        weights=weights,
    )


def _kernel(params_ref, ref_ref, cur_ref, stats_ref, rw_ref):
    """One grid step: an [8, BLOCK] channel-major tile of pixels ->
    accumulate the Gram stats tile, write residuals/weights."""
    g = pl.program_id(0)

    fx = params_ref[0, 0]
    fy = params_ref[0, 1]
    dof = params_ref[0, 2]
    first = params_ref[0, 3]
    precision = (params_ref[0, 4], params_ref[0, 5], params_ref[0, 6])

    ref = ref_ref[:]  # [8, BLOCK]
    cur = cur_ref[:]
    channels_ref = [ref[c : c + 1, :] for c in range(7)]  # each [1, BLOCK]
    channels_cur = [cur[c : c + 1, :] for c in range(8)]

    r_i, r_z, w, maskf, j_i, j_z = _pixel_math(
        channels_ref, channels_cur, precision, first, fx, fy, dof
    )

    rw_ref[:] = jnp.concatenate([r_i, r_z, w, maskf], axis=0)

    # one MXU contraction produces every partial sum at once
    U = _gram_rows(r_i, r_z, w, maskf, j_i, j_z)  # [16, BLOCK]
    gram = jax.lax.dot_general(
        U, U, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    stats = jnp.concatenate(
        [gram, jnp.zeros((16, 112), gram.dtype)], axis=1
    )  # pad to the [16, 128] lane tile

    @pl.when(g == 0)
    def _init():
        stats_ref[:] = stats

    @pl.when(g > 0)
    def _acc():
        stats_ref[:] = stats_ref[:] + stats


def fused_partials_pallas(
    sampled,  # [8, N] channel-major
    refpack,  # [8, N] channel-major
    precision3,  # [3]
    first_iter,  # [] int32
    intrinsics: Intrinsics,
    dof: float = 5.0,
    interpret: bool = False,
) -> FusedPartials:
    """Fused Pallas pass.  Pixels arrive channel-major [8, N] (pixels on
    the 128-lane axis — see fused_partials_xla's layout note); the grid
    walks BLOCK-pixel tiles.  Padding lanes contribute nothing (sel/valid
    are 0 there)."""
    n = sampled.shape[1]
    n_pad = -(-n // BLOCK) * BLOCK
    pad = n_pad - n
    dtype = sampled.dtype

    cur = jnp.pad(sampled, ((0, 0), (0, pad)))  # [8, n_pad]
    ref = jnp.pad(refpack, ((0, 0), (0, pad)))

    params = jnp.concatenate(
        [
            jnp.asarray([intrinsics.fx, intrinsics.fy, dof], dtype),
            first_iter.astype(dtype)[None],
            precision3.astype(dtype),
            jnp.zeros(1, dtype),
        ]
    )[None, :]  # [1, 8]

    grid = n_pad // BLOCK
    stats, rw = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda g: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, BLOCK), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BLOCK), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, BLOCK), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, 128), dtype),
            jax.ShapeDtypeStruct((4, n_pad), dtype),
        ],
        interpret=interpret,
    )(params, ref, cur)

    return _unpack_stats(stats, rw[:2, :n], rw[2, :n])


class FusedStats(NamedTuple):
    """Partials + in-kernel log-likelihood sum — the no-writeback form:
    unlike FusedPartials, per-pixel residuals/weights never leave the
    kernel (they live in VMEM scratch between the two grid passes)."""

    m00: jnp.ndarray  # [6, 6]
    m01: jnp.ndarray  # [6, 6]
    m11: jnp.ndarray  # [6, 6]
    v: jnp.ndarray  # [4, 6]
    scale_sum: jnp.ndarray  # [3]
    num_valid: jnp.ndarray  # []
    log_sum: jnp.ndarray  # [] sum of log1p(r^T P_new r / dof) over valid pixels


# variance floors replicated from robust.precision_from_scale — the
# in-kernel precision MUST match the host-side one bit for bit
_SIGMA_FLOOR_I = (0.05 / 255.0) ** 2
_SIGMA_FLOOR_Z = 1e-4**2


def _precision_from_scale_sums(s00, s01, s11, n):
    """(P00, P01, P11) from the raw scale sums — identical math to
    robust.precision_from_scale(scale_matrix / max(n - 3, 1))."""
    denom = jnp.maximum(n - 3.0, 1.0)
    a = s00 / denom + _SIGMA_FLOOR_I
    b = s01 / denom
    c = s11 / denom + _SIGMA_FLOOR_Z
    det = jnp.maximum(a * c - b * b, 1e-30)
    return c / det, -b / det, a / det


def fused_stats_xla(
    sampled,  # [8, N] channel-major
    refpack,  # [8, N] channel-major
    precision3,  # [3]
    first_iter,  # [] int32
    intrinsics: Intrinsics,
    dof: float = 5.0,
) -> FusedStats:
    """XLA twin of the two-pass kernel (CPU path / parity oracle)."""
    parts = fused_partials_xla(sampled, refpack, precision3, first_iter, intrinsics, dof)
    p00, p01, p11 = _precision_from_scale_sums(
        parts.scale_sum[0], parts.scale_sum[1], parts.scale_sum[2], parts.num_valid
    )
    r_i, r_z = parts.residuals[0], parts.residuals[1]
    d2 = r_i * (p00 * r_i + p01 * r_z) + r_z * (p01 * r_i + p11 * r_z)
    log_sum = jnp.sum(jnp.where(parts.weights > 0, jnp.log1p(d2 / dof), 0.0))
    return FusedStats(
        m00=parts.m00, m01=parts.m01, m11=parts.m11, v=parts.v,
        scale_sum=parts.scale_sum, num_valid=parts.num_valid, log_sum=log_sum,
    )


def _kernel2(params_ref, ref_ref, cur_ref, stats_ref, ll_ref, rw_scratch):
    """Two-pass grid (pass axis slowest): pass 0 accumulates the Gram
    stats and stashes (r_i, r_z, mask) in VMEM scratch; pass 1 computes
    the NEW precision from the accumulated stats and reduces the
    t-distribution log1p sum — per-pixel data never touches HBM."""
    p = pl.program_id(0)
    g = pl.program_id(1)

    fx = params_ref[0, 0]
    fy = params_ref[0, 1]
    dof = params_ref[0, 2]
    first = params_ref[0, 3]
    precision = (params_ref[0, 4], params_ref[0, 5], params_ref[0, 6])

    @pl.when(p == 0)
    def _pass0():
        ref = ref_ref[:]
        cur = cur_ref[:]
        channels_ref = [ref[c : c + 1, :] for c in range(7)]
        channels_cur = [cur[c : c + 1, :] for c in range(8)]
        r_i, r_z, w, maskf, j_i, j_z = _pixel_math(
            channels_ref, channels_cur, precision, first, fx, fy, dof
        )
        rw_scratch[:, pl.ds(g * BLOCK, BLOCK)] = jnp.concatenate(
            [r_i, r_z, maskf], axis=0
        )
        U = _gram_rows(r_i, r_z, w, maskf, j_i, j_z)
        gram = jax.lax.dot_general(
            U, U, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        stats = jnp.concatenate([gram, jnp.zeros((16, 112), gram.dtype)], axis=1)

        @pl.when(g == 0)
        def _init():
            stats_ref[:] = stats
            ll_ref[0, 0] = 0.0

        @pl.when(g > 0)
        def _acc():
            stats_ref[:] = stats_ref[:] + stats

    @pl.when(p == 1)
    def _pass1():
        s00 = stats_ref[12, 12]
        s01 = stats_ref[12, 13]
        s11 = stats_ref[13, 13]
        n = stats_ref[14, 14]
        p00, p01, p11 = _precision_from_scale_sums(s00, s01, s11, n)
        tile = rw_scratch[:, pl.ds(g * BLOCK, BLOCK)]
        r_i, r_z, maskf = tile[0:1, :], tile[1:2, :], tile[2:3, :]
        d2 = r_i * (p00 * r_i + p01 * r_z) + r_z * (p01 * r_i + p11 * r_z)
        local = jnp.sum(jnp.where(maskf > 0.5, jnp.log1p(d2 / dof), 0.0))
        ll_ref[0, 0] = ll_ref[0, 0] + local


def fused_stats_pallas(
    sampled,  # [8, N] channel-major
    refpack,  # [8, N] channel-major
    precision3,  # [3]
    first_iter,  # [] int32
    intrinsics: Intrinsics,
    dof: float = 5.0,
    interpret: bool = False,
) -> FusedStats:
    """Two-pass fused Pallas kernel: Gram partials + in-kernel LL."""
    n = sampled.shape[1]
    n_pad = -(-n // BLOCK) * BLOCK
    pad = n_pad - n
    dtype = sampled.dtype

    cur = jnp.pad(sampled, ((0, 0), (0, pad)))
    ref = jnp.pad(refpack, ((0, 0), (0, pad)))

    params = jnp.concatenate(
        [
            jnp.asarray([intrinsics.fx, intrinsics.fy, dof], dtype),
            first_iter.astype(dtype)[None],
            precision3.astype(dtype),
            jnp.zeros(1, dtype),
        ]
    )[None, :]

    grid = (2, n_pad // BLOCK)
    stats, ll = pl.pallas_call(
        _kernel2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda p, g: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, BLOCK), lambda p, g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BLOCK), lambda p, g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, 128), lambda p, g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda p, g: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, 128), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((3, n_pad), dtype)],
        interpret=interpret,
    )(params, ref, cur)

    m00, m01, m11, v, scale_sum, num_valid = _unpack_gram(stats[:, :16])
    return FusedStats(
        m00=m00, m01=m01, m11=m11, v=v, scale_sum=scale_sum,
        num_valid=num_valid, log_sum=ll[0, 0],
    )


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
