"""Bilinear sampling of the acceleration tensor.

TPU-native replacement for the reference's one-load interpolation of the
8-channel acceleration image (dense_tracking_impl.cpp:84-108) and the
Interpolation helpers (dvo_core/src/core/interpolation.cpp).

Instead of NaN propagation, validity travels as an explicit channel: a
sample is valid only if all four bilinear neighbors are valid, exactly
reproducing the reference's post-interpolation isfinite check (NaN * 0 is
still NaN, so even zero-weight neighbors poison a sample there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

VALID_CHANNEL = 6


@jax.custom_batching.custom_vmap
def gather_columns(table, idx):
    """One column per index: table [C, N], idx [M] -> [C, M].

    Wrapped in custom_vmap because XLA lowers the naively-batched gather
    ([B, C, N] operand + [B, M] indices) ~6x slower per row on TPU
    (measured on the multistream engine); the batching rule below rewrites
    it as ONE flat gather over [C, B*N] with offset indices — the flatten
    transpose is loop-invariant and hoists out of solver loops.
    """
    return table[:, idx]


@gather_columns.def_vmap
def _gather_columns_vmap(axis_size, in_batched, table, idx):
    table_b, idx_b = in_batched
    if table_b and idx_b:
        # One unbatched gather per batch element: each reads a CONTIGUOUS
        # [C, N] table with its own (spatially coherent) indices — measured
        # ~3.5x faster than a flattened [C, B*N] offset gather, whose
        # bitcast-transposed view wrecks the access pattern.
        if axis_size <= 16:
            out = jnp.stack([table[b][:, idx[b]] for b in range(axis_size)])
        else:
            out = jax.lax.map(lambda ti: ti[0][:, ti[1]], (table, idx))
        return out, True
    if idx_b:  # shared table, batched indices
        # one UNBATCHED gather per batch element on the shared table: the
        # flattened single-gather form ([B*M] indices + batch-unflatten
        # transpose) lowers ~6x slower (v5e, B=2 at the L1 shape: 1.64 ms
        # vs 0.27 ms/iter — tools/gather_probe.py dualidx vs dualbar)
        out = jnp.stack([table[:, idx[b]] for b in range(axis_size)])
        return out, True
    # batched table, shared indices
    return table[:, :, idx], True


@jax.custom_batching.custom_vmap
def gather_columns_multi(tables, stream, idx):
    """Gather columns from ONE of several STANDALONE tables.

    ``tables`` is a tuple of B separate [C, N] arrays — deliberately never
    stacked into a [B, C, N] operand: the TPU gather rate collapses
    superlinearly with table footprint (measured on v5e: 0.127 ms at
    76800 lanes -> 34 ms at 8x76800; tools/gather_probe.py), and slices of
    a stacked array inherit the stacked buffer's layout, so only gathers on
    standalone buffers run at the single-stream rate (~0.2 ms/stream at
    B=8 vs 0.7 batched / 4.3 flat).

    Unbatched semantics: ``tables[stream][:, idx]`` (a ``lax.switch``).

    CONTRACT for the vmapped form (the lockstep multistream engine): the
    vmapped axis must iterate the tables in tuple order — ``stream`` MUST
    be ``jnp.arange(len(tables))`` along the batch axis.  The batching rule
    unrolls one standalone gather per table and cannot inspect the traced
    ``stream`` values to verify this.
    """
    branches = [lambda i, t=t: t[:, i] for t in tables]
    return jax.lax.switch(stream, branches, idx)


@gather_columns_multi.def_vmap
def _gather_columns_multi_vmap(axis_size, in_batched, tables, stream, idx):
    tables_b, stream_b, idx_b = in_batched
    if any(jax.tree.leaves(tables_b)):
        raise NotImplementedError(
            "gather_columns_multi: tables must stay unbatched standalone "
            "arrays (that is the whole point — see docstring)"
        )
    if not (stream_b and idx_b):
        raise NotImplementedError(
            "gather_columns_multi: stream and idx must be batched together"
        )
    if axis_size != len(tables):
        raise ValueError(
            f"gather_columns_multi: vmap axis size {axis_size} != "
            f"{len(tables)} tables (the batch axis must run the tuple)"
        )
    out = jnp.stack([tables[b][:, idx[b]] for b in range(axis_size)])
    return out, True


def bilinear_sample_accel(accel, u, v):
    """Sample the [H, W, 8] acceleration tensor at float coords (u, v) [N].

    Returns ``(values [N, 8], valid [N])``.  Bounds follow the reference's
    ``inImage(x, y) && inImage(x+1, y+1)`` test
    (dense_tracking_impl.cpp:78), i.e. 0 <= u < W-1 and 0 <= v < H-1 so the
    2x2 support is fully inside the image.
    """
    h, w, c = accel.shape
    in_bounds = (u >= 0.0) & (u < w - 1) & (v >= 0.0) & (v < h - 1)

    u = jnp.clip(u, 0.0, w - 1.001)
    v = jnp.clip(v, 0.0, h - 1.001)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    x1w = u - x0
    y1w = v - y0
    x0w = 1.0 - x1w
    y0w = 1.0 - y1w

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    flat = accel.reshape(h * w, c)
    a00 = flat[y0i * w + x0i]
    a10 = flat[y0i * w + x1i]
    a01 = flat[y1i * w + x0i]
    a11 = flat[y1i * w + x1i]

    values = (a00 * x0w[:, None] + a10 * x1w[:, None]) * y0w[:, None] + (
        a01 * x0w[:, None] + a11 * x1w[:, None]
    ) * y1w[:, None]

    neighbors_valid = (
        (a00[:, VALID_CHANNEL] > 0.5)
        & (a10[:, VALID_CHANNEL] > 0.5)
        & (a01[:, VALID_CHANNEL] > 0.5)
        & (a11[:, VALID_CHANNEL] > 0.5)
    )
    return values, in_bounds & neighbors_valid


def build_quad_table(accel):
    """[H, W, 8] acceleration tensor -> [H*W, 32] quad table where row i
    packs the 8 channels of pixels (i, i+1, i+W, i+W+1).

    One gathered row carries a pixel's whole 2x2 bilinear support, so the
    warp needs ONE gather instead of four — the TPU analog of the
    reference's aligned two-pixel SSE loads (dense_tracking_impl.cpp:84-90).
    Rows near the right/bottom borders wrap into the next image row; those
    lanes are never used because the bounds test already excludes them.
    """
    h, w, c = accel.shape
    flat = accel.reshape(h * w, c)
    right = jnp.roll(flat, -1, axis=0)
    down = jnp.roll(flat, -w, axis=0)
    down_right = jnp.roll(flat, -(w + 1), axis=0)
    return jnp.concatenate([flat, right, down, down_right], axis=1)


def bilinear_sample_quad(quad, shape, u, v):
    """Bilinear sampling through the quad table (one gather per pixel).

    ``shape`` is the source image (H, W); semantics identical to
    :func:`bilinear_sample_accel`.
    """
    h, w = shape
    in_bounds = (u >= 0.0) & (u < w - 1) & (v >= 0.0) & (v < h - 1)

    u = jnp.clip(u, 0.0, w - 1.001)
    v = jnp.clip(v, 0.0, h - 1.001)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    x1w = u - x0
    y1w = v - y0
    x0w = 1.0 - x1w
    y0w = 1.0 - y1w

    idx = y0.astype(jnp.int32) * w + x0.astype(jnp.int32)
    rows = quad[jnp.clip(idx, 0, quad.shape[0] - 1)]  # [N, 32]
    a00, a10, a01, a11 = rows[:, :8], rows[:, 8:16], rows[:, 16:24], rows[:, 24:32]

    values = (a00 * x0w[:, None] + a10 * x1w[:, None]) * y0w[:, None] + (
        a01 * x0w[:, None] + a11 * x1w[:, None]
    ) * y1w[:, None]

    neighbors_valid = (
        (a00[:, VALID_CHANNEL] > 0.5)
        & (a10[:, VALID_CHANNEL] > 0.5)
        & (a01[:, VALID_CHANNEL] > 0.5)
        & (a11[:, VALID_CHANNEL] > 0.5)
    )
    return values, in_bounds & neighbors_valid


def build_quad_table_cm(accel_cm, width: int):
    """Channel-major quad table [32, H*W]: rows 0-7 are the pixel's 8
    channels, 8-15 its right neighbor, 16-23 below, 24-31 below-right.

    Built from the [8, H*W] acceleration pack with three lane-rolls — no
    channel-minor materialization (see build_acceleration_cm's layout
    note).  Border wrap semantics identical to :func:`build_quad_table`.
    """
    right = jnp.roll(accel_cm, -1, axis=1)
    down = jnp.roll(accel_cm, -width, axis=1)
    down_right = jnp.roll(accel_cm, -(width + 1), axis=1)
    return jnp.concatenate([accel_cm, right, down, down_right], axis=0)


def bilinear_sample_quad_cm(quad_cm, shape, u, v, lane_offset=None, stream_index=None):
    """Bilinear sampling through the channel-major quad table: ONE column
    gather of [32, N] brings each pixel's whole 2x2 support; the result
    stays channel-major [8, N].  Semantics identical to
    :func:`bilinear_sample_quad`.

    ``quad_cm`` is either one [32, N] table, or — for lockstep stream
    batching — a TUPLE of per-stream standalone tables selected by
    ``stream_index`` (see :func:`gather_columns_multi` for why the tables
    must never be stacked).  ``lane_offset`` supports the alternative FLAT
    form: a [32, B*N] lane-concatenated table indexed at
    ``lane_offset = b*N`` (only viable for SMALL total tables — the gather
    rate collapses superlinearly with table footprint, gather_probe.py).
    """
    h, w = shape
    in_bounds = (u >= 0.0) & (u < w - 1) & (v >= 0.0) & (v < h - 1)

    u = jnp.clip(u, 0.0, w - 1.001)
    v = jnp.clip(v, 0.0, h - 1.001)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    x1w = u - x0
    y1w = v - y0
    x0w = 1.0 - x1w
    y0w = 1.0 - y1w

    idx = y0.astype(jnp.int32) * w + x0.astype(jnp.int32)
    idx = jnp.clip(idx, 0, h * w - 1)
    if isinstance(quad_cm, (tuple, list)):
        if stream_index is None:
            raise ValueError("tuple quad table requires stream_index")
        cols = gather_columns_multi(tuple(quad_cm), stream_index, idx)
    else:
        if lane_offset is not None:
            idx = idx + lane_offset
        cols = gather_columns(quad_cm, idx)  # [32, N]
    a00, a10, a01, a11 = cols[:8], cols[8:16], cols[16:24], cols[24:32]

    values = (a00 * x0w + a10 * x1w) * y0w + (a01 * x0w + a11 * x1w) * y1w

    neighbors_valid = (
        (a00[VALID_CHANNEL] > 0.5)
        & (a10[VALID_CHANNEL] > 0.5)
        & (a01[VALID_CHANNEL] > 0.5)
        & (a11[VALID_CHANNEL] > 0.5)
    )
    return values, in_bounds & neighbors_valid


def bilinear_with_depth_buffer(intensity, depth, depth_valid, u, v, z_expected):
    """Depth-buffer-aware bilinear interpolation of an intensity image.

    TPU-native port of Interpolation::bilinearWithDepthBuffer
    (dvo_core/src/core/interpolation.cpp:55-110; SSE twin
    rgbd_image_sse.cpp:51-108): a 2x2 neighbor only contributes if its
    depth is valid and not more than 5 cm in FRONT of the expected depth
    ``z_expected`` (``depth > z - 0.05``) — so foreground occluders never
    blend into a background sample at depth discontinuities.  Weights are
    renormalized over the contributing neighbors; a sample with no
    contributor is invalid.

    ``intensity``/``depth``/``depth_valid`` are [H, W]; ``u``/``v``/
    ``z_expected`` are [N].  Returns ``(values [N], valid [N])``.
    """
    h, w = intensity.shape
    in_bounds = (u >= 0.0) & (u < w - 1) & (v >= 0.0) & (v < h - 1)

    u = jnp.clip(u, 0.0, w - 1.001)
    v = jnp.clip(v, 0.0, h - 1.001)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    x1w = u - x0
    y1w = v - y0
    x0w = 1.0 - x1w
    y0w = 1.0 - y1w

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    flat_i = intensity.reshape(h * w)
    flat_z = depth.reshape(h * w)
    flat_ok = depth_valid.reshape(h * w)
    z_eps = z_expected - 0.05  # the reference's 5 cm depth buffer

    val = jnp.zeros_like(u)
    weight_sum = jnp.zeros_like(u)
    for yi, xi, wgt in (
        (y0i, x0i, x0w * y0w),
        (y0i, x1i, x1w * y0w),
        (y1i, x0i, x0w * y1w),
        (y1i, x1i, x1w * y1w),
    ):
        idx = yi * w + xi
        contributes = flat_ok[idx] & (flat_z[idx] > z_eps)
        wgt = jnp.where(contributes, wgt, 0.0)
        val = val + wgt * flat_i[idx]
        weight_sum = weight_sum + wgt

    valid = in_bounds & (weight_sum > 0.0)
    values = jnp.where(valid, val / jnp.maximum(weight_sum, 1e-12), 0.0)
    return values, valid


def bilinear_sample_image(img, u, v):
    """Plain bilinear sampling of a single-channel [H, W] image at (u, v).

    Scalar analog of Interpolation::bilinear (interpolation.cpp:40-53);
    out-of-bounds samples return 0 with ``valid`` False.
    """
    h, w = img.shape
    accel = img[..., None]
    padded = jnp.concatenate(
        [accel] * 6 + [jnp.ones_like(accel), jnp.zeros_like(accel)], axis=-1
    )
    values, _ = bilinear_sample_accel(padded, u, v)
    in_bounds = (u >= 0.0) & (u < w - 1) & (v >= 0.0) & (v < h - 1)
    return jnp.where(in_bounds, values[:, 0], 0.0), in_bounds
