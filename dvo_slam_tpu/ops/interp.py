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

import functools

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
        # vs 0.27 ms/iter — tools/gather_probe.py dualidx vs dualbar).
        # The barrier keeps each gather an UNFUSED op with a materialized
        # output: a gather fused into its consumer arithmetic lowers ~3x
        # slower at this shape (tuple vs tuplefull in the probe).
        out = jnp.stack(
            [
                jax.lax.optimization_barrier(table[:, idx[b]])
                for b in range(axis_size)
            ]
        )
        return out, True
    # batched table, shared indices
    return table[:, :, idx], True


def bilinear_sample_accel(accel, u, v, z_expected=None):
    """Sample the [H, W, 8] acceleration tensor at float coords (u, v) [N].

    Returns ``(values [N, 8], valid [N])``.  Bounds follow the reference's
    ``inImage(x, y) && inImage(x+1, y+1)`` test
    (dense_tracking_impl.cpp:78), i.e. 0 <= u < W-1 and 0 <= v < H-1 so the
    2x2 support is fully inside the image.

    With ``z_expected`` [N] the sample is depth-buffered (the reference's
    5 cm rule, interpolation.cpp:55-110 — see :func:`_sample_quad_cols`);
    this is the XLA-oracle twin of the fused quad path's form.
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

    if z_expected is None:
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

    z_eps = z_expected - DEPTH_BUFFER_M
    keep = lambda a: (a[:, VALID_CHANNEL] > 0.5) & (a[:, 1] > z_eps)
    w00 = x0w * y0w * keep(a00)
    w10 = x1w * y0w * keep(a10)
    w01 = x0w * y1w * keep(a01)
    w11 = x1w * y1w * keep(a11)
    wsum = w00 + w10 + w01 + w11
    values = (
        a00 * w00[:, None] + a10 * w10[:, None]
        + a01 * w01[:, None] + a11 * w11[:, None]
    ) / jnp.maximum(wsum, 1e-6)[:, None]
    return values, in_bounds & (wsum > 1e-6)


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


def bilinear_sample_quad(quad, shape, u, v, z_expected=None):
    """Bilinear sampling through the quad table (one gather per pixel).

    ``shape`` is the source image (H, W); semantics identical to
    :func:`bilinear_sample_accel` (incl. the optional depth buffer).
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

    if z_expected is None:
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

    z_eps = z_expected - DEPTH_BUFFER_M
    keep = lambda a: (a[:, VALID_CHANNEL] > 0.5) & (a[:, 1] > z_eps)
    w00 = x0w * y0w * keep(a00)
    w10 = x1w * y0w * keep(a10)
    w01 = x0w * y1w * keep(a01)
    w11 = x1w * y1w * keep(a11)
    wsum = w00 + w10 + w01 + w11
    values = (
        a00 * w00[:, None] + a10 * w10[:, None]
        + a01 * w01[:, None] + a11 * w11[:, None]
    ) / jnp.maximum(wsum, 1e-6)[:, None]
    return values, in_bounds & (wsum > 1e-6)


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


DEPTH_BUFFER_M = 0.05  # reference: interpolation.cpp:71 (z_eps = z - 0.05)


def _sample_quad_cols(quad_cm, shape, u, v, z_expected=None, lane_offset=None):
    """Unbatched full bilinear sample through ONE [32, N] quad table —
    the shared math of every quad-sampling form (gather + combine +
    validity; semantics of :func:`bilinear_sample_quad`).

    With ``z_expected`` the sample is DEPTH-BUFFERED (the reference's
    5 cm rule, interpolation.cpp:55-110): a 2x2 neighbor contributes only
    if it is valid and its depth is not more than 5 cm in FRONT of the
    expected depth, with weights renormalized over the contributors — so
    a foreground occluder never blends into a background sample at a
    depth discontinuity.  The reference applies this only in its scalar/
    SSE warp kernels (rgbd_image_sse.cpp:51-108), NOT in the hot
    residual kernel (dense_tracking_impl.cpp:84-106 is plain bilinear);
    here the quad row already carries all four neighbor depths in
    registers, so the hot path gets the rule for free — measured on the
    occluded synthetic scene it cuts odometry ATE ~3x (BASELINE.md).
    When all four neighbors contribute the weights sum to 1 and the
    result is bit-identical to plain bilinear."""
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
    if lane_offset is not None:
        idx = idx + lane_offset
    cols = quad_cm[:, idx]  # [32, N]
    a00, a10, a01, a11 = cols[:8], cols[8:16], cols[16:24], cols[24:32]

    if z_expected is None:
        values = (a00 * x0w + a10 * x1w) * y0w + (a01 * x0w + a11 * x1w) * y1w
        neighbors_valid = (
            (a00[VALID_CHANNEL] > 0.5)
            & (a10[VALID_CHANNEL] > 0.5)
            & (a01[VALID_CHANNEL] > 0.5)
            & (a11[VALID_CHANNEL] > 0.5)
        )
        return values, in_bounds & neighbors_valid

    z_eps = z_expected - DEPTH_BUFFER_M
    keep = lambda a: (a[VALID_CHANNEL] > 0.5) & (a[1] > z_eps)
    w00 = x0w * y0w * keep(a00)
    w10 = x1w * y0w * keep(a10)
    w01 = x0w * y1w * keep(a01)
    w11 = x1w * y1w * keep(a11)
    wsum = w00 + w10 + w01 + w11
    values = (a00 * w00 + a10 * w10 + a01 * w01 + a11 * w11) / jnp.maximum(
        wsum, 1e-6
    )
    return values, in_bounds & (wsum > 1e-6)


@functools.lru_cache(maxsize=None)
def _quad_sampler(shape, n_tables: int, use_z: bool = False):
    """custom_vmap'd full quad sampling: (tables, stream, u, v) ->
    (values [8, N], valid [N]).

    The batching boundary sits around the WHOLE sample (gather + bilinear
    combine + validity), not just the gather: when a stream batch is
    vmapped, the rule below unrolls one complete single-stream-shaped
    sample per stream and stacks the finished [8, N] outputs.  Measured on
    v5e at the L1 shape (B=8): this form runs at 1.6 ms/iter, while every
    alternative lowering loses bigly — one flat [32, B*N] gather 34 ms,
    per-stream gathers on slices of a stacked [B, 32, N] operand 5.6 ms,
    and (the subtle one) per-stream gathers whose combine+REDUCE fuse into
    the gather 4.8 ms (tools/gather_probe.py: tuple / flat / batched /
    tuplefull).  Two invariants follow: tables stay STANDALONE buffers
    (never slices of a stacked array), and each gather's output feeds only
    its own stream's combine, stacked afterwards.

    ``n_tables`` disambiguates the three batched layouts: B per-stream
    standalone tables (lockstep multistream), one shared table sampled by
    B index streams (the batch-2 dual keyframe/odometry match), or one
    BATCHED [B, 32, N] table stack (proposal validation waves).

    CONTRACT: with n_tables == axis_size the vmapped axis must iterate the
    tables in tuple order (``stream`` must be ``arange`` along the batch
    axis) — the rule cannot inspect the traced stream values.  Callers
    build that axis with :func:`lockstep_stream_indices`, the one
    sanctioned construction site; the rule additionally rejects an
    UNBATCHED stream against per-stream tables (a guaranteed violation).
    """

    @jax.custom_batching.custom_vmap
    def sample(tables, stream, u, v, z):
        # use_z is static: without it z is a dummy operand and the math is
        # bit-identical to the plain (all-4-valid) bilinear form
        zz = z if use_z else None
        if n_tables == 1:
            values, valid = _sample_quad_cols(tables[0], shape, u, v, zz)
        else:
            values, valid = jax.lax.switch(
                stream,
                [
                    functools.partial(
                        _one_table_sample, t, shape, use_z
                    )
                    for t in tables
                ],
                u,
                v,
                z,
            )
        return values, valid

    @sample.def_vmap
    def _rule(axis_size, in_batched, tables, stream, u, v, z):
        tables_b = any(jax.tree.leaves(in_batched[0]))
        u_b, v_b, z_b = in_batched[2], in_batched[3], in_batched[4]
        # without use_z the z operand is a statically-ignored dummy whose
        # batching is irrelevant (zeros_like(u) under vmap is an
        # UNBATCHED constant — depth_buffered_sampling=False hits this)
        if not (u_b and v_b and (z_b or not use_z)):
            raise NotImplementedError(
                "quad sampling: u, v and z must be batched together"
            )
        vals, oks = [], []
        for b in range(axis_size):
            if tables_b:
                table = tables[0][b]  # stacked [B, 32, N] (wave batching)
            elif n_tables == axis_size:
                if not in_batched[1]:
                    raise ValueError(
                        "quad sampling: per-stream standalone tables need "
                        "the stream axis batched in lockstep "
                        "(lockstep_stream_indices) — an unbatched stream "
                        "cannot iterate the table tuple"
                    )
                table = tables[b]  # per-stream standalone tables
            elif n_tables == 1:
                table = tables[0]  # one shared table, B index streams
            else:
                raise ValueError(
                    f"quad sampling: {n_tables} tables cannot serve a "
                    f"batch of {axis_size} streams"
                )
            val, ok = _sample_quad_cols(
                table, shape, u[b], v[b],
                (z[b] if z_b else z) if use_z else None,
            )
            vals.append(val)
            oks.append(ok)
        return (jnp.stack(vals), jnp.stack(oks)), (True, True)

    return sample


def _one_table_sample(table, shape, use_z, u, v, z):
    """lax.switch branch body: one standalone-table sample (uniform
    (u, v, z) arity; z ignored unless the sampler was built with use_z)."""
    return _sample_quad_cols(table, shape, u, v, z if use_z else None)


def lockstep_stream_indices(n: int) -> jnp.ndarray:
    """The sanctioned stream axis for standalone-table lockstep sampling.

    :func:`_quad_sampler`'s batching rule selects standalone tables
    POSITIONALLY (``tables[b]``) — it cannot inspect traced stream values
    — so the vmapped stream axis MUST be ``arange(n)`` in table-tuple
    order.  Building it here gives the contract one construction site per
    caller instead of a docstring-only promise: a permuted or gathered
    stream axis would silently sample the wrong tables.
    """
    return jnp.arange(n, dtype=jnp.int32)


def bilinear_sample_quad_cm(quad_cm, shape, u, v, z_expected=None,
                            lane_offset=None, stream_index=None):
    """Bilinear sampling through the channel-major quad table: ONE column
    gather of [32, N] brings each pixel's whole 2x2 support; the result
    stays channel-major [8, N].  Semantics identical to
    :func:`bilinear_sample_quad`, depth-buffered when ``z_expected`` is
    given (see :func:`_sample_quad_cols`).

    ``quad_cm`` is either one [32, N] table, or — for lockstep stream
    batching — a TUPLE of per-stream standalone tables selected by
    ``stream_index``.  Under ``vmap`` the sampling batches through the
    :func:`_quad_sampler` rule (full per-stream samples, unrolled — see
    its docstring for the measured lowerings this avoids).  The
    ``lane_offset`` flat form ([32, B*N] lane-concatenated table) remains
    for small tables only.
    """
    if lane_offset is not None:
        return _sample_quad_cols(quad_cm, shape, u, v, z_expected, lane_offset)
    use_z = z_expected is not None
    if not use_z:
        # uniform sampler arity: a dummy z operand, statically ignored
        z_expected = jnp.zeros_like(u)
    if isinstance(quad_cm, (tuple, list)):
        if stream_index is None:
            raise ValueError("tuple quad table requires stream_index")
        sampler = _quad_sampler(tuple(shape), len(quad_cm), use_z)
        return sampler(tuple(quad_cm), stream_index, u, v, z_expected)
    sampler = _quad_sampler(tuple(shape), 1, use_z)
    if stream_index is None:
        stream_index = jnp.zeros((), jnp.int32)
    return sampler((quad_cm,), stream_index, u, v, z_expected)


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
