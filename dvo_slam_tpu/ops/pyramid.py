"""RGB-D image pyramids as dense masked tensors.

TPU-native replacement for the reference's RgbdImage / RgbdImagePyramid
(reference: dvo_core/src/core/rgbd_image.cpp).  Design translations:

  * NaN-as-invalid sentinel -> explicit boolean validity masks
    (TPU kernels prefer masks; see SURVEY.md section 7 "hard parts" 1).
  * 8-channel interleaved "acceleration structure"
    (rgbd_image.cpp:534-543) -> a stacked [H, W, 8] tensor with a validity
    channel, built by :func:`build_acceleration`.
  * Lazy per-level construction -> one fused jit building all levels; at
    640x480 the whole pyramid is < 10 MB and XLA fuses the downsample +
    derivative chains into a couple of passes.

Channel layout of the acceleration tensor (matching the reference order
i, z, idx, idy, zdx, zdy at rgbd_image.h:39-89):
  0: intensity            4: depth x-derivative
  1: depth                5: depth y-derivative
  2: intensity x-deriv    6: validity (1.0 where z, zdx, zdy all valid)
  3: intensity y-deriv    7: zero padding
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PyramidLevel(NamedTuple):
    """One pyramid level of an RGB-D frame, dense with masks.

    ``intensity`` uses the reference's 0..255 float grayscale convention
    (benchmark_slam.cpp:46-93 converts to CV_32F without normalizing).
    ``depth`` is meters with 0.0 at invalid pixels; ``valid`` marks finite
    depth; ``zvalid`` additionally requires both depth derivatives valid
    (the selection predicate's finite-z/zdx/zdy test,
    point_selection.h:49-67).
    """

    intensity: jax.Array  # [H, W] float32
    depth: jax.Array  # [H, W] float32, 0 where invalid
    valid: jax.Array  # [H, W] bool
    idx: jax.Array  # [H, W] float32, d(intensity)/dx
    idy: jax.Array  # [H, W] float32
    zdx: jax.Array  # [H, W] float32, 0 where invalid
    zdy: jax.Array  # [H, W] float32
    zvalid: jax.Array  # [H, W] bool

    @property
    def shape(self) -> Tuple[int, int]:
        return self.intensity.shape


def convert_raw_depth(raw_depth_u16, depth_scale: float = 5000.0):
    """Raw 16-bit depth -> (meters, valid) with 0 marking invalid.

    Replaces SurfacePyramid::convertRawDepthImage
    (reference: dvo_core/src/core/surface_pyramid.cpp:45-63; TUM scale
    1/5000, zero raw depth = invalid).
    """
    raw = jnp.asarray(raw_depth_u16)
    valid = raw > 0
    depth = jnp.where(valid, raw.astype(jnp.float32) / depth_scale, 0.0)
    return depth, valid


def central_diff_x(img):
    """d(img)/dx by central differences with clamped borders.

    Matches RgbdImage::calculateDerivativeX (rgbd_image.cpp:419-443):
    0.5 * (img[y, min(x+1, W-1)] - img[y, max(x-1, 0)]).
    """
    padded = jnp.pad(img, ((0, 0), (1, 1)), mode="edge")
    return 0.5 * (padded[:, 2:] - padded[:, :-2])


def central_diff_y(img):
    """d(img)/dy, same scheme as :func:`central_diff_x` along rows
    (reference: rgbd_image.cpp:445-489)."""
    padded = jnp.pad(img, ((1, 1), (0, 0)), mode="edge")
    return 0.5 * (padded[2:, :] - padded[:-2, :])


# A depth central-difference larger than this (meters per pixel) spans a
# DISCONTINUITY, not a surface: the "derivative" is the depth gap between
# two different objects and poisons the geometric Jacobian J_Z = dZ . Jw
# (residuals.py) with normal-weighted garbage for every point adjacent to
# an occlusion edge.  The reference keeps such points (its selection
# predicate only requires FINITE zdx/zdy, point_selection.h:49-67, and
# even selects on large depth gradient) — measured on the occluded
# synthetic scene this gate alone cuts odometry ATE ~10x
# (0.0186 -> 0.0018 m, tools/hard_ate_probe.py; BASELINE.md).  At
# 0.3 m/px a real surface would be inclined ~89.8 deg from fronto-
# parallel at 640x480 TUM intrinsics — only discontinuities qualify.
MAX_DEPTH_DERIVATIVE_M = 0.3


def _masked_central_diff(depth, valid, max_derivative=MAX_DEPTH_DERIVATIVE_M):
    """Depth derivatives with NaN-propagation semantics made explicit:
    a derivative is valid only if both clamped neighbors are valid AND
    the difference does not span a depth discontinuity (see
    MAX_DEPTH_DERIVATIVE_M; pass 0 to disable the gate)."""
    px = jnp.pad(depth, ((0, 0), (1, 1)), mode="edge")
    vx = jnp.pad(valid, ((0, 0), (1, 1)), mode="edge")
    zdx = 0.5 * (px[:, 2:] - px[:, :-2])
    zdx_valid = vx[:, 2:] & vx[:, :-2]
    py = jnp.pad(depth, ((1, 1), (0, 0)), mode="edge")
    vy = jnp.pad(valid, ((1, 1), (0, 0)), mode="edge")
    zdy = 0.5 * (py[2:, :] - py[:-2, :])
    zdy_valid = vy[2:, :] & vy[:-2, :]
    if max_derivative > 0:
        zdx_valid &= jnp.abs(zdx) <= max_derivative
        zdy_valid &= jnp.abs(zdy) <= max_derivative
    zdx = jnp.where(zdx_valid, zdx, 0.0)
    zdy = jnp.where(zdy_valid, zdy, 0.0)
    return zdx, zdy, zdx_valid & zdy_valid


def _mean_operators(h, w, dtype):
    """0.5-weighted two-hot averaging matrices for the 2x2 mean downsample
    (same MXU-decimation rationale as _decimation_operators)."""
    h2, w2 = h // 2, w // 2
    i2 = jnp.arange(h2)
    rows = (
        jnp.zeros((h2, h), dtype)
        .at[i2, 2 * i2].set(0.5)
        .at[i2, 2 * i2 + 1].set(0.5)
    )
    j2 = jnp.arange(w2)
    cols = (
        jnp.zeros((w, w2), dtype)
        .at[2 * j2, j2].set(0.5)
        .at[2 * j2 + 1, j2].set(0.5)
    )
    return rows, cols


def downsample_intensity(img):
    """2x2 mean downsample (pyrDownMeanSmooth, rgbd_image.cpp:38-55),
    expressed as row/column averaging matmuls in full f32 (see
    downsample_depth for the layout + precision rationale)."""
    h, w = img.shape
    rows, cols = _mean_operators(h, w, img.dtype)
    mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    return mm(mm(rows, img), cols)


def _decimation_operators(h, w, dtype):
    """One-hot row/column decimation matrices (pick every even pixel).

    Stride-2 slicing on the TPU lane axis lowers to a slow cross-lane
    gather (~0.8 ms for a 480x640 slice — measured, the single largest
    per-frame cost in the scanned tracker); as matmuls the MXU does the
    same decimation in microseconds.  The operators are constants, hoisted
    out of any scan/loop by XLA."""
    h2, w2 = h // 2, w // 2
    rows = jnp.zeros((h2, h), dtype).at[jnp.arange(h2), 2 * jnp.arange(h2)].set(1)
    cols = jnp.zeros((w, w2), dtype).at[2 * jnp.arange(w2), jnp.arange(w2)].set(1)
    return rows, cols


def downsample_depth(depth, valid):
    """Subsample every second pixel (pyrDownSubsample, rgbd_image.cpp:127-139
    — chosen for depth at rgbd_image.cpp:167-169 to avoid mixing surfaces).
    Output is floor(h/2) x floor(w/2), matching the mean downsampler on
    odd-sized levels.  Expressed as one-hot matmul decimation (exact pick
    of the even pixels) — see _decimation_operators for why not slicing."""
    h, w = depth.shape
    rows, cols = _decimation_operators(h, w, depth.dtype)
    # precision=HIGHEST: the MXU's default bf16 passes would truncate the
    # depth VALUES (bf16 quantizes 2.4 m to ~8 mm steps); highest runs the
    # one-hot products in full f32, making the decimation bit-exact
    mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    depth_d = mm(mm(rows, depth), cols)
    valid_d = mm(mm(rows, valid.astype(depth.dtype)), cols) > 0.5
    return depth_d, valid_d


def make_level(
    intensity, depth, valid,
    max_depth_derivative: float = MAX_DEPTH_DERIVATIVE_M,
) -> PyramidLevel:
    """Assemble one pyramid level: derivatives + validity masks.

    Replaces RgbdImage::calculateDerivatives + the validity bookkeeping the
    reference encodes as NaNs (rgbd_image.cpp:404-417).
    ``max_depth_derivative`` gates discontinuity-spanning depth
    derivatives (MAX_DEPTH_DERIVATIVE_M; 0 disables — the reference's
    exact finite-only behavior).
    """
    zdx, zdy, deriv_valid = _masked_central_diff(depth, valid, max_depth_derivative)
    return PyramidLevel(
        intensity=intensity,
        depth=depth,
        valid=valid,
        idx=central_diff_x(intensity),
        idy=central_diff_y(intensity),
        zdx=zdx,
        zdy=zdy,
        zvalid=valid & deriv_valid,
    )


def build_pyramid(
    intensity, depth, valid, num_levels: int, skip_below: int = 0
) -> Tuple[PyramidLevel, ...]:
    """Build a ``num_levels``-deep pyramid from level-0 tensors.

    Level sizes halve each level (intensity mean-downsampled, depth
    subsampled), mirroring RgbdImagePyramid::build (rgbd_image.cpp:156-172).

    ``skip_below`` replaces levels finer than the solver's last level with
    ``None`` (the reference's lazy per-level build, rgbd_image.cpp:156-172,
    taken to its static conclusion): their derivative/mask kernels are
    never emitted and — crucially for scanned whole-sequence tracking —
    the full-resolution channels never enter the loop carry.  A 3->1
    solve at 640x480 drops level 0 entirely: its tensors exist only as
    inputs to the level-1 downsample and fuse away.
    """
    levels = [make_level(intensity, depth, valid) if skip_below <= 0 else None]
    for lvl in range(1, num_levels):
        intensity = downsample_intensity(intensity)
        depth, valid = downsample_depth(depth, valid)
        levels.append(make_level(intensity, depth, valid) if lvl >= skip_below else None)
    return tuple(levels)


def build_acceleration(level: PyramidLevel):
    """Pack a level into the [H, W, 8] sampling tensor.

    Replaces RgbdImage::buildAccelerationStructure (rgbd_image.cpp:534-543);
    channel 6 carries the combined z/zdx/zdy validity that the reference
    encodes as NaNs and tests after interpolation
    (dense_tracking_impl.cpp:108 checks channels 1, 4, 5)."""
    zero = jnp.zeros_like(level.intensity)
    return jnp.stack(
        [
            level.intensity,
            level.depth,
            level.idx,
            level.idy,
            level.zdx,
            level.zdy,
            level.zvalid.astype(level.intensity.dtype),
            zero,
        ],
        axis=-1,
    )


def build_acceleration_cm(level: PyramidLevel):
    """Channel-MAJOR acceleration pack [8, H*W] for the fused solver path.

    Same channels as :func:`build_acceleration`, transposed so pixels ride
    the TPU's 128-lane minor axis: a channel-minor [H, W, 8] array wastes
    15/16 of every (8, 128) tile (measured ~4x on the prepare stage,
    tools/hotpath4.py).  The [H, W, 8] form remains for the modular XLA
    oracle path and visualization."""
    n = level.intensity.size
    zero = jnp.zeros(n, level.intensity.dtype)
    return jnp.stack(
        [
            level.intensity.reshape(n),
            level.depth.reshape(n),
            level.idx.reshape(n),
            level.idy.reshape(n),
            level.zdx.reshape(n),
            level.zdy.reshape(n),
            level.zvalid.astype(level.intensity.dtype).reshape(n),
            zero,
        ]
    )


def selection_mask(
    level: PyramidLevel,
    intensity_derivative_threshold: float = 0.0,
    depth_derivative_threshold: float = 0.0,
):
    """Reference-point selection predicate as a dense boolean map.

    Matches ValidPointAndGradientThresholdPredicate::isPointOk
    (point_selection.h:49-67): finite z and depth derivatives, and any of
    the four derivative magnitudes strictly above its threshold.  Note the
    strict inequality: with the default zero thresholds, perfectly flat
    pixels (all four derivatives exactly 0) are excluded, as in the
    reference.
    """
    grad_ok = (
        (jnp.abs(level.idx) > intensity_derivative_threshold)
        | (jnp.abs(level.idy) > intensity_derivative_threshold)
        | (jnp.abs(level.zdx) > depth_derivative_threshold)
        | (jnp.abs(level.zdy) > depth_derivative_threshold)
    )
    return level.zvalid & grad_ok
