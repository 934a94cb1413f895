"""Pinhole camera model and per-pyramid-level intrinsics.

TPU-native equivalent of the reference's IntrinsicMatrix / RgbdCamera(Pyramid)
(reference: dvo_core/src/core/intrinsic_matrix.cpp:47-93,
dvo_core/src/core/rgbd_image.cpp:186-204, 283-296).

Intrinsics are a hashable NamedTuple of Python floats so they can be passed
as static jit arguments — one compilation per camera, which matches the
deployment reality (one camera per stream).  The reference's precomputed
"unprojection template" is unnecessary under XLA: unprojection is an
elementwise expression that fuses into its consumers for free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    """Pinhole intrinsics (fx, fy, ox, oy), hashable/static."""

    fx: float
    fy: float
    ox: float
    oy: float

    def scale(self, factor: float) -> "Intrinsics":
        """Uniform scaling of the whole K matrix, as the reference does for
        pyramid levels (intrinsic_matrix.cpp:89-92 scales offsets too)."""
        return Intrinsics(
            self.fx * factor, self.fy * factor, self.ox * factor, self.oy * factor
        )

    def at_level(self, level: int) -> "Intrinsics":
        """Intrinsics for pyramid level ``level`` (halved per level,
        reference: rgbd_image.cpp:283-296)."""
        return self.scale(0.5**level)

    def matrix(self, dtype=jnp.float32):
        return jnp.array(
            [[self.fx, 0.0, self.ox], [0.0, self.fy, self.oy], [0.0, 0.0, 1.0]],
            dtype=dtype,
        )


# Hard-coded TUM RGB-D intrinsics, as used by the reference benchmark driver
# (reference: dvo_benchmark/src/benchmark_slam.cpp:384-392).
TUM_FR1 = Intrinsics(517.3, 516.5, 318.6, 255.3)
TUM_FR2 = Intrinsics(520.9, 521.0, 325.1, 249.7)
TUM_FR3 = Intrinsics(535.4, 539.2, 320.1, 247.6)
TUM_DEFAULT = Intrinsics(525.0, 525.0, 319.5, 239.5)


def unproject(depth, intrinsics: Intrinsics):
    """Back-project a depth map [H, W] to camera-frame points [H, W, 3].

    Replaces RgbdCamera::buildPointCloud (rgbd_image.cpp:245-262); the
    per-pixel template (x-ox)/fx is generated inline via iota and fused.
    """
    h, w = depth.shape
    u = jnp.arange(w, dtype=depth.dtype)[None, :]
    v = jnp.arange(h, dtype=depth.dtype)[:, None]
    x = (u - intrinsics.ox) / intrinsics.fx * depth
    y = (v - intrinsics.oy) / intrinsics.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def project(points, intrinsics: Intrinsics):
    """Project camera-frame points [..., 3] to pixel coordinates [..., 2].

    Callers must mask non-positive depths; the division is guarded to keep
    gradients and masked lanes finite.
    """
    z = points[..., 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    u = points[..., 0] / z_safe * intrinsics.fx + intrinsics.ox
    v = points[..., 1] / z_safe * intrinsics.fy + intrinsics.oy
    return jnp.stack([u, v], axis=-1)
