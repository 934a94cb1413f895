"""Occlusion-handling parity tests: depth-buffered bilinear interpolation
(interpolation.cpp:55-110), the advanced forward depth splat
(rgbd_image.cpp:723-781), and tracking across real depth discontinuities
on the occluded synthetic scene."""

import numpy as np
import jax.numpy as jnp
import pytest

from dvo_slam_tpu.ops import se3, warp
from dvo_slam_tpu.ops.camera import Intrinsics
from dvo_slam_tpu.ops.interp import bilinear_with_depth_buffer
from dvo_slam_tpu.ops.pyramid import build_pyramid
from dvo_slam_tpu.utils import synthetic, trajectory

K = Intrinsics(80.0, 80.0, 39.5, 29.5)
SHAPE = (60, 80)


def _oracle_depth_buffer(intensity, depth, valid, x, y, z):
    """NumPy port of Interpolation::bilinearWithDepthBuffer
    (interpolation.cpp:55-110) — the scalar/SSE twin-oracle pattern."""
    h, w = intensity.shape
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    x1, y1 = x0 + 1, y0 + 1
    if x1 >= w or y1 >= h or x0 < 0 or y0 < 0:
        return np.nan
    x1w = x - x0
    x0w = 1.0 - x1w
    y1w = y - y0
    y0w = 1.0 - y1w
    z_eps = z - 0.05
    val = 0.0
    total = 0.0
    for yi, xi, wgt in (
        (y0, x0, x0w * y0w),
        (y0, x1, x1w * y0w),
        (y1, x0, x0w * y1w),
        (y1, x1, x1w * y1w),
    ):
        if valid[yi, xi] and depth[yi, xi] > z_eps:
            val += wgt * intensity[yi, xi]
            total += wgt
    return val / total if total > 0 else np.nan


def test_depth_buffered_interp_matches_oracle():
    rng = np.random.default_rng(0)
    h, w = 24, 32
    intensity = rng.uniform(0, 255, (h, w)).astype(np.float32)
    # step depth image: foreground slab at 1m over a 2m background
    depth = np.full((h, w), 2.0, np.float32)
    depth[8:16, 10:20] = 1.0
    valid = rng.random((h, w)) > 0.1
    n = 300
    u = rng.uniform(-1.0, w + 1.0, n).astype(np.float32)
    v = rng.uniform(-1.0, h + 1.0, n).astype(np.float32)
    z = rng.uniform(0.8, 2.2, n).astype(np.float32)

    values, ok = bilinear_with_depth_buffer(
        jnp.asarray(intensity), jnp.asarray(depth), jnp.asarray(valid),
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(z),
    )
    values, ok = np.asarray(values), np.asarray(ok)
    for i in range(n):
        expect = _oracle_depth_buffer(intensity, depth, valid, u[i], v[i], z[i])
        if np.isnan(expect):
            assert not ok[i], f"sample {i} should be invalid"
        else:
            assert ok[i], f"sample {i} should be valid"
            np.testing.assert_allclose(values[i], expect, rtol=1e-5, atol=1e-4)


def test_depth_buffer_rejects_foreground_blend():
    """At an occlusion edge, the plain bilinear blends foreground into a
    background sample; the depth-buffered variant must return the pure
    background value."""
    intensity = np.zeros((8, 8), np.float32)
    depth = np.full((8, 8), 2.0, np.float32)
    intensity[:, 4:] = 200.0  # foreground bright
    depth[:, 4:] = 1.0  # foreground 1 m in front
    valid = np.ones((8, 8), bool)
    u = jnp.asarray([3.5], jnp.float32)  # straddles the edge
    v = jnp.asarray([3.0], jnp.float32)
    z = jnp.asarray([2.0], jnp.float32)  # expecting background depth
    val, ok = bilinear_with_depth_buffer(
        jnp.asarray(intensity), jnp.asarray(depth), jnp.asarray(valid), u, v, z
    )
    assert bool(ok[0])
    assert float(val[0]) == 0.0  # background only, no 200 blended in
    # expecting foreground depth keeps every neighbor (none is in front)
    z_fg = jnp.asarray([1.0], jnp.float32)
    val_fg, ok_fg = bilinear_with_depth_buffer(
        jnp.asarray(intensity), jnp.asarray(depth), jnp.asarray(valid), u, v, z_fg
    )
    assert bool(ok_fg[0]) and float(val_fg[0]) == 100.0  # plain blend


def _oracle_forward_advanced(depth, valid, k, T):
    """NumPy port of warpDepthForwardAdvanced (rgbd_image.cpp:723-781)."""
    h, w = depth.shape
    R, t = T[:3, :3], T[:3, 3]
    fx, fy, ox, oy = k.fx, k.fy, k.ox, k.oy
    z_factor1 = R[0, 0] + R[0, 1] * (fx / fy)
    x_factor1 = -R[2, 0] - R[2, 1] * (fx / fy)
    z_factor2 = R[1, 1] + R[1, 0] * (fy / fx)
    y_factor2 = -R[2, 1] - R[2, 0] * (fy / fx)
    out = np.full((h, w), np.inf, np.float64)
    for y in range(h):
        for x in range(w):
            if not valid[y, x]:
                continue
            z = float(depth[y, x])
            p = np.array([(x - ox) * z / fx, (y - oy) * z / fy, z])
            x_len = int(np.ceil(z_factor1 + x_factor1 * p[0] / p[2])) + 1
            y_len = int(np.ceil(z_factor2 + y_factor2 * p[1] / p[2])) + 1
            pt = R @ p + t
            zt = pt[2]
            xp = int(np.floor(pt[0] * fx / zt + ox))
            yp = int(np.floor(pt[1] * fy / zt + oy))
            for yy in range(max(yp, 0), min(yp + y_len, h)):
                for xx in range(max(xp, 0), min(xp + x_len, w)):
                    if out[yy, xx] > zt:
                        out[yy, xx] = zt
    ok = np.isfinite(out)
    return np.where(ok, out, 0.0), ok


def test_forward_depth_warp_advanced_matches_oracle():
    i, d, v = synthetic.render_frame(
        np.eye(4), K, SHAPE, scene=synthetic.occluded_scene()
    )
    T = np.asarray(
        se3.exp_se3(jnp.asarray([0.03, -0.01, 0.02, 0.02, -0.015, 0.01]))
    ).astype(np.float64)
    got_d, got_v = warp.warp_depth_forward_advanced(
        jnp.asarray(d), jnp.asarray(v), K, jnp.asarray(T, jnp.float32)
    )
    want_d, want_v = _oracle_forward_advanced(
        np.asarray(d, np.float64), v, K, T
    )
    got_d, got_v = np.asarray(got_d), np.asarray(got_v)
    assert (got_v == want_v).mean() > 0.999, "validity mismatch"
    both = got_v & want_v
    np.testing.assert_allclose(got_d[both], want_d[both], rtol=1e-4, atol=1e-4)


def test_occluded_scene_has_discontinuities():
    """The occluded scene must actually produce a big depth step (the
    property the two-plane scene lacks)."""
    i, d, v = synthetic.render_frame(
        np.eye(4), K, SHAPE, scene=synthetic.occluded_scene()
    )
    dx = np.abs(np.diff(d, axis=1))[v[:, 1:] & v[:, :-1]]
    assert dx.max() > 0.5, f"max depth step {dx.max()}"
    # the slab must cover a meaningful part of the image
    near = (d < 1.5) & v
    assert 0.05 < near.mean() < 0.7


def test_depth_buffered_warp_cleaner_at_occlusion():
    """Across a real occlusion boundary, the depth-buffered inverse warp
    must produce a lower photometric error than the plain bilinear warp
    (the reason the reference built interpolation.cpp:55-110)."""
    scene = synthetic.occluded_scene()
    T = np.asarray(se3.exp_se3(jnp.asarray([0.05, 0.0, 0.0, 0.0, 0.03, 0.0])))

    def lv(pose):
        from dvo_slam_tpu.ops import pyramid

        i, d, v = synthetic.render_frame(pose, K, SHAPE, scene=scene)
        # gate OFF: the derivative gate (pyramid.MAX_DEPTH_DERIVATIVE_M)
        # already invalidates edge-adjacent pixels, which would hide the
        # depth buffer's effect this test isolates
        return pyramid.make_level(
            jnp.asarray(i), jnp.asarray(d), jnp.asarray(v),
            max_depth_derivative=0.0,
        )

    ref, cur = lv(np.eye(4)), lv(T)
    T_warp = jnp.asarray(np.linalg.inv(T), jnp.float32)
    w_db, v_db = warp.warp_intensity_inverse(
        ref.depth, ref.valid, cur, K, T_warp, use_depth_buffer=True
    )
    w_pl, v_pl = warp.warp_intensity_inverse(
        ref.depth, ref.valid, cur, K, T_warp, use_depth_buffer=False
    )
    both = np.asarray(v_db) & np.asarray(v_pl)
    ref_i = np.asarray(ref.intensity)
    err_db = np.abs(np.asarray(w_db) - ref_i)[both]
    err_pl = np.abs(np.asarray(w_pl) - ref_i)[both]
    # mean error strictly improves, and the worst blended pixels improve a lot
    assert err_db.mean() < err_pl.mean()
    assert np.percentile(err_db, 99) < np.percentile(err_pl, 99)


def test_tracking_ate_on_occluded_scene():
    """Accuracy gate on the occlusion-rich scene: frame-to-frame odometry
    over a small loop must stay accurate despite >1 m depth steps
    (exercises the occlusion gate, residuals.py, for real)."""
    from dvo_slam_tpu.config import TrackerConfig
    from dvo_slam_tpu.models.dense_tracker import DenseTracker

    scene = synthetic.occluded_scene()
    cfg = TrackerConfig(
        first_level=2, last_level=0, max_iterations_per_level=30,
        precision=1e-4, use_initial_estimate=True,
    )
    tracker = DenseTracker(K, cfg)
    poses = synthetic.circular_trajectory(8, radius=0.03, rot_amplitude=0.015)
    est = [np.eye(4)]
    prev = None
    for i, pose in enumerate(poses):
        intensity, depth, valid = synthetic.render_frame(
            pose, K, SHAPE, scene=scene, seed=i,
            depth_noise=0.002, intensity_noise=1.0,
        )
        pyr = tracker.build_pyramid(
            jnp.asarray(intensity), jnp.asarray(depth), jnp.asarray(valid)
        )
        if prev is not None:
            r = tracker.match(prev, pyr)
            est.append(est[-1] @ np.asarray(r.transformation, np.float64))
        prev = pyr
    stamps = np.arange(len(poses)) / 30.0
    ate = trajectory.ate_rmse(stamps, np.asarray(est), stamps, poses)
    assert ate < 0.01, f"occluded-scene ATE {ate}"


@pytest.mark.slow
def test_slam_ate_on_occluded_scene():
    """Full streaming SLAM (front end + replayed back end + final
    optimization) on the occlusion-rich scene with fr1-like motion
    magnitudes (30 cm loop diameter, 0.12 rad rotation) — the cm-scale-
    difficulty gate that catches occlusion/robust-weighting regressions
    the easy two-plane scene cannot (bench.py runs the same sequence at
    640x480 on the TPU)."""
    from dvo_slam_tpu.config import (
        GraphConfig, KeyframeConfig, SlamConfig, TrackerConfig,
    )
    from dvo_slam_tpu.models.streaming import StreamingSLAM

    scene = synthetic.occluded_scene()
    cfg = SlamConfig(
        tracker=TrackerConfig(
            first_level=2, last_level=0, max_iterations_per_level=30,
            precision=1e-4, use_initial_estimate=True,
        ),
        keyframe=KeyframeConfig(max_translational_distance=0.08),
    )
    num_frames = 40
    poses = synthetic.circular_trajectory(
        num_frames, radius=0.15, rot_amplitude=0.12, z_amplitude=0.05
    )
    iu8 = np.zeros((num_frames,) + SHAPE, np.uint8)
    du16 = np.zeros((num_frames,) + SHAPE, np.uint16)
    for i in range(num_frames):
        intensity, depth, valid = synthetic.render_frame(
            poses[i], K, SHAPE, scene=scene, seed=100 + i,
            depth_noise=0.002, intensity_noise=1.0,
        )
        iu8[i] = np.clip(intensity, 0, 255).astype(np.uint8)
        du16[i] = np.where(valid, depth * 5000.0, 0).astype(np.uint16)
    stamps = np.arange(num_frames) / 30.0

    slam = StreamingSLAM(K, cfg)
    online = slam.track_sequence(iu8, du16, stamps)
    assert np.isfinite(online).all()
    g_stamps, traj = slam.graph.trajectory()
    assert len(traj) >= 2
    ate = trajectory.ate_rmse(g_stamps, traj, stamps, poses)
    # fr1-like motion on a 60x80 render: gate at cm scale
    assert ate < 0.02, f"occluded-scene SLAM ATE {ate}"
    # the back-end phase timers must have recorded the pipeline
    summary = slam.graph.timers.summary()
    assert "constraint_insert" in summary
