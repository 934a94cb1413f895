"""Pyramid op tests against NumPy oracles (the scalar-twin pattern of the
reference, SURVEY.md section 4.3)."""

import numpy as np
import pytest
import jax.numpy as jnp

from dvo_slam_tpu.ops import pyramid
from dvo_slam_tpu.ops.camera import Intrinsics


def _random_frame(h=32, w=48, seed=0, invalid_fraction=0.1):
    rng = np.random.default_rng(seed)
    intensity = rng.uniform(0, 255, (h, w)).astype(np.float32)
    depth = rng.uniform(0.5, 3.0, (h, w)).astype(np.float32)
    valid = rng.random((h, w)) > invalid_fraction
    depth = np.where(valid, depth, 0.0).astype(np.float32)
    return intensity, depth, valid


def test_convert_raw_depth():
    raw = np.array([[0, 5000], [2500, 10000]], dtype=np.uint16)
    depth, valid = pyramid.convert_raw_depth(raw)
    np.testing.assert_allclose(depth, [[0.0, 1.0], [0.5, 2.0]])
    np.testing.assert_array_equal(valid, [[False, True], [True, True]])


def test_central_diff_oracle():
    intensity, _, _ = _random_frame()
    got = np.asarray(pyramid.central_diff_x(jnp.asarray(intensity)))
    h, w = intensity.shape
    expected = np.zeros_like(intensity)
    for y in range(h):
        for x in range(w):
            expected[y, x] = 0.5 * (
                intensity[y, min(x + 1, w - 1)] - intensity[y, max(x - 1, 0)]
            )
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_downsample_intensity_mean():
    intensity, _, _ = _random_frame()
    got = np.asarray(pyramid.downsample_intensity(jnp.asarray(intensity)))
    expected = (
        intensity[0::2, 0::2]
        + intensity[0::2, 1::2]
        + intensity[1::2, 0::2]
        + intensity[1::2, 1::2]
    ) / 4.0
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_downsample_depth_subsample():
    _, depth, valid = _random_frame()
    d2, v2 = pyramid.downsample_depth(jnp.asarray(depth), jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(d2), depth[::2, ::2])
    np.testing.assert_array_equal(np.asarray(v2), valid[::2, ::2])


def test_depth_derivative_validity():
    _, depth, valid = _random_frame(seed=3, invalid_fraction=0.3)
    level = pyramid.make_level(
        jnp.zeros_like(jnp.asarray(depth)), jnp.asarray(depth), jnp.asarray(valid)
    )
    zdx = np.asarray(level.zdx)
    zvalid = np.asarray(level.zvalid)
    h, w = depth.shape
    for y in range(0, h, 5):
        for x in range(1, w - 1, 7):
            both_ok = valid[y, x - 1] and valid[y, x + 1]
            if zvalid[y, x]:
                assert valid[y, x]
            if valid[y, x] and not both_ok:
                assert not zvalid[y, x]
            if both_ok:
                diff = np.float32(0.5 * (depth[y, x + 1] - depth[y, x - 1]))
                if abs(diff) <= pyramid.MAX_DEPTH_DERIVATIVE_M:
                    assert zdx[y, x] == diff
                else:
                    # discontinuity-spanning difference: gated out
                    assert zdx[y, x] == 0.0
                    assert not zvalid[y, x]


def test_pyramid_shapes():
    intensity, depth, valid = _random_frame(h=64, w=96)
    levels = pyramid.build_pyramid(
        jnp.asarray(intensity), jnp.asarray(depth), jnp.asarray(valid), 4
    )
    assert [lv.shape for lv in levels] == [(64, 96), (32, 48), (16, 24), (8, 12)]


def test_acceleration_channels():
    intensity, depth, valid = _random_frame()
    level = pyramid.make_level(
        jnp.asarray(intensity), jnp.asarray(depth), jnp.asarray(valid)
    )
    accel = np.asarray(pyramid.build_acceleration(level))
    assert accel.shape == intensity.shape + (8,)
    np.testing.assert_array_equal(accel[..., 0], intensity)
    np.testing.assert_array_equal(accel[..., 1], np.asarray(level.depth))
    np.testing.assert_array_equal(accel[..., 6], np.asarray(level.zvalid, np.float32))
    np.testing.assert_array_equal(accel[..., 7], 0.0)


def test_selection_mask_strict_threshold():
    # A perfectly flat patch must be rejected under zero thresholds
    # (strict inequality, point_selection.h:63-66).
    intensity = np.full((16, 16), 100.0, np.float32)
    depth = np.full((16, 16), 2.0, np.float32)
    valid = np.ones((16, 16), bool)
    level = pyramid.make_level(
        jnp.asarray(intensity), jnp.asarray(depth), jnp.asarray(valid)
    )
    sel = np.asarray(pyramid.selection_mask(level))
    assert not sel.any()


def test_intrinsics_scaling():
    k = Intrinsics(520.0, 521.0, 320.0, 240.0)
    k1 = k.at_level(1)
    assert k1 == Intrinsics(260.0, 260.5, 160.0, 120.0)
    assert k.at_level(0) == k


@pytest.mark.slow
def test_build_pyramid_skip_below_matches_full():
    """Skipped fine levels are None; the solved levels are bit-identical
    to the full build, and the tracker accepts the trimmed pyramid."""
    import numpy as np
    from dvo_slam_tpu.config import TrackerConfig
    from dvo_slam_tpu.models.dense_tracker import match_pyramids
    from dvo_slam_tpu.ops.camera import Intrinsics
    from dvo_slam_tpu.utils import synthetic

    K = Intrinsics(80.0, 80.0, 39.5, 29.5)
    cfg = TrackerConfig(first_level=2, last_level=1, max_iterations_per_level=8)
    i0, d0, v0 = synthetic.render_frame(np.eye(4), K, (60, 80), seed=0)
    i1, d1, v1 = synthetic.render_frame(np.eye(4), K, (60, 80), seed=0)
    args = (jnp.asarray(i0), jnp.asarray(d0), jnp.asarray(v0), cfg.num_levels)
    full = pyramid.build_pyramid(*args)
    trimmed = pyramid.build_pyramid(*args, skip_below=cfg.last_level)
    assert trimmed[0] is None
    for lvl in range(cfg.last_level, cfg.num_levels):
        for a, b in zip(full[lvl], trimmed[lvl]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    args1 = (jnp.asarray(i1), jnp.asarray(d1), jnp.asarray(v1), cfg.num_levels)
    r_full = match_pyramids(cfg, K, full, pyramid.build_pyramid(*args1))
    r_trim = match_pyramids(
        cfg, K, trimmed, pyramid.build_pyramid(*args1, skip_below=cfg.last_level)
    )
    np.testing.assert_allclose(
        np.asarray(r_full.transformation), np.asarray(r_trim.transformation)
    )
