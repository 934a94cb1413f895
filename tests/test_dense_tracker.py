"""Dense tracker golden tests: recover known SE(3) motion between synthetic
frames (the solver-level oracle strategy, SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.models.dense_tracker import DenseTracker, match_pyramids
from dvo_slam_tpu.ops import se3
from dvo_slam_tpu.ops.camera import Intrinsics
from dvo_slam_tpu.ops.pyramid import build_pyramid
from dvo_slam_tpu.utils import synthetic

K = Intrinsics(160.0, 160.0, 79.5, 59.5)
SHAPE = (120, 160)
CFG = TrackerConfig(first_level=2, last_level=0, max_iterations_per_level=50)


def _pyramid(pose, cfg=CFG, **kw):
    i, d, v = synthetic.render_frame(pose, K, SHAPE, **kw)
    return build_pyramid(jnp.asarray(i), jnp.asarray(d), jnp.asarray(v), cfg.num_levels)


def _run(pose_ref, pose_cur, cfg=CFG, init=None, **kw):
    ref = _pyramid(pose_ref, cfg, **kw)
    cur = _pyramid(pose_cur, cfg, **kw)
    return match_pyramids(cfg, K, ref, cur, init)


@pytest.mark.slow
def test_identity_motion():
    result = _run(np.eye(4), np.eye(4))
    xi = np.asarray(se3.log_se3(result.transformation))
    np.testing.assert_allclose(xi, 0.0, atol=1e-4)


@pytest.mark.parametrize(
    "twist",
    [
        [0.01, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.02, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.01],
        [0.01, -0.008, 0.012, 0.004, -0.005, 0.006],
    ],
)
def test_recover_small_motion(twist):
    """match(ref, cur).transformation must equal the current camera's pose
    in the reference frame (ref_pose^{-1} @ cur_pose)."""
    T_cur = np.asarray(se3.exp_se3(jnp.asarray(twist, dtype=jnp.float64)))
    result = _run(np.eye(4), T_cur)
    est = np.asarray(result.transformation, np.float64)
    err = np.asarray(se3.log_se3(jnp.asarray(np.linalg.inv(T_cur) @ est)))
    assert np.abs(err[:3]).max() < 2e-3, f"translation error {err}"
    assert np.abs(err[3:]).max() < 2e-3, f"rotation error {err}"


@pytest.mark.slow
def test_larger_motion_with_pyramid():
    """A coarser initial offset must still converge through the pyramid."""
    twist = [0.04, 0.02, 0.03, 0.0, 0.0, 0.02]
    T_cur = np.asarray(se3.exp_se3(jnp.asarray(twist, dtype=jnp.float64)))
    result = _run(np.eye(4), T_cur)
    est = np.asarray(result.transformation, np.float64)
    err = np.asarray(se3.log_se3(jnp.asarray(np.linalg.inv(T_cur) @ est)))
    assert np.abs(err).max() < 5e-3, f"error {err}"


@pytest.mark.slow
def test_initial_estimate_warm_start():
    twist = [0.05, 0.0, 0.0, 0.0, 0.0, 0.03]
    T_cur = np.asarray(se3.exp_se3(jnp.asarray(twist, dtype=jnp.float64)))
    cfg = TrackerConfig(
        first_level=2, last_level=0, max_iterations_per_level=50, use_initial_estimate=True
    )
    result = _run(np.eye(4), T_cur, cfg=cfg, init=jnp.asarray(T_cur, jnp.float32))
    est = np.asarray(result.transformation, np.float64)
    err = np.asarray(se3.log_se3(jnp.asarray(np.linalg.inv(T_cur) @ est)))
    assert np.abs(err).max() < 1e-3


@pytest.mark.slow
def test_robust_to_noise_and_dropout():
    twist = [0.01, 0.0, 0.01, 0.0, 0.0, 0.005]
    T_cur = np.asarray(se3.exp_se3(jnp.asarray(twist, dtype=jnp.float64)))
    result = _run(
        np.eye(4),
        T_cur,
        intensity_noise=2.0,
        depth_noise=0.005,
        invalid_fraction=0.05,
    )
    est = np.asarray(result.transformation, np.float64)
    err = np.asarray(se3.log_se3(jnp.asarray(np.linalg.inv(T_cur) @ est)))
    assert np.abs(err).max() < 5e-3, f"error {err}"


@pytest.mark.slow
def test_result_statistics():
    result = _run(np.eye(4), np.eye(4))
    assert len(result.level_stats) == 3  # levels 2, 1, 0
    last = result.last_level
    assert int(last.valid_constraints) > 1000
    assert int(last.valid_pixels) >= int(last.valid_constraints)
    assert int(last.iterations) >= 1
    info = np.asarray(result.information)
    assert info.shape == (6, 6)
    np.testing.assert_allclose(info, info.T, atol=1e-2)
    assert np.isfinite(float(result.neg_log_likelihood))


@pytest.mark.slow
def test_tracker_facade_and_jit_cache():
    tracker = DenseTracker(K, CFG)
    i0, d0, v0 = synthetic.render_frame(np.eye(4), K, SHAPE)
    ref = tracker.build_pyramid(jnp.asarray(i0), jnp.asarray(d0), jnp.asarray(v0))
    T_cur = np.asarray(se3.exp_se3(jnp.asarray([0.01, 0, 0, 0, 0, 0.005])))
    i1, d1, v1 = synthetic.render_frame(T_cur, K, SHAPE)
    cur = tracker.build_pyramid(jnp.asarray(i1), jnp.asarray(d1), jnp.asarray(v1))
    r1 = tracker.match(ref, cur)
    r2 = tracker.match(ref, cur)  # second call: cached executable
    np.testing.assert_allclose(
        np.asarray(r1.transformation), np.asarray(r2.transformation), atol=1e-7
    )
    assert not bool(r1.is_nan())


@pytest.mark.slow
def test_vmap_batched_matching():
    """Batching over frame pairs: the TPU replacement for the reference's
    tbb::parallel_invoke dual-match (P2/P4 in SURVEY.md section 2.5)."""
    cfg = TrackerConfig(first_level=2, last_level=1, max_iterations_per_level=20)
    twists = [
        [0.01, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.01, 0.0, 0.0, 0.0, 0.005],
    ]
    refs, curs, gts = [], [], []
    for tw in twists:
        T_cur = np.asarray(se3.exp_se3(jnp.asarray(tw, dtype=jnp.float64)))
        refs.append(_pyramid(np.eye(4), cfg))
        curs.append(_pyramid(T_cur, cfg))
        gts.append(T_cur)

    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    ref_b, cur_b = stack(refs), stack(curs)
    init_b = jnp.stack([jnp.eye(4, dtype=jnp.float32)] * 2)

    batched = jax.vmap(
        lambda r, c, i: match_pyramids(cfg, K, r, c, i), in_axes=(0, 0, 0)
    )
    results = batched(ref_b, cur_b, init_b)
    assert results.transformation.shape == (2, 4, 4)
    for i, gt in enumerate(gts):
        est = np.asarray(results.transformation[i], np.float64)
        err = np.asarray(se3.log_se3(jnp.asarray(np.linalg.inv(gt) @ est)))
        assert np.abs(err).max() < 5e-3, f"pair {i} error {err}"


def test_all_level_stats_reach_host():
    """Every solved level's stats (incl. coarse-level termination reasons)
    must survive the flat host download (dense_tracking.h:108-123)."""
    from dvo_slam_tpu.models.frames import BatchedMatcher, Frame
    from dvo_slam_tpu.models.dense_tracker import (
        TERM_INCREMENT_TOO_SMALL,
        TERM_ITERATIONS_EXCEEDED,
        TERM_LOG_LIKELIHOOD_DECREASED,
        TERM_TOO_FEW_CONSTRAINTS,
    )

    cfg = TrackerConfig(first_level=2, last_level=0, max_iterations_per_level=10)
    m = BatchedMatcher(cfg, K)
    i0, d0, v0 = synthetic.render_frame(np.eye(4), K, SHAPE, seed=0)
    T = np.asarray(se3.exp_se3(jnp.asarray([0.01, 0.0, 0.0, 0.0, 0.0, 0.01])))
    i1, d1, v1 = synthetic.render_frame(T, K, SHAPE, seed=1)
    ref = Frame.from_arrays(i0, d0, v0, 0.0, cfg.num_levels)
    cur = Frame.from_arrays(i1, d1, v1, 1 / 30, cfg.num_levels)
    r = m.match(ref, cur)
    assert len(r.level_stats) == cfg.first_level - cfg.last_level + 1
    assert r.last_level == r.level_stats[-1]
    valid_terms = {
        TERM_INCREMENT_TOO_SMALL,
        TERM_ITERATIONS_EXCEEDED,
        TERM_LOG_LIKELIHOOD_DECREASED,
        TERM_TOO_FEW_CONSTRAINTS,
    }
    for s in r.level_stats:  # coarse levels included, each actually solved
        assert s.iterations >= 1
        assert s.termination in valid_terms
        assert s.valid_constraints > 0
    # coarse level has ~1/16 the pixels of the fine level
    assert r.level_stats[0].valid_pixels < r.level_stats[-1].valid_pixels


def test_iteration_stats_trace():
    """collect_iteration_stats=True surfaces the reference's per-iteration
    IterationStats telemetry (dense_tracking.h:83-95)."""
    cfg = TrackerConfig(first_level=2, last_level=1, max_iterations_per_level=12)
    ref = _pyramid(np.eye(4), cfg, seed=0)
    T = np.asarray(se3.exp_se3(jnp.asarray([0.01, 0.0, 0.005, 0.0, 0.0, 0.01])))
    cur = _pyramid(T, cfg, seed=1)
    r = match_pyramids(cfg, K, ref, cur, None, collect_iteration_stats=True)
    assert len(r.iteration_stats) == 2  # one trace per solved level
    for trace, stats in zip(r.iteration_stats, r.level_stats):
        its = int(np.asarray(stats.iterations))
        assert trace.increment.shape == (cfg.max_iterations_per_level, 6)
        assert trace.information.shape == (cfg.max_iterations_per_level, 6, 6)
        n_rows = np.asarray(trace.valid_constraints)
        assert (n_rows[:its] > 0).all()  # executed iterations recorded
        assert (n_rows[its:] == 0).all()  # unexecuted rows stay zero
        # the recorded constraint count of the last iteration matches stats
        assert int(n_rows[its - 1]) == int(np.asarray(stats.valid_constraints))
    # default path stays trace-free
    r2 = match_pyramids(cfg, K, ref, cur, None)
    assert r2.iteration_stats == ()
