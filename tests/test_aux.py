"""Auxiliary subsystem tests: online camera tracker, checkpointing,
phase timers, CLI driver."""

import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.models.camera_tracker import CameraTracker
from dvo_slam_tpu.models import pose_graph as pg
from dvo_slam_tpu.ops import se3
from dvo_slam_tpu.ops.camera import Intrinsics
from dvo_slam_tpu.utils import serialization, synthetic
from dvo_slam_tpu.utils.timers import PhaseTimers, Stopwatch

K = Intrinsics(160.0, 160.0, 79.5, 59.5)
SHAPE = (120, 160)
CFG = TrackerConfig(
    first_level=2, last_level=0, max_iterations_per_level=30, use_initial_estimate=True
)


def _np_frame(tracker, pose, t):
    i, d, v = synthetic.render_frame(pose, K, SHAPE, seed=int(t * 30))
    return tracker.make_frame(i, d, v, t)


@pytest.mark.slow
def test_camera_tracker_accumulates():
    published = []
    ct = CameraTracker(K, CFG, pose_callback=lambda t, p, c: published.append((t, p)))
    poses = synthetic.linear_trajectory(5, np.array([0.01, 0, 0]), np.zeros(3))
    for i, pose in enumerate(poses):
        est = ct.update(_np_frame(ct, pose, i / 30.0))
    err = np.abs(est[:3, 3] - poses[-1][:3, 3]).max()
    assert err < 2e-3
    assert len(published) == 5
    assert ct.frames_since_last_success == 0
    cov = ct.covariance()
    assert cov.shape == (6, 6) and np.isfinite(cov).all()


def test_camera_tracker_failure_keeps_reference():
    ct = CameraTracker(K, CFG)
    ct.update(_np_frame(ct, np.eye(4), 0.0))
    ref_before = ct.reference
    # an all-invalid frame gives 0 constraints -> finite identity-ish pose,
    # so craft an actual NaN path: empty depth still succeeds cleanly, so
    # simulate failure by monkeypatching the matcher result
    import dvo_slam_tpu.models.camera_tracker as mod

    class FakeResult:
        transformation = jnp.full((4, 4), jnp.nan)

    orig = ct.matcher.match
    ct.matcher.match = lambda *a, **k: FakeResult()
    pose = ct.update(_np_frame(ct, np.eye(4), 1 / 30.0))
    ct.matcher.match = orig
    assert ct.frames_since_last_success == 1
    assert ct.reference is ref_before
    np.testing.assert_allclose(pose, np.eye(4))


def test_pose_graph_checkpoint_roundtrip(tmp_path):
    g = pg.PoseGraph()
    T = np.asarray(se3.exp_se3(jnp.asarray([0.1, 0.0, 0.0, 0.0, 0.0, 0.2])))
    g.add_vertex(("kf", 1), np.eye(4), fixed=True)
    g.add_vertex(("kf", 2), T)
    g.add_vertex(("f", 0), T)
    e0 = g.add_edge(("kf", 1), ("kf", 2), T, 2 * np.eye(6), robust=True, level=0)
    e1 = g.add_edge(("kf", 2), ("f", 0), np.eye(4), np.eye(6), level=2)
    g.deactivate_edges([e1])

    path = str(tmp_path / "graph.npz")
    serialization.save_pose_graph(path, g, extra={"note": "test"})
    g2 = serialization.load_pose_graph(path)

    assert g2.num_vertices == 3 and g2.num_edges == 2
    np.testing.assert_allclose(g2.vertex_pose(("kf", 2)), T, atol=1e-6)
    assert g2.fixed[g2.vertex_index(("kf", 1))]
    assert bool(g2.robust[0]) and int(g2.edge_level[1]) == 2
    assert not g2.edge_active[1]
    assert serialization.checkpoint_extra(path)["note"] == "test"
    # loaded graph still optimizes
    g2.optimize(iterations=5)


def test_timers():
    t = Stopwatch("x")
    with t.timing():
        pass
    assert t.mean >= 0.0 and len(t.samples) == 1
    pt = PhaseTimers()
    with pt.timing("match"):
        pass
    s = pt.summary()
    assert "match" in s and s["match"]["count"] == 1


@pytest.mark.slow
def test_cli_odometry(tmp_path):
    from dvo_slam_tpu.cli.benchmark import main

    rc = main(
        [
            "--synthetic",
            "6",
            "--mode",
            "odometry",
            "--shape",
            "60x80",
            "--output-dir",
            str(tmp_path),
        ]
    )
    assert rc == 0
    assert (tmp_path / "trajectory.txt").exists()


def test_cli_requires_input(capsys):
    from dvo_slam_tpu.cli.benchmark import main

    assert main([]) == 2


def test_experiment_metrics():
    from dvo_slam_tpu.utils import metrics

    # identical poses fully overlap; a far-away pose doesn't
    same = metrics.frustum_overlap(np.eye(4), np.eye(4), K, SHAPE)
    assert same > 0.95  # boundary samples can round out
    far = np.eye(4)
    far[:3, 3] = [50.0, 0.0, 0.0]
    assert metrics.frustum_overlap(np.eye(4), far, K, SHAPE) < 0.05
    # JBLD: zero at equality, positive and symmetric otherwise
    A = np.diag([1.0, 2.0, 3.0])
    B = np.diag([2.0, 2.0, 1.0])
    assert metrics.jensen_bregman_logdet(A, A) < 1e-12
    d1 = metrics.jensen_bregman_logdet(A, B)
    d2 = metrics.jensen_bregman_logdet(B, A)
    assert d1 > 0 and abs(d1 - d2) < 1e-12


@pytest.mark.slow
def test_runtime_reconfiguration():
    import dataclasses

    from dvo_slam_tpu.config import SlamConfig, TrackerConfig
    from dvo_slam_tpu.models.keyframe_tracker import KeyframeTracker
    from dvo_slam_tpu.utils import synthetic

    cfg = SlamConfig(tracker=CFG)
    kt = KeyframeTracker(K, cfg)
    kt.init()
    poses = synthetic.linear_trajectory(3, np.array([0.005, 0, 0]), np.zeros(3))
    for i, pose in enumerate(poses):
        i_, d_, v_ = synthetic.render_frame(pose, K, SHAPE, seed=i)
        kt.update(kt.make_frame(i_, d_, v_, i / 30.0))
    new_tracker = dataclasses.replace(CFG, max_iterations_per_level=10)
    kt.configure_tracking(new_tracker)
    assert kt.lt.cfg.max_iterations_per_level == 10
    # tracking continues with the new config
    i_, d_, v_ = synthetic.render_frame(poses[-1], K, SHAPE, seed=9)
    pose = kt.update(kt.make_frame(i_, d_, v_, 0.2))
    assert np.isfinite(np.asarray(pose)).all()
