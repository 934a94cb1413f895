"""Front-end + back-end integration tests on synthetic sequences:
keyframe switching, local maps, loop-closure validation, full SLAM ATE."""

import numpy as np
import jax.numpy as jnp
import pytest

from dvo_slam_tpu.config import (
    GraphConfig,
    KeyframeConfig,
    SlamConfig,
    TrackerConfig,
)
from dvo_slam_tpu.models.frames import Frame, Keyframe
from dvo_slam_tpu.models.keyframe_tracker import KeyframeTracker
from dvo_slam_tpu.models.local_map import LocalMap
from dvo_slam_tpu.ops import se3
from dvo_slam_tpu.ops.camera import Intrinsics
from dvo_slam_tpu.utils import synthetic, trajectory

K = Intrinsics(160.0, 160.0, 79.5, 59.5)
SHAPE = (120, 160)

TRACKER_CFG = TrackerConfig(
    first_level=2,
    last_level=0,
    max_iterations_per_level=30,
    precision=1e-4,
    use_initial_estimate=True,
)
SLAM_CFG = SlamConfig(
    tracker=TRACKER_CFG,
    keyframe=KeyframeConfig(
        max_translational_distance=0.08,
        min_entropy_ratio=0.6,
        min_equation_system_constraint_ratio=0.3,
    ),
    graph=GraphConfig(
        new_constraint_search_radius=5.0,
        new_constraint_min_entropy_ratio_coarse=0.03,
        new_constraint_min_entropy_ratio_fine=0.3,
        min_equation_system_constraint_ratio=0.3,
        optimization_iterations=20,
        final_optimization_iterations=100,
        optimization_remove_outliers=True,
        optimization_outlier_weight_threshold=0.1,
        final_optimization_remove_outliers=True,
        final_optimization_outlier_weight_threshold=0.1,
    ),
)


def _frame(pose, t, num_levels=3, **kw):
    i, d, v = synthetic.render_frame(pose, K, SHAPE, seed=int(t * 30), **kw)
    return Frame.from_arrays(i, d, v, t, num_levels)


def test_local_map_structure():
    f0 = _frame(np.eye(4), 0.0)
    m = LocalMap.create(f0, np.eye(4))
    T1 = np.asarray(se3.exp_se3(jnp.asarray([0.01, 0, 0, 0, 0, 0.0])))
    f1 = _frame(T1, 1 / 30)
    m.add_frame(f1)
    m.add_keyframe_measurement(T1, 100 * np.eye(6))
    assert m.num_frames == 1
    np.testing.assert_allclose(m.current_frame_pose(), T1, atol=1e-6)
    # second frame with odometry + keyframe edges
    T2 = np.asarray(se3.exp_se3(jnp.asarray([0.02, 0, 0, 0, 0, 0.0])))
    f2 = _frame(T2, 2 / 30)
    m.add_frame(f2)
    m.add_odometry_measurement(np.linalg.inv(T1) @ T2, 100 * np.eye(6))
    m.add_keyframe_measurement(T2, 100 * np.eye(6))
    m.optimize(20)
    np.testing.assert_allclose(m.current_frame_pose(), T2, atol=1e-4)
    meas, info = m.last_keyframe_edge()
    np.testing.assert_allclose(meas, T2, atol=1e-8)


def test_local_map_reanchoring():
    f0 = _frame(np.eye(4), 0.0)
    m = LocalMap.create(f0, np.eye(4))
    T1 = np.asarray(se3.exp_se3(jnp.asarray([0.05, 0, 0, 0, 0, 0.0])))
    m.add_frame(_frame(T1, 1 / 30))
    m.add_keyframe_measurement(T1, np.eye(6))
    anchor = np.asarray(se3.exp_se3(jnp.asarray([0.0, 0.1, 0, 0, 0, 0.2])))
    m.set_keyframe_pose(anchor)
    np.testing.assert_allclose(m.keyframe_pose(), anchor, atol=1e-6)
    np.testing.assert_allclose(m.current_frame_pose(), anchor @ T1, atol=1e-5)


def _run_slam(poses, fps=30.0, cfg=SLAM_CFG, finish=True):
    kt = KeyframeTracker(K, cfg)
    kt.init()
    est = []
    for i, pose in enumerate(poses):
        f = _frame(pose, i / fps, num_levels=cfg.tracker.num_levels)
        est.append(np.asarray(kt.update(f), np.float64))
    if finish:
        kt.force_keyframe()
        kt.finish()
    return kt, np.asarray(est)


@pytest.mark.slow
def test_slam_smoke_tiny():
    """Fast-tier end-to-end SLAM loop at tiny resolution: keyframes,
    loop closure search, final optimization, trajectory export — the
    smoke test that keeps `pytest -m "not slow"` covering L3+L4."""
    k_tiny = Intrinsics(40.0, 40.0, 19.5, 14.5)
    shape = (30, 40)
    cfg = SlamConfig(
        tracker=TrackerConfig(
            first_level=1,
            last_level=0,
            max_iterations_per_level=15,
            precision=1e-4,
            use_initial_estimate=True,
        ),
        keyframe=KeyframeConfig(
            max_translational_distance=0.05,
            min_entropy_ratio=0.5,
            min_equation_system_constraint_ratio=0.1,
        ),
        graph=GraphConfig(
            new_constraint_search_radius=5.0,
            new_constraint_min_entropy_ratio_coarse=0.03,
            new_constraint_min_entropy_ratio_fine=0.3,
            min_equation_system_constraint_ratio=0.1,
            optimization_iterations=10,
            final_optimization_iterations=20,
        ),
    )
    poses = synthetic.circular_trajectory(8, radius=0.04, rot_amplitude=0.02)
    kt = KeyframeTracker(k_tiny, cfg)
    kt.init()
    est = []
    for i, pose in enumerate(poses):
        intensity, depth, valid = synthetic.render_frame(
            pose, k_tiny, shape, seed=i
        )
        f = Frame.from_arrays(intensity, depth, valid, i / 30.0, cfg.tracker.num_levels)
        est.append(np.asarray(kt.update(f), np.float64))
    kt.force_keyframe()
    kt.finish()
    stamps = np.arange(len(poses)) / 30.0
    ate = trajectory.ate_rmse(stamps, np.asarray(est), stamps, poses)
    assert np.isfinite(ate) and ate < 0.05, f"tiny SLAM ATE {ate}"
    g_stamps, g_poses = kt.trajectory()
    assert len(g_stamps) == len(poses)


@pytest.mark.slow
def test_keyframe_switching_linear_path():
    """A steadily translating camera must spawn multiple keyframes and
    track with low drift."""
    poses = synthetic.linear_trajectory(
        16, step=np.array([0.02, 0.0, 0.0]), rot_step=np.zeros(3)
    )
    kt, est = _run_slam(poses, finish=False)
    kt.graph.wait_for_queue()  # the back end runs on a worker thread
    # 16 frames x 2cm = 30 cm of travel with 8 cm keyframe distance
    assert len(kt.graph.keyframes) >= 2
    err = np.linalg.norm(est[-1][:3, 3] - poses[-1][:3, 3])
    assert err < 0.02, f"terminal drift {err}"


@pytest.mark.slow
def test_full_slam_loop_trajectory():
    """Full pipeline on a closed loop: keyframes + loop closures + final
    optimization; gate on ATE vs exact ground truth."""
    poses = synthetic.circular_trajectory(24, radius=0.06, rot_amplitude=0.03)
    kt, est = _run_slam(poses)
    stamps = np.arange(len(poses)) / 30.0
    # online estimates
    ate_online = trajectory.ate_rmse(stamps, est, stamps, poses)
    assert ate_online < 0.01, f"online ATE {ate_online}"
    # optimized trajectory from the graph (all vertices)
    g_stamps, g_poses = kt.trajectory()
    assert len(g_stamps) == len(poses)
    ate_graph = trajectory.ate_rmse(g_stamps, g_poses, stamps, poses)
    assert ate_graph < 0.01, f"graph ATE {ate_graph}"
    # diagnostics available
    w, chi2 = kt.graph.edge_errors()
    assert len(w) == len(chi2) > 0
    # the closed loop must produce accepted loop-closure edges
    g = kt.graph.graph
    assert int(g.robust[: g.num_edges].sum()) > 0


@pytest.mark.slow
def test_forced_keyframe():
    poses = synthetic.linear_trajectory(6, np.array([0.005, 0, 0]), np.zeros(3))
    kt = KeyframeTracker(K, SLAM_CFG)
    kt.init()
    for i, pose in enumerate(poses[:4]):
        kt.update(_frame(pose, i / 30.0))
    kt.graph.wait_for_queue()  # the back end runs on a worker thread
    n_before = len(kt.graph.keyframes)
    kt.force_keyframe()
    kt.update(_frame(poses[4], 4 / 30.0))
    kt.graph.wait_for_queue()
    assert len(kt.graph.keyframes) == n_before + 1


@pytest.mark.slow
def test_divergence_reset():
    """Feeding a frame with no overlap must not produce a wild pose — the
    divergence criterion resets odometry to identity."""
    kt = KeyframeTracker(K, SLAM_CFG)
    kt.init()
    kt.update(_frame(np.eye(4), 0.0))
    kt.update(_frame(np.eye(4), 1 / 30.0))
    # a frame 10 m away shares nothing with the keyframe
    far = np.eye(4)
    far[:3, 3] = [10.0, 0, 0]
    pose = np.asarray(kt.update(_frame(far, 2 / 30.0)), np.float64)
    assert np.isfinite(pose).all()
    assert np.linalg.norm(pose[:3, 3]) < 1.0  # no teleport


@pytest.mark.slow
def test_initial_transformation_offset():
    """init(T0) must anchor the whole trajectory at T0."""
    T0 = np.asarray(se3.exp_se3(jnp.asarray([0.5, -0.2, 0.1, 0.0, 0.0, 0.3])))
    poses = synthetic.linear_trajectory(4, np.array([0.01, 0, 0]), np.zeros(3))
    kt = KeyframeTracker(K, SLAM_CFG)
    kt.init(T0)
    est = []
    for i, pose in enumerate(poses):
        est.append(np.asarray(kt.update(_frame(pose, i / 30.0)), np.float64))
    np.testing.assert_allclose(est[0], T0, atol=1e-6)
    # relative motion preserved under the offset
    rel_est = np.linalg.inv(est[0]) @ est[-1]
    rel_true = np.linalg.inv(poses[0]) @ poses[-1]
    err = np.abs(rel_est[:3, 3] - rel_true[:3, 3]).max()
    assert err < 0.01


def test_make_frame_raw_fused_prepare_live_path():
    """The live per-frame path (make_frame_raw) must build the pyramid,
    convert raw depth, AND prepare the solver artifacts in one device
    program: the dual-match wave then never re-prepares the frame, and
    the trajectory matches the float-ingest path's accuracy."""
    import numpy as np

    from dvo_slam_tpu.models import frames as fr
    from dvo_slam_tpu.models.keyframe_tracker import KeyframeTracker
    from dvo_slam_tpu.utils import synthetic, trajectory as tj

    k = Intrinsics(80.0, 80.0, 39.5, 29.5)
    cfg = SlamConfig(
        tracker=TrackerConfig(first_level=1, last_level=0,
                              use_initial_estimate=True)
    )
    kt = KeyframeTracker(k, cfg)
    kt.init()
    poses = synthetic.circular_trajectory(6, radius=0.03)
    n_prep = 0
    orig = fr.BatchedMatcher._prepare_many

    def spy(self, frames_):
        nonlocal n_prep
        key = self._prep_key
        todo = {
            id(f) for f in frames_
            if key not in f.__dict__.get("_prepared", {})
        }
        if self._prep_key[0] == cfg.tracker:  # tracker-role waves only
            n_prep += len(todo)
        return orig(self, frames_)

    fr.BatchedMatcher._prepare_many = spy
    try:
        for i, p in enumerate(poses):
            i_, d_, v_ = synthetic.render_frame(
                p, k, (60, 80), seed=i, depth_noise=0.002
            )
            iu8 = np.clip(i_, 0, 255).astype(np.uint8)
            du16 = np.where(v_, d_ * 5000, 0).astype(np.uint16)
            kt.update(kt.make_frame_raw(iu8, du16, i / 30.0))
        kt.force_keyframe()
        kt.finish()
    finally:
        fr.BatchedMatcher._prepare_many = orig
    assert n_prep == 0, f"{n_prep} frames re-prepared in the match wave"
    stamps, traj = kt.trajectory()
    ate = tj.ate_rmse(stamps, traj, np.arange(6) / 30.0, poses)
    assert ate < 0.01, ate
    kt.graph.shutdown()
