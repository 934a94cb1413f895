"""Streaming (scanned) SLAM front end vs the per-frame KeyframeTracker:
same decisions, same trajectory, same graph shape."""

import numpy as np
import jax.numpy as jnp
import pytest

from dvo_slam_tpu.config import GraphConfig, KeyframeConfig, SlamConfig, TrackerConfig
from dvo_slam_tpu.models.keyframe_tracker import KeyframeTracker
from dvo_slam_tpu.models.streaming import StreamingSLAM
from dvo_slam_tpu.ops.camera import Intrinsics
from dvo_slam_tpu.utils import synthetic, trajectory

K = Intrinsics(160.0, 160.0, 79.5, 59.5)
SHAPE = (120, 160)

CFG = SlamConfig(
    tracker=TrackerConfig(
        first_level=2,
        last_level=0,
        max_iterations_per_level=30,
        precision=1e-4,
        use_initial_estimate=True,
    ),
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


def _raw_sequence(poses):
    t = len(poses)
    iu8 = np.zeros((t,) + SHAPE, np.uint8)
    du16 = np.zeros((t,) + SHAPE, np.uint16)
    for i, pose in enumerate(poses):
        intensity, depth, valid = synthetic.render_frame(
            pose, K, SHAPE, seed=i, depth_noise=0.002, intensity_noise=1.0
        )
        iu8[i] = np.clip(intensity, 0, 255).astype(np.uint8)
        du16[i] = np.where(valid, depth * 5000.0, 0).astype(np.uint16)
    return iu8, du16


@pytest.mark.slow
def test_streaming_matches_keyframe_tracker():
    """The scanned front end must make the same keyframe decisions and
    produce the same trajectory as the per-frame host loop."""
    # 14 frames crosses several keyframe switches while keeping the
    # compile-heavy dual-path comparison inside the suite's wall budget
    poses = synthetic.circular_trajectory(14, radius=0.06, rot_amplitude=0.03)
    iu8, du16 = _raw_sequence(poses)
    stamps = np.arange(len(poses)) / 30.0

    # reference: the per-frame host loop (no forced last keyframe so both
    # paths see identical inputs; finish() flushes the tail map in both)
    kt = KeyframeTracker(K, CFG)
    kt.init()
    est_ref = []
    for i in range(len(poses)):
        depth = np.where(du16[i] > 0, du16[i].astype(np.float32) / 5000.0, 0.0)
        f = kt.make_frame(
            iu8[i].astype(np.float32), depth, du16[i] > 0, stamps[i]
        )
        est_ref.append(np.asarray(kt.update(f), np.float64))
    est_ref = np.asarray(est_ref)

    ss = StreamingSLAM(K, CFG)
    records, est_stream = ss.track_frontend(iu8, du16, force_last=False)

    # same online trajectory (both tracks warm-start identically)
    np.testing.assert_allclose(est_stream, est_ref, atol=2e-3)

    # same accept/switch pattern: each switch completes one local map
    # (-> one keyframe), plus the tail-map flush at finish()
    n_switches = sum(1 for r in records[2:] if not r.accept)
    kt.finish()
    assert len(kt.graph.keyframes) == n_switches + 1

    # full replayed pipeline: graph trajectory covers every frame and the
    # optimized ATE matches ground truth
    ss2 = StreamingSLAM(K, CFG)
    est2 = ss2.track_sequence(iu8, du16, stamps, force_last=False)
    g_stamps, g_poses = ss2.trajectory()
    assert len(g_stamps) == len(poses)
    ate_graph = trajectory.ate_rmse(g_stamps, g_poses, stamps, poses)
    assert ate_graph < 0.01, ate_graph
    ate_online = trajectory.ate_rmse(stamps, est2, stamps, poses)
    assert ate_online < 0.01, ate_online


@pytest.mark.slow
def test_streaming_smoke_tiny():
    """Fast-tier: tiny-resolution streaming SLAM end to end."""
    k_tiny = Intrinsics(40.0, 40.0, 19.5, 14.5)
    shape = (30, 40)
    cfg = SlamConfig(
        tracker=TrackerConfig(
            first_level=1, last_level=0, max_iterations_per_level=15,
            precision=1e-4, use_initial_estimate=True,
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
    poses = synthetic.circular_trajectory(10, radius=0.04, rot_amplitude=0.02)
    t = len(poses)
    iu8 = np.zeros((t, *shape), np.uint8)
    du16 = np.zeros((t, *shape), np.uint16)
    for i, pose in enumerate(poses):
        intensity, depth, valid = synthetic.render_frame(pose, k_tiny, shape, seed=i)
        iu8[i] = np.clip(intensity, 0, 255).astype(np.uint8)
        du16[i] = np.where(valid, depth * 5000.0, 0).astype(np.uint16)
    stamps = np.arange(t) / 30.0
    ss = StreamingSLAM(k_tiny, cfg)
    est = ss.track_sequence(iu8, du16, stamps)
    ate = trajectory.ate_rmse(stamps, est, stamps, poses)
    assert np.isfinite(ate) and ate < 0.05, ate
    g_stamps, g_poses = ss.trajectory()
    assert len(g_stamps) == t


@pytest.mark.slow
def test_host_reduced_ingest_is_bit_exact():
    """With last_level >= 1 the host pre-reduces camera frames to the
    last solved level before upload (streaming.host_reduce_ingest) — the
    records must be BIT-IDENTICAL to the full-resolution upload path
    (the u16 4-sum mean and the subsample decimation are exact)."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, tracker=dataclasses.replace(CFG.tracker, first_level=2, last_level=1)
    )
    poses = synthetic.circular_trajectory(8, radius=0.04, rot_amplitude=0.02)
    iu8, du16 = _raw_sequence(poses)

    ss_full = StreamingSLAM(K, cfg, ingest_level=0)
    rec_full, poses_full = ss_full.track_frontend(iu8, du16, force_last=False)
    ss_red = StreamingSLAM(K, cfg)  # default: ingest at last_level (1)
    assert ss_red.ingest_level == 1
    rec_red, poses_red = ss_red.track_frontend(iu8, du16, force_last=False)
    np.testing.assert_array_equal(poses_full, poses_red)
    for a, b in zip(rec_full, rec_red):
        assert a.accept == b.accept
        np.testing.assert_array_equal(a.kf_T, b.kf_T)
        np.testing.assert_array_equal(a.odo_T, b.odo_T)


def test_host_reduce_ingest_odd_dims_match_device_floor_halving():
    """Odd image dimensions must floor-halve like the device pyramid
    (the trailing odd row/column never reaches the next level)."""
    from dvo_slam_tpu.models.streaming import host_reduce_ingest
    from dvo_slam_tpu.ops import pyramid
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    iu = rng.integers(0, 256, (2, 31, 45), dtype=np.uint8)
    du = rng.integers(0, 60000, (2, 31, 45), dtype=np.uint16)
    i1, d1 = host_reduce_ingest(iu, du, 1)
    assert i1.shape == (2, 15, 22) and d1.shape == (2, 15, 22)
    # parity with the device downsamplers
    dev_i = np.asarray(pyramid.downsample_intensity(jnp.asarray(iu[0], jnp.float32)))
    np.testing.assert_allclose(i1[0].astype(np.float32) / 4.0, dev_i, atol=1e-4)
    dev_d, _ = pyramid.downsample_depth(
        jnp.asarray(du[0], jnp.float32), jnp.ones((31, 45), bool)
    )
    np.testing.assert_array_equal(d1[0].astype(np.float32), np.asarray(dev_d))


def test_restored_evaluation_kind_survives_resave():
    """save -> load -> save must not collapse entropy/normalized
    evaluation kinds to loglik (the voter would mix units)."""
    from dvo_slam_tpu.models import evaluation as ev

    state = {"kind": "entropy", "first": 2.0, "average": 6.0, "n": 3.0}
    r = ev.RestoredEvaluation(state)
    assert ev.evaluation_kind(r) == "entropy"
    assert ev.evaluation_state(r)["kind"] == "entropy"


@pytest.mark.slow
def test_streaming_survives_invalid_frame_mid_sequence():
    """A frame with NO valid depth mid-sequence (sensor dropout) must not
    poison the scan: the NaN/force path fires (local_tracker.cpp:187-190
    semantics), the trajectory stays finite, and tracking recovers on the
    following frames."""
    poses = synthetic.circular_trajectory(12, radius=0.04, rot_amplitude=0.02)
    iu8, du16 = _raw_sequence(poses)
    du16[6] = 0  # whole frame invalid (0 = TUM invalid-depth sentinel)
    ss = StreamingSLAM(K, CFG)
    stamps = np.arange(len(poses)) / 30.0
    est = ss.track_sequence(iu8, du16, stamps, force_last=False)
    assert np.isfinite(est).all()
    # the dropout hop's motion is unobservable (odometry resets to
    # identity there) — recovery means RELATIVE tracking after the
    # dropout matches ground truth again
    rel_est = np.linalg.inv(est[8]) @ est[11]
    rel_gt = np.linalg.inv(poses[8]) @ poses[11]
    rel_err = np.linalg.norm(rel_est[:3, 3] - rel_gt[:3, 3])
    assert rel_err < 0.01, rel_err
    g_stamps, g_poses = ss.trajectory()
    assert np.isfinite(g_poses).all()


@pytest.mark.slow
def test_pipelined_track_sequence_matches_monolithic():
    """pipeline_chunk segments the scan across jit calls with a carried
    state — records, poses, and the final graph trajectory must be
    BIT-IDENTICAL to the single-program form."""
    poses = synthetic.circular_trajectory(13, radius=0.05, rot_amplitude=0.03)
    iu8, du16 = _raw_sequence(poses)
    stamps = np.arange(len(poses)) / 30.0

    ss_a = StreamingSLAM(K, CFG)
    est_a = ss_a.track_sequence(iu8, du16, stamps)
    ss_b = StreamingSLAM(K, CFG)
    est_b = ss_b.track_sequence(iu8, du16, stamps, pipeline_chunk=5)
    np.testing.assert_array_equal(est_a, est_b)
    assert len(ss_a.records) == len(ss_b.records) == len(poses)
    for a, b in zip(ss_a.records, ss_b.records):
        assert a.accept == b.accept and a.forced == b.forced
        np.testing.assert_array_equal(a.kf_T, b.kf_T)
        np.testing.assert_array_equal(a.odo_T, b.odo_T)
    sa, pa = ss_a.trajectory()
    sb, pb = ss_b.trajectory()
    np.testing.assert_array_equal(sa, sb)
    np.testing.assert_array_equal(pa, pb)


def test_pipeline_chunk_of_one_rejected():
    """pipeline_chunk=1 would silently corrupt records (the chunked
    bootstrap reads frames [0] and [1]; JAX clamps the OOB index)."""
    ss = StreamingSLAM(K, CFG)
    iu8 = np.zeros((4,) + SHAPE, np.uint8)
    du16 = np.ones((4,) + SHAPE, np.uint16)
    with pytest.raises(ValueError, match="pipeline_chunk"):
        ss.track_sequence(iu8, du16, np.arange(4) / 30.0, pipeline_chunk=1)
    ss.graph.shutdown()


def test_reset_after_poisoned_backend_recovers():
    """reset() is the documented recovery path after a back-end failure:
    it must discard the poisoned graph WITHOUT re-raising the captured
    worker error, and the fresh graph must accept work."""
    ss = StreamingSLAM(K, CFG)
    ss.graph.add(object())  # poison the worker
    ss.graph._queue.join()
    assert ss.graph._poisoned
    ss.reset()  # must not raise
    assert not ss.graph._poisoned
    ss.graph.shutdown()
