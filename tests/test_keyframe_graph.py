"""KeyframeGraph internals: vertex promotion, edge levels, timestamps,
checkpoint/restore, threaded ingestion, and a longer-sequence stress."""

import numpy as np
import pytest
import jax.numpy as jnp

from dvo_slam_tpu.config import GraphConfig, KeyframeConfig, SlamConfig, TrackerConfig
from dvo_slam_tpu.models.frames import Frame
from dvo_slam_tpu.models.keyframe_tracker import KeyframeTracker
from dvo_slam_tpu.models.keyframe_graph import ODOMETRY_EDGE_LEVEL
from dvo_slam_tpu.ops.camera import Intrinsics
from dvo_slam_tpu.utils import serialization, synthetic, trajectory

K = Intrinsics(80.0, 80.0, 39.5, 29.5)
SHAPE = (60, 80)

CFG = SlamConfig(
    tracker=TrackerConfig(
        first_level=1, last_level=0, max_iterations_per_level=25,
        precision=1e-4, use_initial_estimate=True,
    ),
    keyframe=KeyframeConfig(
        max_translational_distance=0.05,
        min_entropy_ratio=0.6,
        min_equation_system_constraint_ratio=0.3,
    ),
    graph=GraphConfig(
        new_constraint_min_entropy_ratio_coarse=0.03,
        new_constraint_min_entropy_ratio_fine=0.3,
        optimization_iterations=16,
        final_optimization_iterations=60,
    ),
)


def _run(poses, cfg=CFG, use_threading=False, finish=True):
    kt = KeyframeTracker(K, cfg, use_threading=use_threading)
    kt.init()
    for i, pose in enumerate(poses):
        i_, d_, v_ = synthetic.render_frame(pose, K, SHAPE, seed=i)
        kt.update(kt.make_frame(i_, d_, v_, i / 30.0))
    if finish:
        kt.force_keyframe()
        kt.finish()
    return kt


@pytest.mark.slow
def test_graph_structure_invariants():
    poses = synthetic.linear_trajectory(12, np.array([0.015, 0, 0]), np.zeros(3))
    kt = _run(poses)
    g = kt.graph.graph
    kf_ids = sorted(k.id for k in kt.graph.keyframes)
    assert kf_ids == list(range(1, len(kf_ids) + 1))
    # every keyframe key resolves; timestamps exist for all vertices
    for k in kt.graph.keyframes:
        assert g.has_vertex(("kf", k.id))
        assert ("kf", k.id) in kt.graph.timestamps
    for key in g.vertex_keys():
        assert key in kt.graph.timestamps
    # consecutive keyframes share a level-0 edge (the promoted keyframe
    # edge); intermediate odometry edges sit at the odometry level
    for a, b in zip(kf_ids[:-1], kf_ids[1:]):
        e = g.find_edge(("kf", a), ("kf", b))
        assert e is not None and g.edge_level[e] == 0, (a, b)
    levels = g.edge_level[: g.num_edges]
    # after dense final optimization everything was promoted to level 0
    assert (levels == 0).all()
    # trajectory covers every input frame exactly once
    stamps, p = kt.trajectory()
    assert len(stamps) == len(poses)
    assert len(np.unique(stamps)) == len(poses)


@pytest.mark.slow
def test_edge_levels_before_final():
    poses = synthetic.linear_trajectory(10, np.array([0.015, 0, 0]), np.zeros(3))
    kt = _run(poses, finish=False)
    g = kt.graph.graph
    levels = g.edge_level[: g.num_edges]
    assert (levels == ODOMETRY_EDGE_LEVEL).any()  # odometry edges demoted
    assert (levels == 0).any()  # promoted keyframe edges


@pytest.mark.slow
def test_keyframe_graph_checkpoint_roundtrip(tmp_path):
    poses = synthetic.circular_trajectory(14, radius=0.05)
    kt = _run(poses)
    path = str(tmp_path / "slam_state.npz")
    serialization.save_keyframe_graph(path, kt.graph)

    from dvo_slam_tpu.models.keyframe_graph import KeyframeGraph

    restored = KeyframeGraph(K, CFG.graph, CFG.tracker)
    serialization.load_keyframe_graph_state(path, restored)

    s1, p1 = kt.trajectory()
    s2, p2 = restored.trajectory()
    np.testing.assert_allclose(s1, s2)
    np.testing.assert_allclose(p1, p2, atol=1e-6)
    assert [k.id for k in restored.keyframes] == [k.id for k in kt.graph.keyframes]
    # the restored graph still optimizes
    restored.graph.optimize(iterations=5, max_level=2)


@pytest.mark.slow
def test_threaded_backend_matches_synchronous():
    poses = synthetic.linear_trajectory(10, np.array([0.015, 0, 0]), np.zeros(3))
    kt_sync = _run(poses, use_threading=False, finish=False)
    kt_thr = _run(poses, use_threading=True, finish=False)
    kt_thr.graph.wait_for_queue()
    assert len(kt_thr.graph.keyframes) == len(kt_sync.graph.keyframes)
    # the worker serializes the same work: trajectories are bit-identical
    s1, p1 = kt_sync.graph.trajectory()
    s2, p2 = kt_thr.graph.trajectory()
    np.testing.assert_allclose(s1, s2)
    np.testing.assert_allclose(p1, p2)
    kt_thr.graph.shutdown()


def test_threading_default_follows_config():
    """The optimizer thread is ON by default (reference UseMultiThreading,
    config.cpp:38) and off when the config disables it."""
    from dvo_slam_tpu.models.keyframe_graph import KeyframeGraph

    kg = KeyframeGraph(K, GraphConfig(), TrackerConfig())
    assert kg._thread is not None
    kg.shutdown()
    kg2 = KeyframeGraph(
        K, GraphConfig(use_multi_threading=False), TrackerConfig()
    )
    assert kg2._thread is None


def test_worker_exception_surfaces_poisons_and_keeps_draining():
    """A failing local map must not kill the worker: the first error
    surfaces at the next wait point (wait_for_queue / shutdown), later
    queue items still drain (a dead worker would hang wait_for_queue
    forever — the reference's thread would die silently,
    keyframe_graph.cpp:401-432), and the graph is POISONED: its
    pending-promotion state is stale, so further add() must refuse
    instead of silently mis-anchoring the trajectory."""
    from dvo_slam_tpu.models.keyframe_graph import KeyframeGraph

    kg = KeyframeGraph(K, GraphConfig(), TrackerConfig(), use_threading=True)
    kg.add(object())  # poison: not a LocalMap -> worker raises
    kg.add(object())  # must still be drained after the failure
    with pytest.raises(RuntimeError, match="worker failed"):
        kg.wait_for_queue()
    # error reported exactly once; the queue drained
    kg.wait_for_queue()
    # ...but the graph refuses further ingestion
    with pytest.raises(RuntimeError, match="poisoned"):
        kg.add(object())
    kg.shutdown()


@pytest.mark.slow
def test_long_sequence_capacity_growth():
    """Enough keyframes/edges to cross PoseGraph capacity doublings."""
    poses = synthetic.circular_trajectory(40, radius=0.12, rot_amplitude=0.04)
    kt = _run(poses)
    assert len(kt.graph.keyframes) >= 5
    stamps, est = kt.trajectory()
    gt_stamps = np.arange(40) / 30.0
    ate = trajectory.ate_rmse(stamps, est, gt_stamps, poses)
    assert ate < 0.01, ate


def test_final_optimization_runs_full_schedule():
    """The reference always runs 10 optimize rounds in finalOptimization
    (keyframe_graph.cpp:266-281), even with outlier removal off; early
    exit must be opt-in."""
    from dvo_slam_tpu.models.keyframe_graph import KeyframeGraph

    k = Intrinsics(40.0, 40.0, 19.5, 14.5)

    def count_rounds(graph_cfg):
        kg = KeyframeGraph(k, graph_cfg, TrackerConfig(first_level=1, last_level=0))
        calls = []
        orig = kg.graph.optimize
        kg.graph.optimize = lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1]
        kg.final_optimization()
        return len(calls)

    assert count_rounds(GraphConfig(final_optimization_remove_outliers=False)) == 10
    assert (
        count_rounds(
            GraphConfig(
                final_optimization_remove_outliers=False,
                final_optimization_early_exit=True,
            )
        )
        == 1
    )


@pytest.mark.slow
def test_checkpoint_resume_full_workflow(tmp_path):
    """The complete interrupt/resume story (new capability over the
    reference, which has no checkpointing — SURVEY.md section 5): save
    mid-sequence, restore into a FRESH back end with keyframe frames
    re-attached from the dataset, continue tracking the remaining frames
    through a new front end, then loop-close + final-optimize — the
    resumed trajectory must cover every frame and match ground truth like
    the uninterrupted run does."""
    from dvo_slam_tpu.models.keyframe_graph import KeyframeGraph

    n = 16
    poses = synthetic.circular_trajectory(n, radius=0.08, rot_amplitude=0.03)
    gt_stamps = np.arange(n) / 30.0

    def frame_at(ts):
        i = int(round(ts * 30.0))
        i_, d_, v_ = synthetic.render_frame(poses[i], K, SHAPE, seed=i)
        return Frame.from_arrays(i_, d_, v_, ts, CFG.tracker.num_levels)

    # uninterrupted reference run
    kt_full = _run(poses)
    s_full, p_full = kt_full.trajectory()
    ate_full = trajectory.ate_rmse(s_full, p_full, gt_stamps, poses)

    # interrupted run: first half, checkpoint WITHOUT finishing
    split = 9
    kt_a = _run(poses[:split], finish=False)
    path = str(tmp_path / "mid.npz")
    serialization.save_keyframe_graph(path, kt_a.graph)

    # restore into a fresh back end, re-attaching frames from the dataset
    restored = KeyframeGraph(K, CFG.graph, CFG.tracker)
    serialization.load_keyframe_graph_state(path, restored, frame_provider=frame_at)
    for k in restored.keyframes:
        assert k.frame.levels is not None  # real pyramids, not placeholders
        assert k.evaluation is not None  # running stats survived
        assert k.evaluation.ratio_with_first  # voter interface intact
    assert restored._pending_key is not None  # insertion can continue

    # continue tracking through a new front end wired to the restored
    # graph.  The checkpoint covers COMPLETED local maps only; the resume
    # point is the pending vertex's frame (the last frame in the graph) —
    # frames of the interrupted in-flight local map are re-tracked.
    kt_b = KeyframeTracker(K, CFG, graph=restored)
    resume_ts = restored.timestamps[restored._pending_key]
    resume_i = int(round(resume_ts * 30.0))
    resume_pose = restored.graph.vertex_pose(restored._pending_key)
    kt_b.init(resume_pose)
    for i in range(resume_i, n):
        kt_b.update(frame_at(i / 30.0))
    kt_b.force_keyframe()
    kt_b.finish()  # re-searches constraints over RESTORED keyframes too

    s_res, p_res = kt_b.trajectory()
    # every frame covered exactly once (the resumed map's keyframe is the
    # pending vertex's frame, renamed — no duplicate timestamp)
    assert len(np.unique(np.round(s_res * 30.0))) == n
    ate_res = trajectory.ate_rmse(s_res, p_res, gt_stamps, poses)
    assert ate_res < 0.01, (ate_res, ate_full)
    # and the resumed accuracy is in the same class as uninterrupted
    assert ate_res < max(2.5 * ate_full, 0.005), (ate_res, ate_full)


def test_map_changed_callback_on_worker_does_not_deadlock():
    """A map_changed callback firing on the WORKER thread may read
    trajectory()/edge_errors() (the live-viewer pattern,
    interactive_viz.attach_live_viewer): their wait_for_queue must not
    join the worker's own unfinished queue item — that self-join hung
    forever and then wedged every later wait point."""
    import time

    from dvo_slam_tpu.models.keyframe_graph import KeyframeGraph

    kg = KeyframeGraph(K, GraphConfig(), TrackerConfig(), use_threading=True)
    hit = []

    def fake_new_keyframe(m):
        kg.trajectory()  # wait_for_queue from the worker itself
        kg.edge_errors()
        hit.append(True)

    kg._new_keyframe = fake_new_keyframe
    kg.add(object())
    deadline = time.monotonic() + 20.0
    while not hit and time.monotonic() < deadline:
        time.sleep(0.01)
    assert hit, "worker deadlocked joining its own queue item"
    kg.wait_for_queue()  # main-thread wait still drains normally
    kg.shutdown()


def test_final_research_chunks_by_frame_budget():
    """The dense final re-search must validate in sub-waves bounded by
    distinct touched frames (one monolithic wave holds every keyframe's
    ~12 MB prepared artifacts resident at once), advancing in whole pair
    groups so keep-best-per-pair survives the chunking."""
    from dvo_slam_tpu.models.frames import Keyframe
    from dvo_slam_tpu.models.keyframe_graph import KeyframeGraph

    kg = KeyframeGraph(K, GraphConfig(), TrackerConfig(), use_threading=False)
    n = 9
    for i in range(1, n + 1):
        kf = Keyframe(id=i, frame=object(), pose=np.eye(4))
        kg.keyframes.append(kf)
        kg.graph.add_vertex(("kf", i), np.eye(4), fixed=(i == 1))
    kg._find_candidates = lambda kf: [c for c in kg.keyframes if c is not kf]

    waves = []
    kg.validator.MAX_CACHED_FRAMES = 4
    kg.validator.validate = lambda props: (waves.append(props), [])[1]
    kg.final_optimization()

    assert len(waves) > 1  # chunked, not monolithic
    n_pairs = (n * (n - 1)) // 2 - (n - 1)  # all non-adjacent pairs
    assert sum(len(w) for w in waves) == 2 * n_pairs
    pair_waves = {}
    for wi, w in enumerate(waves):
        # every wave respects the frame budget
        frames = {id(f) for p in w for f in (p.reference.frame, p.current.frame)}
        assert len(frames) <= 4, len(frames)
        for p in w:
            pair = frozenset({p.reference.id, p.current.id})
            pair_waves.setdefault(pair, set()).add(wi)
    # each pair appears exactly twice (identity + relative), in ONE wave
    assert all(len(ws) == 1 for ws in pair_waves.values())
    assert len(pair_waves) == n_pairs
