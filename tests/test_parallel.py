"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.models import pose_graph as pg
from dvo_slam_tpu.models.frames import Frame, stack_frames
from dvo_slam_tpu.ops import se3
from dvo_slam_tpu.ops.camera import Intrinsics
from dvo_slam_tpu.parallel import distributed_ba, mesh as mesh_lib
from dvo_slam_tpu.parallel.sharded_alignment import make_pair_parallel_matcher
from dvo_slam_tpu.utils import synthetic

K = Intrinsics(80.0, 80.0, 39.5, 29.5)
SHAPE = (60, 80)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def _exp(xi):
    return np.asarray(se3.exp_se3(jnp.asarray(np.asarray(xi, np.float32))))


def _chain_graph(n=12, seed=0):
    """Noisy odometry chain + exact loop edge, as a PoseGraph."""
    rng = np.random.default_rng(seed)
    true = [np.eye(4)]
    for _ in range(n):
        true.append(true[-1] @ _exp([0.3, 0.0, 0.0, 0.0, 0.0, 2 * np.pi / n]))
    g = pg.PoseGraph(vertex_capacity=16, edge_capacity=16)
    pose = np.eye(4)
    g.add_vertex(0, pose, fixed=True)
    for i in range(n):
        noise = _exp(rng.normal(0, 0.01, 6))
        meas = np.linalg.inv(true[i]) @ true[i + 1] @ noise
        pose = pose @ meas
        g.add_vertex(i + 1, pose)
        g.add_edge(i, i + 1, meas, np.eye(6))
    g.add_edge(0, n, np.linalg.inv(true[0]) @ true[n], 100 * np.eye(6), robust=True)
    return g, np.asarray(true)


def test_distributed_ba_matches_single_device():
    """Edge-sharded GN with psum must agree with the single-device solver."""
    g1, true = _chain_graph()
    g2, _ = _chain_graph()

    arrays = g1.to_arrays()._replace()
    # single-device reference
    single, hist_single = pg.optimize(arrays, iterations=10)

    m = mesh_lib.make_mesh(8)
    dist, hist_dist = distributed_ba.distributed_gauss_newton(
        g2.to_arrays(), m, iterations=10
    )
    np.testing.assert_allclose(
        np.asarray(hist_dist), np.asarray(hist_single), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(dist.poses), np.asarray(single.poses), atol=1e-4
    )
    # and it actually solved the problem
    n = g1.num_vertices - 1
    err = np.linalg.norm(np.asarray(dist.poses)[n][:3, 3] - true[n][:3, 3])
    assert err < 0.01


def test_distributed_cg_matches_single_device():
    """Edge-sharded GN with distributed block-CG (per-edge-block matvec
    psums, O(N) communication) must agree with the single-device CG solver
    — the scalable replacement for the dense [N, N, 6, 6] reduction."""
    g1, true = _chain_graph()
    g2, _ = _chain_graph()

    single, hist_single = pg.optimize(
        g1.to_arrays(), iterations=8, solver="cg", cg_iterations=128
    )
    m = mesh_lib.make_mesh(8)
    dist, hist_dist = distributed_ba.distributed_gauss_newton_cg(
        g2.to_arrays(), m, iterations=8, cg_iterations=128
    )
    np.testing.assert_allclose(
        np.asarray(hist_dist), np.asarray(hist_single), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(dist.poses), np.asarray(single.poses), atol=1e-4
    )
    n = g1.num_vertices - 1
    err = np.linalg.norm(np.asarray(dist.poses)[n][:3, 3] - true[n][:3, 3])
    assert err < 0.01


@pytest.mark.slow
def test_pair_parallel_matcher():
    """8 frame pairs sharded over 8 devices, results match ground truth."""
    cfg = TrackerConfig(first_level=1, last_level=0, max_iterations_per_level=20)
    twists = [
        [0.01 * (i % 3 - 1), 0.005 * (i % 2), 0.0, 0.0, 0.0, 0.004 * (i % 2)]
        for i in range(8)
    ]
    refs, curs, gts = [], [], []
    for i, tw in enumerate(twists):
        T = _exp(tw)
        i0, d0, v0 = synthetic.render_frame(np.eye(4), K, SHAPE, seed=i)
        i1, d1, v1 = synthetic.render_frame(T, K, SHAPE, seed=i)
        refs.append(Frame.from_arrays(i0, d0, v0, 0.0, cfg.num_levels))
        curs.append(Frame.from_arrays(i1, d1, v1, 0.1, cfg.num_levels))
        gts.append(T)

    m = mesh_lib.make_mesh(8)
    run = make_pair_parallel_matcher(cfg, K, m)
    ref_b = stack_frames(refs)
    cur_b = stack_frames(curs)
    inits = jnp.stack([jnp.eye(4, dtype=jnp.float32)] * 8)
    results = run(ref_b, cur_b, inits)
    assert results.transformation.shape == (8, 4, 4)
    for i, gt in enumerate(gts):
        est = np.asarray(results.transformation[i], np.float64)
        err = np.abs(np.asarray(se3.log_se3(jnp.asarray(
            np.linalg.inv(gt) @ est, jnp.float32))))
        assert err.max() < 5e-3, f"pair {i}: {err}"


@pytest.mark.slow
def test_pixel_sharded_matcher():
    """One alignment sharded over pixels across 8 devices must agree with
    the single-device solver."""
    from dvo_slam_tpu.models.dense_tracker import match_pyramids
    from dvo_slam_tpu.parallel.sharded_alignment import make_pixel_sharded_matcher
    import dataclasses

    cfg = TrackerConfig(
        first_level=1, last_level=0, max_iterations_per_level=25,
        kernel_backend="fused",
    )
    T_gt = _exp([0.012, -0.006, 0.008, 0.003, 0.0, 0.005])
    i0, d0, v0 = synthetic.render_frame(np.eye(4), K, SHAPE, seed=11, depth_noise=0.002)
    i1, d1, v1 = synthetic.render_frame(T_gt, K, SHAPE, seed=11, depth_noise=0.002)
    ref = Frame.from_arrays(i0, d0, v0, 0.0, cfg.num_levels).levels
    cur = Frame.from_arrays(i1, d1, v1, 0.1, cfg.num_levels).levels

    m = mesh_lib.make_mesh(8)
    run = make_pixel_sharded_matcher(cfg, K, m)
    r_sharded = run(ref, cur, jnp.eye(4, dtype=jnp.float32))
    T_sharded = r_sharded.transformation

    single = match_pyramids(cfg, K, ref, cur)
    err_vs_single = np.abs(
        np.asarray(se3.log_se3(jnp.asarray(
            np.linalg.inv(np.asarray(single.transformation, np.float64))
            @ np.asarray(T_sharded, np.float64), jnp.float32)))
    )
    assert err_vs_single.max() < 1e-4, err_vs_single
    err_vs_gt = np.abs(np.asarray(se3.log_se3(jnp.asarray(
        np.linalg.inv(T_gt) @ np.asarray(T_sharded, np.float64), jnp.float32))))
    assert err_vs_gt.max() < 5e-3, err_vs_gt
    # full TrackingResult interface: per-level stats match the single
    # solver's (same iterations/terminations -> same policy decisions)
    assert len(r_sharded.level_stats) == len(single.level_stats)
    for s_sh, s_si in zip(r_sharded.level_stats, single.level_stats):
        assert int(s_sh.valid_constraints) > 1000
        assert int(s_sh.termination) == int(s_si.termination)
        assert int(s_sh.iterations) == int(s_si.iterations)
    np.testing.assert_allclose(
        np.asarray(r_sharded.information), np.asarray(single.information),
        rtol=2e-3, atol=1e-3,
    )
    assert np.isfinite(float(r_sharded.neg_log_likelihood))


def test_distributed_ba_rejects_bad_shard_count():
    g, _ = _chain_graph()
    m = mesh_lib.make_mesh(3)
    arrays = g.to_arrays()
    try:
        distributed_ba.distributed_gauss_newton(arrays, m, iterations=1)
        raised = False
    except ValueError:
        raised = True
    assert raised


@pytest.mark.slow
def test_multistream_tracker():
    """B=8 independent streams, vmapped + DP-sharded: each trajectory must
    match the single-stream tracker on the same frames."""
    from dvo_slam_tpu.parallel.multistream import make_multistream_tracker

    cfg = TrackerConfig(first_level=1, last_level=0, max_iterations_per_level=15)
    B, T = 8, 4
    rng = np.random.default_rng(3)
    intensity = np.zeros((B, T) + SHAPE, np.uint8)
    depth = np.zeros((B, T) + SHAPE, np.uint16)
    gt = np.zeros((B, T, 4, 4))
    for b in range(B):
        pose = np.eye(4)
        step = _exp([0.008 * (b % 3 - 1), 0.004, 0.0, 0.0, 0.0, 0.003 * (b % 2)])
        for t in range(T):
            gt[b, t] = pose
            i_img, d_img, v_img = synthetic.render_frame(pose, K, SHAPE, seed=b)
            intensity[b, t] = np.clip(i_img, 0, 255).astype(np.uint8)
            depth[b, t] = np.where(v_img, d_img * 5000.0, 0).astype(np.uint16)
            pose = pose @ step

    m = mesh_lib.make_mesh(8)
    run = make_multistream_tracker(cfg, K, m)
    poses = np.asarray(run(jnp.asarray(intensity), jnp.asarray(depth)), np.float64)
    assert poses.shape == (B, T - 1, 4, 4)
    for b in range(B):
        for t in range(1, T):
            err = np.abs(np.asarray(se3.log_se3(jnp.asarray(
                np.linalg.inv(gt[b, t]) @ poses[b, t - 1], jnp.float32))))
            assert err.max() < 8e-3, f"stream {b} frame {t}: {err}"


@pytest.mark.slow
def test_temporal_tracker_matches_sequential():
    """Sequence-parallel chunked tracking must reproduce the sequential
    frame-to-frame trajectory (same pairwise alignments, re-anchored)."""
    from dvo_slam_tpu.parallel.multistream import make_multistream_tracker
    from dvo_slam_tpu.parallel.temporal import make_temporal_tracker

    cfg = TrackerConfig(first_level=1, last_level=0, max_iterations_per_level=15)
    T = 9
    poses = [np.eye(4)]
    for t in range(1, T):
        poses.append(poses[-1] @ _exp([0.006, -0.003, 0.0, 0.0, 0.0, 0.004]))
    intensity = np.zeros((T,) + SHAPE, np.uint8)
    depth = np.zeros((T,) + SHAPE, np.uint16)
    for t in range(T):
        i_img, d_img, v_img = synthetic.render_frame(poses[t], K, SHAPE, seed=5)
        intensity[t] = np.clip(i_img, 0, 255).astype(np.uint8)
        depth[t] = np.where(v_img, d_img * 5000.0, 0).astype(np.uint16)

    m = mesh_lib.make_mesh(8)
    run_seq = make_multistream_tracker(cfg, K)
    seq = np.asarray(
        run_seq(jnp.asarray(intensity[None]), jnp.asarray(depth[None]))[0], np.float64
    )
    run_par = make_temporal_tracker(cfg, K, m, num_chunks=4)
    par = run_par(jnp.asarray(intensity), jnp.asarray(depth))
    assert par.shape == (T - 1, 4, 4)
    for t in range(T - 1):
        err = np.abs(np.asarray(se3.log_se3(jnp.asarray(
            np.linalg.inv(seq[t]) @ par[t], jnp.float32))))
        assert err.max() < 1e-3, f"frame {t}: {err}"
        err_gt = np.abs(np.asarray(se3.log_se3(jnp.asarray(
            np.linalg.inv(poses[t + 1]) @ par[t], jnp.float32))))
        assert err_gt.max() < 8e-3, f"frame {t} vs gt: {err_gt}"


def test_multistream_sequential_matches_lockstep():
    """The sequential (offline-throughput) schedule must produce the same
    trajectories as the lockstep schedule, modulo lockstep's extra
    refinement iterations on already-converged streams."""
    from dvo_slam_tpu.parallel.multistream import make_multistream_tracker
    from dvo_slam_tpu.ops import se3 as _se3

    cfg = TrackerConfig(first_level=1, last_level=0, max_iterations_per_level=15,
                        precision=1e-4, use_initial_estimate=True)
    B, T, shape = 3, 4, (60, 80)
    k = Intrinsics(80.0, 80.0, 39.5, 29.5)
    iu = np.zeros((B, T) + shape, np.uint8)
    du = np.zeros((B, T) + shape, np.uint16)
    for b in range(B):
        poses = synthetic.circular_trajectory(T, radius=0.02 + 0.01 * b)
        for t in range(T):
            i_img, d_img, v = synthetic.render_frame(poses[t], k, shape, seed=7 * b + t)
            iu[b, t] = np.clip(i_img, 0, 255).astype(np.uint8)
            du[b, t] = np.where(v, d_img * 5000.0, 0).astype(np.uint16)
    lockstep = make_multistream_tracker(cfg, k)(jnp.asarray(iu), jnp.asarray(du))
    sequential = make_multistream_tracker(cfg, k, schedule="sequential")(
        jnp.asarray(iu), jnp.asarray(du)
    )
    assert sequential.shape == (B, T - 1, 4, 4)
    for b in range(B):
        for t in range(T - 1):
            err = np.abs(np.asarray(_se3.log_se3(jnp.asarray(
                np.linalg.inv(np.asarray(lockstep[b, t], np.float64))
                @ np.asarray(sequential[b, t], np.float64), jnp.float32))))
            assert err.max() < 1e-3, (b, t, err.max())


def test_distributed_schur_matches_single_device():
    """Chain-sharded Schur-complement BA (per-device tridiagonal
    elimination, one reduced [S, S, 6, 6] psum per GN iteration) must
    agree with the single-device Schur solver and the dense oracle."""

    def build(n=48, loop_every=8):
        rng = np.random.default_rng(7)
        true = [np.eye(4)]
        for _ in range(n):
            true.append(true[-1] @ _exp([0.3, 0.0, 0.0, 0.0, 0.0, 2 * np.pi / n]))
        g = pg.PoseGraph(vertex_capacity=64, edge_capacity=64)
        g.add_vertex(0, np.eye(4), fixed=True)
        pose = np.eye(4)
        for i in range(n):
            meas = (
                np.linalg.inv(true[i]) @ true[i + 1] @ _exp(rng.normal(0, 0.01, 6))
            )
            pose = pose @ meas
            g.add_vertex(i + 1, pose)
            g.add_edge(i, i + 1, meas, np.eye(6))
        for i in range(0, n - loop_every, loop_every):
            g.add_edge(
                i, i + loop_every,
                np.linalg.inv(true[i]) @ true[i + loop_every],
                50.0 * np.eye(6), robust=True,
            )
        return g

    g1 = build()
    struct = g1._chain_structure(max_level=0)
    assert struct is not None
    assert struct.seg_len.shape[0] > 1  # several chains to shard
    arrays = g1.to_arrays()

    single, hist_single = pg._optimize_schur_jit(arrays, struct, 10, pg.CAUCHY_DELTA)
    dense, hist_dense = pg.optimize(arrays, iterations=10, solver="dense")

    m = mesh_lib.make_mesh(8)
    dist, hist_dist = distributed_ba.distributed_gauss_newton_schur(
        arrays, struct, m, iterations=10
    )
    np.testing.assert_allclose(
        np.asarray(hist_dist), np.asarray(hist_single), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dist.poses), np.asarray(single.poses), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dist.poses), np.asarray(dense.poses), atol=1e-3
    )


@pytest.mark.slow
def test_dp_e2e_slam_on_mesh():
    """The WHOLE pipeline under the mesh: 8 loop-closing sequences, one
    per virtual device, through the DP-sharded scanned front end AND the
    replayed back end (keyframe graph, loop-closure validation waves,
    dense final optimization) — every stream's optimized trajectory must
    pass its ATE gate.  This is the reference's whole-pipeline contract
    (benchmark_slam.cpp:352-525) in its multi-chip form."""
    from dvo_slam_tpu.config import (
        GraphConfig, KeyframeConfig, SlamConfig, TrackerConfig,
    )
    from dvo_slam_tpu.parallel.dp_slam import DataParallelSLAM
    from dvo_slam_tpu.utils import trajectory

    cfg = SlamConfig(
        tracker=TrackerConfig(
            first_level=1, last_level=0, use_initial_estimate=True,
        ),
        keyframe=KeyframeConfig(
            max_translational_distance=0.06,
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
    b, t = 8, 16
    gt = np.zeros((b, t, 4, 4))
    iu8 = np.zeros((b, t) + SHAPE, np.uint8)
    du16 = np.zeros((b, t) + SHAPE, np.uint16)
    for s in range(b):
        poses = synthetic.circular_trajectory(
            t, radius=0.035 + 0.004 * s, rot_amplitude=0.02
        )
        gt[s] = poses
        for i, p in enumerate(poses):
            i_, d_, v_ = synthetic.render_frame(
                p, K, SHAPE, seed=31 * s + i, depth_noise=0.002,
                intensity_noise=1.0,
            )
            iu8[s, i] = np.clip(i_, 0, 255).astype(np.uint8)
            du16[s, i] = np.where(v_, d_ * 5000.0, 0).astype(np.uint16)

    m = mesh_lib.make_mesh(8)
    dp = DataParallelSLAM(K, cfg, mesh=m)
    stamps = np.arange(t) / 30.0
    online = dp.track_sequences(iu8, du16, stamps)
    assert online.shape == (b, t, 4, 4)
    for s, (st, opt) in enumerate(dp.trajectories()):
        ate_on = trajectory.ate_rmse(stamps, online[s], stamps, gt[s])
        ate_opt = trajectory.ate_rmse(st, opt, stamps, gt[s])
        assert ate_on < 0.01, (s, ate_on)
        assert ate_opt < 0.01, (s, ate_opt)
        assert len(dp.slams[s].graph.keyframes) >= 1
    # DP parity: a stream tracked alone (no mesh, same program) produces
    # the same record stream bit-for-bit
    solo = StreamingSLAM_parity_check(cfg, iu8[0], du16[0], stamps)
    np.testing.assert_array_equal(online[0], solo)
    dp.shutdown()


def StreamingSLAM_parity_check(cfg, iu8, du16, stamps):
    from dvo_slam_tpu.models.streaming import StreamingSLAM

    ss = StreamingSLAM(K, cfg)
    _, poses = ss.track_frontend(iu8, du16)
    ss.graph.shutdown()
    return poses


def test_multistream_unbuffered_sampling_mode():
    """depth_buffered_sampling=False (the lockstep fast mode — the 5 cm
    rule costs 2x gather-iteration time in the lockstep unroll,
    tools/zbuffer_probe.py) must stay schedule-consistent and track a
    clean scene to the same accuracy as the buffered default."""
    from dvo_slam_tpu.parallel.multistream import make_multistream_tracker
    from dvo_slam_tpu.ops import se3 as _se3

    base = TrackerConfig(first_level=1, last_level=0,
                         max_iterations_per_level=15, precision=1e-4,
                         use_initial_estimate=True)
    import dataclasses

    nobuf = dataclasses.replace(base, depth_buffered_sampling=False)
    B, T, shape = 2, 4, (60, 80)
    k = Intrinsics(80.0, 80.0, 39.5, 29.5)
    iu = np.zeros((B, T) + shape, np.uint8)
    du = np.zeros((B, T) + shape, np.uint16)
    gt = []
    for b in range(B):
        poses = synthetic.circular_trajectory(T, radius=0.02 + 0.01 * b)
        gt.append(poses)
        for t in range(T):
            i_img, d_img, v = synthetic.render_frame(
                poses[t], k, shape, seed=7 * b + t, depth_noise=0.002
            )
            iu[b, t] = np.clip(i_img, 0, 255).astype(np.uint8)
            du[b, t] = np.where(v, d_img * 5000.0, 0).astype(np.uint16)
    lock = make_multistream_tracker(nobuf, k)(jnp.asarray(iu), jnp.asarray(du))
    seq = make_multistream_tracker(nobuf, k, schedule="sequential")(
        jnp.asarray(iu), jnp.asarray(du)
    )
    buf = make_multistream_tracker(base, k)(jnp.asarray(iu), jnp.asarray(du))
    for b in range(B):
        for t in range(T - 1):
            # schedules agree in the unbuffered mode
            err = np.abs(np.asarray(_se3.log_se3(jnp.asarray(
                np.linalg.inv(np.asarray(lock[b, t], np.float64))
                @ np.asarray(seq[b, t], np.float64), jnp.float32))))
            assert err.max() < 1e-3, (b, t, err.max())
            # clean scene: unbuffered tracks like buffered
            err2 = np.abs(np.asarray(_se3.log_se3(jnp.asarray(
                np.linalg.inv(np.asarray(lock[b, t], np.float64))
                @ np.asarray(buf[b, t], np.float64), jnp.float32))))
            assert err2.max() < 1e-3, (b, t, err2.max())
