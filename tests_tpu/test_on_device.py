"""On-chip canaries: the paths the CPU tier cannot execute.

1. The REAL Mosaic lowering of the fused two-pass Pallas kernel vs its
   XLA twin at the production L1 shape (tests/test_pallas.py only runs
   interpret=True on the CPU mesh — the round-3 bench was the first and
   only exercise of the actual lowering, and it faulted).
2. The pose-graph host-pinning policy: with a TPU default backend every
   optimize() must route its f64 solve to the CPU device and survive.
3. A small streaming SLAM end-to-end smoke (front-end scan on the chip,
   replayed back end, final optimization).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvo_slam_tpu.ops.camera import Intrinsics
from dvo_slam_tpu.ops import pallas_kernels as pk


L1_N = 320 * 240  # the production L1 pixel count (bench operating point)


def _synthetic_packs(n, seed=0):
    """Plausible channel-major (sampled, refpack) pairs: valid flags,
    meter-scale depths, unit-scale intensities/derivatives."""
    rng = np.random.default_rng(seed)
    depth = rng.uniform(0.8, 3.0, n).astype(np.float32)
    mk = lambda scale: rng.normal(0.0, scale, n).astype(np.float32)
    valid = (rng.random(n) < 0.8).astype(np.float32)
    sampled = np.stack([
        rng.uniform(0, 255, n).astype(np.float32),  # intensity
        depth + mk(0.01),                            # sampled depth
        mk(2.0), mk(2.0),                            # intensity derivs
        mk(0.02), mk(0.02),                          # depth derivs
        valid,                                       # validity
        depth + mk(0.005),                           # transformed z
    ])
    x = rng.uniform(-1, 1, n).astype(np.float32)
    y = rng.uniform(-1, 1, n).astype(np.float32)
    refpack = np.stack([
        rng.uniform(0, 255, n).astype(np.float32),   # intensity
        depth,                                       # ref depth
        mk(2.0), mk(2.0),                            # ref intensity derivs
        x * depth, y * depth,                        # cached unprojection
        (rng.random(n) < 0.9).astype(np.float32),    # selection
        np.zeros(n, np.float32),
    ])
    return jnp.asarray(sampled), jnp.asarray(refpack)


def test_fused_pallas_matches_xla_twin_on_chip():
    """Non-interpret Mosaic kernel == XLA twin at the L1 shape."""
    K = Intrinsics(517.3, 516.5, 318.6, 255.3).scale(0.5)
    sampled, refpack = _synthetic_packs(L1_N)
    precision3 = jnp.asarray([1.0, 0.0, 1.0], jnp.float32)
    first = jnp.asarray(1, jnp.int32)

    run_p = jax.jit(
        lambda s, r: pk.fused_stats_pallas(s, r, precision3, first, K)
    )
    run_x = jax.jit(
        lambda s, r: pk.fused_stats_xla(s, r, precision3, first, K)
    )
    sp = jax.tree.map(np.asarray, run_p(sampled, refpack))
    sx = jax.tree.map(np.asarray, run_x(sampled, refpack))
    assert int(sp.num_valid) == int(sx.num_valid) and int(sp.num_valid) > 0
    np.testing.assert_allclose(sp.m00, sx.m00, rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(sp.v, sx.v, rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(sp.scale_sum, sx.scale_sum, rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(sp.log_sum, sx.log_sum, rtol=1e-3, atol=1.0)
    # second iteration (first=0: lagged weights active)
    run_p2 = jax.jit(
        lambda s, r: pk.fused_stats_pallas(
            s, r, precision3 * 3.0, jnp.asarray(0, jnp.int32), K
        )
    )
    run_x2 = jax.jit(
        lambda s, r: pk.fused_stats_xla(
            s, r, precision3 * 3.0, jnp.asarray(0, jnp.int32), K
        )
    )
    sp2 = jax.tree.map(np.asarray, run_p2(sampled, refpack))
    sx2 = jax.tree.map(np.asarray, run_x2(sampled, refpack))
    np.testing.assert_allclose(sp2.m00, sx2.m00, rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(sp2.log_sum, sx2.log_sum, rtol=1e-3, atol=1.0)


def test_pose_graph_solve_routes_to_host():
    """Under a TPU default backend, optimize() pins the f64 solve to the
    CPU device (models/pose_graph.py module doc: the round-3 crash was an
    emulated-f64 Schur solve on the chip) and converges."""
    from dvo_slam_tpu.models import pose_graph as pg
    from dvo_slam_tpu.ops import se3

    dev = pg._host_solve_device()
    assert dev is not None and dev.platform == "cpu", dev

    rng = np.random.default_rng(1)
    n = 200  # past DENSE_SOLVER_MAX_VERTICES -> schur/cg policy
    step = np.asarray(
        se3.exp_se3(jnp.asarray([0.1, 0, 0, 0, 0, 2 * np.pi / n], jnp.float32))
    )
    g = pg.PoseGraph()
    g.add_vertex(0, np.eye(4), fixed=True)
    true = np.eye(4)
    est = np.eye(4)
    for i in range(1, n):
        noisy = step @ np.asarray(
            se3.exp_se3(jnp.asarray(rng.normal(0, 3e-3, 6), jnp.float32))
        )
        est = est @ noisy
        g.add_vertex(i, est)
        g.add_edge(i - 1, i, noisy, np.eye(6))
        true = true @ step
    g.add_edge(n - 1, 0, np.linalg.inv(true) @ np.eye(4), np.eye(6))
    hist = g.optimize(iterations=25)
    assert np.isfinite(hist).all()
    assert hist[-1] < 0.1 * hist[0], hist


@pytest.mark.slow
def test_streaming_slam_smoke_on_chip():
    """20-frame full pipeline on the chip: scanned front end + replayed
    back end + final optimization, gated on ATE."""
    from dvo_slam_tpu.config import (
        GraphConfig, KeyframeConfig, SlamConfig, TrackerConfig,
    )
    from dvo_slam_tpu.models.streaming import StreamingSLAM
    from dvo_slam_tpu.utils import synthetic, trajectory

    K = Intrinsics(160.0, 160.0, 79.5, 59.5)
    cfg = SlamConfig(
        tracker=TrackerConfig(
            first_level=2, last_level=0, max_iterations_per_level=25,
            precision=1e-4, use_initial_estimate=True,
        ),
        keyframe=KeyframeConfig(
            max_translational_distance=0.05, min_entropy_ratio=0.6,
            min_equation_system_constraint_ratio=0.3,
        ),
        graph=GraphConfig(
            new_constraint_min_entropy_ratio_coarse=0.03,
            new_constraint_min_entropy_ratio_fine=0.3,
            optimization_iterations=16,
            final_optimization_iterations=60,
        ),
    )
    n = 20
    poses = synthetic.circular_trajectory(n, radius=0.06, rot_amplitude=0.03)
    iu = np.zeros((n, 120, 160), np.uint8)
    du = np.zeros((n, 120, 160), np.uint16)
    for i in range(n):
        ii, dd, vv = synthetic.render_frame(
            poses[i], K, (120, 160), seed=i,
            depth_noise=0.002, intensity_noise=1.0,
        )
        iu[i] = np.clip(ii, 0, 255).astype(np.uint8)
        du[i] = np.where(vv, dd * 5000.0, 0).astype(np.uint16)
    stamps = np.arange(n) / 30.0
    slam = StreamingSLAM(K, cfg)
    slam.track_sequence(iu, du, stamps)
    s, p = slam.graph.trajectory()
    ate = trajectory.ate_rmse(s, p, stamps, poses)
    assert float(ate) < 0.01, ate
