"""Back-end scale proof: fr3/office-class graph (2,000 frames, ~300
keyframes) through the REAL KeyframeGraph pipeline (VERDICT r4 item 7).

Feeds 300 keyframe events (LocalMaps with real small-frame pyramids for
the validator + stub intermediate frames, ~6-7 frames per map — the e2e
replay shape) into the threaded back end while walking a loop-closing
circle, then runs the dense final pass with its O(K^2) re-search.
Records wall-clock per phase, graph growth, separator counts, and the
optimized ATE.

CPU-pinned (JAX_PLATFORMS=cpu): every phase measured here is host work +
host-pinned solves; loop-closure validation runs the same wave
executables the TPU path uses.
"""

import json
import os
import sys
import time

if "--tpu" in sys.argv:
    # production shape: validation waves on the device (through the
    # relay), graph bookkeeping + host-pinned f64 solves on host
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
else:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
sys.path.insert(0, "/root/repo")

import numpy as np


def main(n_keyframes=300, frames_per_map=7, shape=(60, 80)):
    from dvo_slam_tpu.config import GraphConfig, SlamConfig, TrackerConfig
    from dvo_slam_tpu.models.frames import Frame
    from dvo_slam_tpu.models.keyframe_graph import KeyframeGraph
    from dvo_slam_tpu.models.local_map import LocalMap
    from dvo_slam_tpu.models.streaming import _ReplayEvaluation, _StubFrame
    from dvo_slam_tpu.ops.camera import Intrinsics
    from dvo_slam_tpu.utils import synthetic, trajectory

    K = Intrinsics(80.0, 80.0, 39.5, 29.5)
    tcfg = TrackerConfig(first_level=1, last_level=0, use_initial_estimate=True)
    gcfg = GraphConfig(
        new_constraint_search_radius=0.08,
        new_constraint_min_entropy_ratio_coarse=0.01,
        new_constraint_min_entropy_ratio_fine=0.1,
        optimization_iterations=16,
        final_optimization_iterations=60,
    )

    total_frames = n_keyframes * frames_per_map
    gt = synthetic.circular_trajectory(
        total_frames, radius=0.35, rot_amplitude=0.03
    )
    rng = np.random.default_rng(3)

    kg = KeyframeGraph(K, gcfg, tcfg, use_threading=True)
    rel = lambda a, b: np.linalg.inv(gt[a]) @ gt[b]
    info = np.eye(6) * 5000.0

    t_feed0 = time.perf_counter()
    render_s = 0.0
    prev_map = None
    for k in range(n_keyframes):
        base = k * frames_per_map
        t_r = time.perf_counter()
        i_, d_, v_ = synthetic.render_frame(
            gt[base], K, shape, seed=base, depth_noise=0.002,
            intensity_noise=1.0,
        )
        render_s += time.perf_counter() - t_r
        kf_frame = Frame.from_arrays(i_, d_, v_, base / 30.0, tcfg.num_levels)
        # drifted pose estimate (odometry noise accumulates slowly)
        m = LocalMap.create(kf_frame, gt[base])
        for j in range(1, frames_per_map):
            i_abs = base + j
            m.add_frame(_StubFrame(i_abs / 30.0, i_abs))
            noise = rng.normal(0, 2e-4, 6)
            from dvo_slam_tpu.ops import se3
            import jax.numpy as jnp

            T_noisy = rel(i_abs - 1, i_abs) @ np.asarray(
                se3.exp_se3(jnp.asarray(noise, jnp.float64))
            )
            m.add_odometry_measurement(T_noisy, info)
            m.add_keyframe_measurement(rel(base, i_abs), info)
        m.evaluation = _ReplayEvaluation(100.0)
        # the map's last frame seeds the next keyframe: render it
        last = base + frames_per_map - 1
        t_r = time.perf_counter()
        i2, d2, v2 = synthetic.render_frame(
            gt[last], K, shape, seed=last, depth_noise=0.002,
            intensity_noise=1.0,
        )
        render_s += time.perf_counter() - t_r
        m.current_frame = Frame.from_arrays(
            i2, d2, v2, last / 30.0, tcfg.num_levels
        )
        kg.add(m)
        prev_map = m
    kg.wait_for_queue()
    feed_s = time.perf_counter() - t_feed0 - render_s
    print(json.dumps({
        "keyframes": len(kg.keyframes),
        "vertices": kg.graph.num_vertices,
        "edges_before_final": kg.graph.num_edges,
        "feed_s": round(feed_s, 2),
        "render_s": round(render_s, 2),
        "incremental_ms_per_frame": round(feed_s / total_frames * 1e3, 2),
    }), flush=True)

    t0 = time.perf_counter()
    kg.final_optimization()
    final_s = time.perf_counter() - t0

    stamps, est = kg.trajectory()
    gt_stamps = np.arange(total_frames) / 30.0
    ate = trajectory.ate_rmse(stamps, est, gt_stamps, gt)
    phases = {
        name: round(s["total_s"], 3) for name, s in kg.timers.summary().items()
    }
    sep = getattr(kg.graph, "_real_sep_count", None)
    print(json.dumps({
        "final_pass_s": round(final_s, 2),
        "final_ms_per_frame": round(final_s / total_frames * 1e3, 2),
        "edges_after_final": kg.graph.num_edges,
        "separators_last_solve": sep,
        "ate_m": round(float(ate), 5),
        "phase_totals_s": phases,
        "total_wall_s": round(feed_s + final_s, 2),
        "e2e_backend_ms_per_frame": round(
            (feed_s + final_s) / total_frames * 1e3, 2
        ),
    }), flush=True)
    kg.shutdown()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--keyframes", type=int, default=300)
    ap.add_argument("--frames-per-map", type=int, default=7)
    ap.add_argument("--tpu", action="store_true",
                    help="run validation waves on the device (handled "
                    "at import time)")
    args = ap.parse_args()
    main(args.keyframes, args.frames_per_map)
