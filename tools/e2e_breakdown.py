"""Wall-clock breakdown of the e2e SLAM bench (round-4 perf drill).

Separates: render (host), front-end scan+decode, replay (host graph
bookkeeping + worker overlap), final optimization; prints seconds and the
implied fps.  Uses the exact bench configuration so the compiled programs
are shared with bench.py's cache.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from dvo_slam_tpu.config import benchmark_config
    from dvo_slam_tpu.models.streaming import StreamingSLAM
    from dvo_slam_tpu.ops.camera import TUM_FR1
    from dvo_slam_tpu.utils import synthetic, trajectory

    shape = (480, 640)
    e2e_frames = 200
    t0 = time.perf_counter()
    e2e_poses = synthetic.circular_trajectory(
        e2e_frames, radius=0.15, rot_amplitude=0.12, z_amplitude=0.05
    )
    from bench import render_sequence

    hard_scene = synthetic.occluded_scene()
    e2e_i, e2e_d = render_sequence(e2e_poses, shape, scene=hard_scene, seed0=2000)
    render_s = time.perf_counter() - t0
    e2e_stamps = np.arange(e2e_frames) / 30.0

    slam = StreamingSLAM(TUM_FR1, benchmark_config())
    # warm (compile everything)
    slam.track_sequence(e2e_i, e2e_d, e2e_stamps)
    slam.reset()

    e2e_i2 = e2e_i.copy()
    e2e_i2[:, 0, :] += 1

    import jax.numpy as jnp

    from dvo_slam_tpu.models.streaming import host_reduce_ingest

    t0 = time.perf_counter()
    if slam.ingest_level:
        iu_r, du_r = host_reduce_ingest(e2e_i2, e2e_d, slam.ingest_level)
    else:
        iu_r, du_r = e2e_i2, e2e_d
    reduce_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    d_i = jnp.asarray(iu_r)
    d_d = jnp.asarray(du_r)
    np.asarray(d_i[0, 0, 0])
    np.asarray(d_d[0, 0, 0])
    upload_s = time.perf_counter() - t0
    print(json.dumps({"reduce_s": round(reduce_s, 2)}), flush=True)

    force = np.zeros(e2e_frames, bool)
    force[-1] = True
    t0 = time.perf_counter()
    raw = np.asarray(
        slam._run(d_i, d_d, jnp.asarray(force),
                  jnp.asarray(np.eye(4, dtype=np.float32)))
    )
    scan_s = time.perf_counter() - t0

    from dvo_slam_tpu.models.streaming import _decode
    t0 = time.perf_counter()
    records = [_decode(raw[i]) for i in range(e2e_frames)]
    poses = np.stack([r.pose for r in records])
    decode_s = time.perf_counter() - t0
    fe_s = upload_s + scan_s + decode_s
    print(json.dumps({"upload_s": round(upload_s, 2),
                      "scan_s": round(scan_s, 2),
                      "decode_s": round(decode_s, 2)}), flush=True)

    t0 = time.perf_counter()
    slam.records = records
    slam._replay(records, e2e_i2, e2e_d, e2e_stamps)
    slam.graph.wait_for_queue()
    replay_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    slam.graph.final_optimization()
    final_s = time.perf_counter() - t0

    ate = trajectory.ate_rmse(*slam.graph.trajectory(), e2e_stamps, e2e_poses)
    # ATE decomposition (VERDICT r4 item 8): how much of the e2e error is
    # the front end (online trajectory from the records) vs the back end
    # (keyframe-anchored rebuild + loop edges + final optimization)?
    ate_online = trajectory.ate_rmse(e2e_stamps, poses, e2e_stamps, e2e_poses)
    print(json.dumps({"ate_online_m": round(float(ate_online), 5),
                      "ate_optimized_m": round(float(ate), 5)}), flush=True)
    total = fe_s + replay_s + final_s
    phases = {
        name: round(s["total_s"], 3)
        for name, s in slam.graph.timers.summary().items()
    }
    print(json.dumps({
        "render_s": round(render_s, 2),
        "frontend_s": round(fe_s, 2),
        "replay_s": round(replay_s, 2),
        "final_s": round(final_s, 2),
        "total_s": round(total, 2),
        "fps": round(e2e_frames / total, 2),
        "ate_m": round(float(ate), 5),
        "keyframes": len(slam.graph.keyframes),
        "edges": slam.graph.graph.num_edges,
        "vertices": slam.graph.graph.num_vertices,
        "worker_phase_totals_s": phases,
    }))


if __name__ == "__main__":
    main()
