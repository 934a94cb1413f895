"""Isolate the hard-scene odometry ATE (VERDICT r3 item 5).

Round 3 measured ate_rmse_hard_m = 0.0187 vs 0.00055 easy — 34x.  The
hard config differs from easy in BOTH scene (occluding slab, >1 m depth
discontinuity) and motion (radius 0.15 vs 0.05, rot 0.12 vs 0.02 rad,
z_amplitude 0.05 vs 0).  This probe factorizes the 2x2 grid
{easy,hard scene} x {easy,hard motion} through the exact bench tracker
(same jit, same operating point) and prints per-config ATE plus the
per-frame relative-pose error profile (drift vs spikes).

Run on the TPU (bench shapes, warm cache) or CPU:
    python tools/hard_ate_probe.py [--frames 100] [--rpe]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--configs", type=str, default="ee,he,eh,hh",
                    help="scene/motion pairs: e=easy h=hard")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from dvo_slam_tpu.config import benchmark_config
    from dvo_slam_tpu.models.dense_tracker import match_pyramids
    from dvo_slam_tpu.ops.camera import TUM_FR1
    from dvo_slam_tpu.ops.pyramid import build_pyramid, convert_raw_depth
    from dvo_slam_tpu.ops import se3
    from dvo_slam_tpu.utils import synthetic, trajectory

    cfg = benchmark_config().tracker
    shape = (480, 640)
    T = args.frames

    def build(int_u8, dep_u16):
        depth, valid = convert_raw_depth(dep_u16)
        return build_pyramid(
            int_u8.astype(jnp.float32), depth, valid, cfg.num_levels,
            skip_below=cfg.last_level,
        )

    @jax.jit
    def track_sequence(intensity_u8, depth_u16):
        first = build(intensity_u8[0], depth_u16[0])
        eye = jnp.eye(4, dtype=jnp.float32)

        def step(carry, frame):
            prev_pyr, pose, rel_prev = carry
            cur_pyr = build(frame[0], frame[1])
            r = match_pyramids(cfg, TUM_FR1, prev_pyr, cur_pyr, rel_prev)
            pose = pose @ r.transformation
            return (cur_pyr, pose, r.transformation), pose

        (_, _, _), out = jax.lax.scan(
            step, (first, eye, eye), (intensity_u8[1:], depth_u16[1:])
        )
        return out

    def motion(kind):
        if kind == "e":
            return synthetic.circular_trajectory(T, radius=0.05, rot_amplitude=0.02)
        return synthetic.circular_trajectory(
            T, radius=0.15, rot_amplitude=0.12, z_amplitude=0.05
        )

    def scene(kind):
        return None if kind == "e" else synthetic.occluded_scene()

    stamps = np.arange(T) / 30.0
    for config in args.configs.split(","):
        sc, mo = config[0], config[1]
        poses = motion(mo)
        sc_obj = scene(sc)
        iu = np.zeros((T,) + shape, np.uint8)
        du = np.zeros((T,) + shape, np.uint16)
        for i in range(T):
            intensity, depth, valid = synthetic.render_frame(
                poses[i], TUM_FR1, shape, scene=sc_obj, seed=1000 + i,
                depth_noise=0.002, intensity_noise=1.0,
            )
            iu[i] = np.clip(intensity, 0, 255).astype(np.uint8)
            du[i] = np.where(valid, depth * 5000.0, 0).astype(np.uint16)
        d_i, d_d = jnp.asarray(iu), jnp.asarray(du)
        np.asarray(d_i[0, 0, 0])
        t0 = time.perf_counter()
        out = np.asarray(track_sequence(d_i, d_d), np.float64)
        wall = time.perf_counter() - t0
        est = np.concatenate([np.eye(4)[None], out])
        ate = trajectory.ate_rmse(stamps, est, stamps, poses)
        # per-frame relative-pose error: ||log(gt_rel^-1 est_rel)||
        rel_terr = np.zeros(T - 1)
        rel_rerr = np.zeros(T - 1)
        for i in range(T - 1):
            gt_rel = np.linalg.inv(poses[i]) @ poses[i + 1]
            est_rel = np.linalg.inv(est[i]) @ est[i + 1]
            d = np.linalg.inv(gt_rel) @ est_rel
            xi = np.asarray(se3.log_se3(jnp.asarray(d[None], jnp.float64)))[0]
            rel_terr[i] = np.linalg.norm(xi[:3])
            rel_rerr[i] = np.linalg.norm(xi[3:])
        worst = np.argsort(rel_terr)[-5:][::-1]
        print(json.dumps({
            "config": {"scene": sc, "motion": mo},
            "ate_rmse_m": round(float(ate), 6),
            "rpe_t_mean_mm": round(float(rel_terr.mean() * 1000), 4),
            "rpe_t_max_mm": round(float(rel_terr.max() * 1000), 4),
            "rpe_r_mean_mrad": round(float(rel_rerr.mean() * 1000), 4),
            "worst_frames": [int(w) for w in worst],
            "worst_mm": [round(float(rel_terr[w] * 1000), 4) for w in worst],
            "wall_s": round(wall, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
