"""Per-level cost decomposition of the whole-sequence tracking bench.

Times the same scanned tracker with the fine level progressively removed:
(3->3), (3->2), (3->1).  Differences give each level's true contribution
under bench conditions (real motion, real iteration counts).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/level_cost.py
"""

import dataclasses
import functools
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from dvo_slam_tpu.config import benchmark_config
    from dvo_slam_tpu.models.dense_tracker import match_pyramids
    from dvo_slam_tpu.ops.camera import TUM_FR1
    from dvo_slam_tpu.ops.pyramid import build_pyramid, convert_raw_depth
    from dvo_slam_tpu.utils import synthetic

    base = benchmark_config().tracker
    shape = (480, 640)
    n = 40

    poses = synthetic.circular_trajectory(n, radius=0.05, rot_amplitude=0.02)
    intensity_u8 = np.zeros((n,) + shape, np.uint8)
    depth_u16 = np.zeros((n,) + shape, np.uint16)
    for i in range(n):
        intensity, depth, valid = synthetic.render_frame(
            poses[i], TUM_FR1, shape, seed=i, depth_noise=0.002, intensity_noise=1.0
        )
        intensity_u8[i] = np.clip(intensity, 0, 255).astype(np.uint8)
        depth_u16[i] = np.where(valid, depth * 5000.0, 0).astype(np.uint16)

    d_int = jnp.asarray(intensity_u8)
    d_dep = jnp.asarray(depth_u16)
    np.asarray(d_int[0, 0, 0])

    def timed(cfg, label):
        def build(int_u8, dep_u16):
            depth, valid = convert_raw_depth(dep_u16)
            return build_pyramid(int_u8.astype(jnp.float32), depth, valid, cfg.num_levels)

        @jax.jit
        def track(iu, du):
            first = build(iu[0], du[0])
            eye = jnp.eye(4, dtype=jnp.float32)

            def step(carry, frame):
                prev_pyr, pose, rel_prev = carry
                cur_pyr = build(frame[0], frame[1])
                r = match_pyramids(cfg, TUM_FR1, prev_pyr, cur_pyr, rel_prev)
                pose = pose @ r.transformation
                return (cur_pyr, pose, r.transformation), pose

            _, out = jax.lax.scan(step, (first, eye, eye), (iu[1:], du[1:]))
            return out

        np.asarray(track(d_int, d_dep))  # compile + warm
        reps = 3
        variants = [d_int.at[:, 0, k].add(np.uint8(k + 1)) for k in range(reps)]
        for v in variants:
            np.asarray(v[0, 0, 0])
        best = np.inf
        for vi in variants:
            t0 = time.perf_counter()
            np.asarray(track(vi, d_dep))
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: total {best*1e3:8.1f} ms  per-frame {best/(n-1)*1e3:6.3f} ms")
        return best

    t33 = timed(dataclasses.replace(base, last_level=3), "levels 3->3        ")
    t32 = timed(dataclasses.replace(base, last_level=2), "levels 3->2        ")
    t31 = timed(base, "levels 3->1 (full) ")
    print(f"L2 contribution: {(t32-t33)/(n-1)*1e3:6.3f} ms/frame")
    print(f"L1 contribution: {(t31-t32)/(n-1)*1e3:6.3f} ms/frame")


if __name__ == "__main__":
    main()
