"""Print per-level IRLS iteration counts over the bench trajectory.

The per-frame cost is (iterations x per-iteration cost) per level; this
tells us which multiplier to attack.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/iteration_stats.py
"""

import functools

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

    cfg = benchmark_config().tracker
    shape = (480, 640)
    num_frames = 12

    poses = synthetic.circular_trajectory(num_frames, radius=0.05, rot_amplitude=0.02)
    pyrs = []
    for i in range(num_frames):
        intensity, depth, valid = synthetic.render_frame(
            poses[i], TUM_FR1, shape, seed=i, depth_noise=0.002, intensity_noise=1.0
        )
        iu8 = np.clip(intensity, 0, 255).astype(np.uint8)
        du16 = np.where(valid, depth * 5000.0, 0).astype(np.uint16)
        d, v = convert_raw_depth(jnp.asarray(du16))
        pyrs.append(build_pyramid(jnp.asarray(iu8).astype(jnp.float32), d, v, cfg.num_levels))

    fn = jax.jit(functools.partial(match_pyramids, cfg, TUM_FR1))
    rel_prev = jnp.eye(4, dtype=jnp.float32)
    for i in range(num_frames - 1):
        r = fn(pyrs[i], pyrs[i + 1], rel_prev)
        stats = [
            (int(np.asarray(s.iterations)), int(np.asarray(s.termination)),
             int(np.asarray(s.valid_constraints)))
            for s in r.level_stats
        ]
        rel_prev = r.transformation
        print(f"frame {i+1:2d}: " + "  ".join(
            f"L{lvl}: it={it:3d} term={t} n={n}"
            for (it, t, n), lvl in zip(stats, range(cfg.first_level, cfg.last_level - 1, -1))
        ))


if __name__ == "__main__":
    main()
