"""Sequence-length + variant sweep for the tracking bench.

Separates fixed per-execution cost (relay round trip, upload/download)
from true per-frame cost by timing the whole-sequence scan at several
sequence lengths, and optionally a batched multi-stream variant.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_sweep.py
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", type=int, nargs="+", default=[20, 40, 80])
    ap.add_argument("--streams", type=int, default=0, help="if >0, batched multi-stream run")
    args = ap.parse_args()

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
    max_n = max(args.lengths)

    poses = synthetic.circular_trajectory(max_n, radius=0.05, rot_amplitude=0.02)
    intensity_u8 = np.zeros((max_n,) + shape, np.uint8)
    depth_u16 = np.zeros((max_n,) + shape, np.uint16)
    for i in range(max_n):
        intensity, depth, valid = synthetic.render_frame(
            poses[i], TUM_FR1, shape, seed=i, depth_noise=0.002, intensity_noise=1.0
        )
        intensity_u8[i] = np.clip(intensity, 0, 255).astype(np.uint8)
        depth_u16[i] = np.where(valid, depth * 5000.0, 0).astype(np.uint16)

    def build(int_u8, dep_u16):
        depth, valid = convert_raw_depth(dep_u16)
        return build_pyramid(int_u8.astype(jnp.float32), depth, valid, cfg.num_levels)

    import functools

    @functools.partial(jax.jit, static_argnums=())
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

    for n in args.lengths:
        d_int = jnp.asarray(intensity_u8[:n])
        d_dep = jnp.asarray(depth_u16[:n])
        np.asarray(d_int[0, 0, 0])
        out = track_sequence(d_int, d_dep)
        np.asarray(out)  # warm
        reps = 3
        variants = [d_int.at[:, 0, k].add(np.uint8(k + 1)) for k in range(reps)]
        for v in variants:
            np.asarray(v[0, 0, 0])
        times = []
        for vi in variants:
            t0 = time.perf_counter()
            out = track_sequence(vi, d_dep)
            np.asarray(out)
            times.append(time.perf_counter() - t0)
        t = min(times)
        print(
            f"n={n:4d}: total {t*1e3:8.1f} ms  per-frame {t/(n-1)*1e3:6.3f} ms "
            f"-> {(n-1)/t:7.1f} fps  (all reps: {[round(x*1e3,1) for x in times]})"
        )

    if args.streams > 0:
        s = args.streams
        n = min(40, max_n)
        ints = np.stack([np.roll(intensity_u8[:n], k, axis=0) for k in range(s)])
        deps = np.stack([np.roll(depth_u16[:n], k, axis=0) for k in range(s)])
        d_int = jnp.asarray(ints)  # [S, N, H, W]
        d_dep = jnp.asarray(deps)
        np.asarray(d_int[0, 0, 0, 0])
        batched = jax.jit(jax.vmap(track_sequence))
        out = batched(d_int, d_dep)
        np.asarray(out)
        reps = 3
        variants = [d_int.at[:, :, 0, k].add(np.uint8(k + 1)) for k in range(reps)]
        for v in variants:
            np.asarray(v[0, 0, 0, 0])
        t0 = time.perf_counter()
        for vi in variants:
            out = batched(vi, d_dep)
            np.asarray(out)
        t = (time.perf_counter() - t0) / reps
        total_frames = s * (n - 1)
        print(
            f"streams={s} n={n}: total {t*1e3:8.1f} ms -> "
            f"{total_frames/t:8.1f} frames/s aggregate ({total_frames} frames)"
        )


if __name__ == "__main__":
    main()
