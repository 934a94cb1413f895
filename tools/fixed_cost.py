"""Isolate the fixed per-frame cost of the scanned tracker.

Variants:
  build-only       — scan that only builds the pyramid per frame
  build+accel      — plus selection mask, accel tensor + quad table (L3..L1)
  3->3 single-iter — full match machinery, one IRLS iteration, L3 only
  3->3 full        — the L3-only solve with real iteration counts

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/fixed_cost.py
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
    from dvo_slam_tpu.ops.interp import build_quad_table
    from dvo_slam_tpu.ops.pyramid import (
        build_acceleration,
        build_pyramid,
        convert_raw_depth,
        selection_mask,
    )
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

    def build(cfg, int_u8, dep_u16):
        depth, valid = convert_raw_depth(dep_u16)
        return build_pyramid(int_u8.astype(jnp.float32), depth, valid, cfg.num_levels)

    def timed(track, label):
        track = jax.jit(track)
        np.asarray(track(d_int, d_dep))
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

    cfg = base

    def build_only(iu, du):
        def step(carry, frame):
            pyr = build(cfg, frame[0], frame[1])
            # touch every level so nothing is dead-code-eliminated
            s = sum(jnp.sum(l.intensity) * 1e-30 + jnp.sum(l.zdx) * 1e-30 for l in pyr)
            return carry + s, s

        return jax.lax.scan(step, jnp.zeros(()), (iu, du))[1]

    def build_accel(iu, du):
        def step(carry, frame):
            pyr = build(cfg, frame[0], frame[1])
            s = jnp.zeros(())
            for lvl in range(cfg.first_level, cfg.last_level - 1, -1):
                sel = selection_mask(pyr[lvl])
                quad = build_quad_table(build_acceleration(pyr[lvl]))
                s = s + jnp.sum(quad) * 1e-30 + sel.sum() * 1e-30
            return carry + s, s

        return jax.lax.scan(step, jnp.zeros(()), (iu, du))[1]

    def make_track(cfg):
        def track(iu, du):
            first = build(cfg, iu[0], du[0])
            eye = jnp.eye(4, dtype=jnp.float32)

            def step(carry, frame):
                prev_pyr, pose, rel_prev = carry
                cur_pyr = build(cfg, frame[0], frame[1])
                r = match_pyramids(cfg, TUM_FR1, prev_pyr, cur_pyr, rel_prev)
                pose = pose @ r.transformation
                return (cur_pyr, pose, r.transformation), pose

            return jax.lax.scan(step, (first, eye, eye), (iu[1:], du[1:]))[1]

        return track

    timed(build_only, "build-only         ")
    timed(build_accel, "build+sel+accel+quad")
    timed(
        make_track(dataclasses.replace(base, last_level=3, max_iterations_per_level=1)),
        "3->3 single-iter   ",
    )
    timed(make_track(dataclasses.replace(base, last_level=3)), "3->3 full          ")


if __name__ == "__main__":
    main()
