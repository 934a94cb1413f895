"""Bench-step decomposition with REAL cycling data (nothing hoistable):
build / prepare / match / full-step costs per frame at the benchmark
operating point, 128 on-device steps per measurement.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/hotpath3.py
"""
import functools
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from dvo_slam_tpu.config import benchmark_config
    from dvo_slam_tpu.models.dense_tracker import match_prepared, prepare_frame
    from dvo_slam_tpu.ops.camera import TUM_FR1
    from dvo_slam_tpu.ops.pyramid import build_pyramid, convert_raw_depth
    from dvo_slam_tpu.utils import synthetic

    cfg = benchmark_config().tracker
    shape = (480, 640)
    K_ITERS = 128
    B = 4
    sync = lambda out: np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

    poses = synthetic.circular_trajectory(B + 1, radius=0.003, rot_amplitude=0.002)
    iu8 = np.zeros((B + 1,) + shape, np.uint8)
    du16 = np.zeros((B + 1,) + shape, np.uint16)
    for i in range(B + 1):
        intensity, depth, valid = synthetic.render_frame(
            poses[i], TUM_FR1, shape, seed=i, depth_noise=0.002, intensity_noise=1.0)
        iu8[i] = np.clip(intensity, 0, 255).astype(np.uint8)
        du16[i] = np.where(valid, depth * 5000.0, 0).astype(np.uint16)
    iu8 = jnp.asarray(iu8)
    du16 = jnp.asarray(du16)
    sync(iu8), sync(du16)

    def measure(fn, *arrays, iters=K_ITERS):
        @jax.jit
        def run(*arrays):
            def step(carry, i):
                out = fn(i, *arrays)
                leaf = jax.tree.leaves(out)[0]
                return carry + jnp.sum(leaf.astype(jnp.float32)) * 1e-30, None
            total, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(iters))
            return total
        sync(run(*arrays))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(*arrays))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    def build(i, iu8s, du16s):
        d, v = convert_raw_depth(du16s[i])
        return build_pyramid(iu8s[i].astype(jnp.float32), d, v, cfg.num_levels,
                             skip_below=cfg.last_level)

    t_build = measure(lambda i, a, b: build(i % B, a, b)[cfg.last_level].intensity, iu8, du16)
    print(f"build pyramid (real cycling):     {t_build*1e6:8.1f} us")

    t_prep = measure(
        lambda i, a, b: prepare_frame(cfg, TUM_FR1, build(i % B, a, b)).quad[1], iu8, du16)
    print(f"build + prepare:                  {t_prep*1e6:8.1f} us")

    # pre-prepared match: stack prepared frames, index per step
    prep_jit = jax.jit(lambda i: prepare_frame(cfg, TUM_FR1, build(i, iu8, du16)))
    preps = [prep_jit(i) for i in range(B + 1)]
    for p in preps:
        sync(p)
    prep_b = jax.tree.map(lambda *xs: jnp.stack(xs), *preps)
    sync(prep_b)

    def match_only(i, prep_b):
        j = i % B
        ref = jax.tree.map(lambda x: x[j], prep_b)
        cur = jax.tree.map(lambda x: x[j + 1], prep_b)
        return match_prepared(cfg, TUM_FR1, ref, cur, None).transformation
    t_match = measure(match_only, prep_b)
    print(f"match (pre-prepared, cycling):    {t_match*1e6:8.1f} us")

    def full_step(i, iu8s, du16s):
        j = i % B
        ref = prepare_frame(cfg, TUM_FR1, build(j, iu8s, du16s))
        cur = prepare_frame(cfg, TUM_FR1, build(j + 1, iu8s, du16s))
        return match_prepared(cfg, TUM_FR1, ref, cur, None).transformation
    t_full = measure(full_step, iu8, du16)
    print(f"full step (build+prep+match x2):  {t_full*1e6:8.1f} us")


if __name__ == "__main__":
    main()
