"""[SUPERSEDED by the channel-major layout refactor; kept for measurement-methodology history — see hotpath3/4 and profile_components for current probes]

Close the per-frame cost accounting: glue, one full iteration, one full
level solve, and a full real-motion match, all iteration-dependent (so XLA
cannot hoist them out of the measuring scan) at 256 on-device reps.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/hotpath2.py
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
    from dvo_slam_tpu.models.dense_tracker import _build_refpack, _match_level
    from dvo_slam_tpu.ops import pallas_kernels, robust, se3, least_squares
    from dvo_slam_tpu.ops.camera import TUM_FR1
    from dvo_slam_tpu.ops.interp import build_quad_table
    from dvo_slam_tpu.ops.pyramid import (
        build_acceleration, build_pyramid, convert_raw_depth, selection_mask,
    )
    from dvo_slam_tpu.ops.residuals import warp_and_sample
    from dvo_slam_tpu.utils import synthetic

    cfg = benchmark_config().tracker
    shape = (480, 640)
    K_ITERS = 256
    sync = lambda out: np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

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

    # floor reference
    t_floor = measure(lambda i, x: x + i.astype(jnp.float32), jnp.zeros((8, 128), jnp.float32))
    print(f"floor (tiny i-dependent add):     {t_floor*1e6:8.1f} us")

    # glue: 6x6 solve + exp/log/compose, i-dependent
    A = jnp.eye(6, dtype=jnp.float32) * 100.0
    b = jnp.ones(6, jnp.float32)
    def glue(i, A, b):
        x = least_squares.solve_ldlt(A + 1e-9 * i.astype(jnp.float32), b)
        inc = se3.exp_se3(x)
        Tn = inc @ jnp.eye(4, dtype=jnp.float32)
        return se3.log_se3(se3.inverse(inc) @ Tn) + x
    t_glue = measure(glue, A, b)
    print(f"solve+se3 glue:                   {t_glue*1e6:8.1f} us")

    # real-motion frame pair at bench operating point
    poses = synthetic.circular_trajectory(12, radius=0.05, rot_amplitude=0.02)
    pyrs = []
    for i in range(2):
        intensity, depth, valid = synthetic.render_frame(
            poses[i], TUM_FR1, shape, seed=i, depth_noise=0.002, intensity_noise=1.0)
        iu8 = np.clip(intensity, 0, 255).astype(np.uint8)
        du16 = np.where(valid, depth * 5000.0, 0).astype(np.uint16)
        d, v = convert_raw_depth(jnp.asarray(du16))
        pyrs.append(build_pyramid(jnp.asarray(iu8).astype(jnp.float32), d, v, cfg.num_levels))
    ref, cur = pyrs
    sync(ref[1].intensity), sync(cur[1].intensity)

    # one full L1 iteration chain (gather->partials->ll->assemble->solve->exp)
    level = 1
    k = TUM_FR1.at_level(level)
    lv_r, lv_c = ref[level], cur[level]
    accel = build_acceleration(lv_c)
    quad = build_quad_table(accel)
    refpack = _build_refpack(lv_r, selection_mask(lv_r, 0.0, 0.0), k)
    sync(quad), sync(refpack)
    dof = cfg.influence_function_param
    p3 = jnp.asarray([3000.0, 50.0, 2.0e5], jnp.float32)

    def one_iter(i, depth_r, accel, quad, refpack):
        T = se3.exp_se3(jnp.zeros(6, jnp.float32).at[0].set(1e-7 * i.astype(jnp.float32) + 0.005))
        sampled, z_t, _ = warp_and_sample(depth_r, accel, k, T, quad=quad)
        sampled = sampled.at[:, 7].set(z_t)
        parts = pallas_kernels.fused_partials_pallas(sampled, refpack, p3, jnp.asarray(0, jnp.int32), k, dof)
        denom = jnp.maximum(parts.num_valid - 3.0, 1.0)
        precision_new = robust.precision_from_scale(pallas_kernels.scale_matrix(parts) / denom)
        ll = robust.tdist_log_likelihood(parts.residuals, precision_new, parts.weights > 0, dof)
        Am, bm = pallas_kernels.assemble_normal_equations(parts, precision_new)
        x = least_squares.solve_ldlt(Am + cfg.mu * jnp.eye(6, dtype=jnp.float32), bm)
        return se3.exp_se3(x)[0] + ll
    t_iter = measure(one_iter, lv_r.depth, accel, quad, refpack)
    print(f"one full L1 iteration:            {t_iter*1e6:8.1f} us")

    # one full level solve (while_loop, real motion, cold start)
    def level_solve(i, lv_r, lv_c):
        sel = selection_mask(lv_r, 0.0, 0.0)
        acc = build_acceleration(lv_c)
        x = jnp.zeros(6, jnp.float32).at[0].set(1e-7 * i.astype(jnp.float32))
        final, stats, _ = _match_level(
            cfg, k, lv_r, sel, acc, x, se3.identity(jnp.float32),
            jnp.eye(4, dtype=jnp.float32), jnp.eye(2, dtype=jnp.float32))
        return final.T[0, 3] + stats.iterations.astype(jnp.float32)
    t_level = measure(level_solve, lv_r, lv_c)
    print(f"one full L1 level solve:          {t_level*1e6:8.1f} us")

    # full 3->1 match on the real-motion pair (identity init; the scan
    # cannot hoist because the init depends on i)
    from dvo_slam_tpu.models.dense_tracker import match_pyramids
    def full_match(i, ref, cur):
        init = jnp.eye(4, dtype=jnp.float32).at[0, 3].add(1e-7 * i.astype(jnp.float32))
        r = match_pyramids(cfg, TUM_FR1, ref, cur, init)
        return r.transformation
    t_match = measure(full_match, ref, cur)
    print(f"full 3->1 match (real motion):    {t_match*1e6:8.1f} us")

    # pyramid build, i-dependent
    intensity, depth, valid = synthetic.render_frame(
        poses[0], TUM_FR1, shape, seed=0, depth_noise=0.002, intensity_noise=1.0)
    iu8 = jnp.asarray(np.clip(intensity, 0, 255).astype(np.uint8))
    du16 = jnp.asarray(np.where(valid, depth * 5000.0, 0).astype(np.uint16))
    def pyr_build(i, iu8, du16):
        d, v = convert_raw_depth(du16 + (i % 2).astype(jnp.uint16))
        p = build_pyramid(iu8.astype(jnp.float32), d, v, cfg.num_levels, skip_below=cfg.last_level)
        return p[1].intensity
    t_pyr = measure(pyr_build, iu8, du16)
    print(f"pyramid (skip_below, i-dep):      {t_pyr*1e6:8.1f} us")


if __name__ == "__main__":
    main()
