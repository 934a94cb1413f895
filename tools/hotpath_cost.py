"""[SUPERSEDED by the channel-major layout refactor; kept for measurement-methodology history — see hotpath3/4 and profile_components for current probes]

Fine-grained cost decomposition of one IRLS iteration at each level.

Times each stage of the per-iteration chain (gather, partials kernel,
LL+scale+assemble chain, 6x6 solve + SE(3) glue) and each per-level setup
(selection/accel/refpack, quad table) with a 256-step on-device scan so the
relay's ~30 ms per-execution constant is <0.5% of the measurement.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/hotpath_cost.py
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
    from dvo_slam_tpu.models.dense_tracker import _build_refpack
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

    intensity, depth, valid = synthetic.render_frame(
        np.eye(4), TUM_FR1, shape, seed=0, depth_noise=0.002, intensity_noise=1.0
    )
    iu8 = jnp.asarray(np.clip(intensity, 0, 255).astype(np.uint8))
    du16 = jnp.asarray(np.where(valid, depth * 5000.0, 0).astype(np.uint16))
    sync(iu8)

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

    # pyramid
    t = measure(lambda i, a, b: build_pyramid((a + i % 2).astype(jnp.float32), *convert_raw_depth(b), cfg.num_levels, skip_below=cfg.last_level)[cfg.last_level].intensity, iu8, du16)
    print(f"pyramid build (skip_below):      {t*1e6:8.1f} us")

    d0, v0 = convert_raw_depth(du16)
    pyr = build_pyramid(iu8.astype(jnp.float32), d0, v0, cfg.num_levels)
    T_small = se3.exp_se3(jnp.asarray([0.01, 0.0, 0.005, 0.0, 0.0, 0.004], jnp.float32))
    dof = cfg.influence_function_param

    for level in (3, 2, 1):
        k = TUM_FR1.at_level(level)
        lv = pyr[level]
        sync(lv.intensity)

        t_setup = measure(
            lambda i, lv: _build_refpack(
                jax.tree.map(lambda x: x + 0 * i.astype(x.dtype) if x.dtype != bool else x, lv),
                selection_mask(lv, cfg.intensity_derivative_threshold, cfg.depth_derivative_threshold),
                k,
            ),
            lv,
        )
        accel = build_acceleration(lv)
        t_accel = measure(lambda i, lv: build_acceleration(jax.tree.map(lambda x: x + 0 * i.astype(x.dtype) if x.dtype != bool else x, lv)), lv)
        sync(accel)
        t_quad = measure(lambda i, a: build_quad_table(a + i.astype(a.dtype) * 0), accel)
        quad = build_quad_table(accel)
        sync(quad)

        t_gather = measure(
            lambda i, d, a, q: warp_and_sample(d, a, k, se3.exp_se3(jnp.zeros(6, jnp.float32).at[0].set(1e-6 * i)) @ T_small, quad=q)[0],
            lv.depth, accel, quad,
        )

        sampled, z_t, _ = warp_and_sample(lv.depth, accel, k, T_small, quad=quad)
        sampled = sampled.at[:, 7].set(z_t)
        refpack = _build_refpack(lv, selection_mask(lv, 0.0, 0.0), k)
        sync(sampled), sync(refpack)
        p3 = jnp.asarray([3000.0, 50.0, 2.0e5], jnp.float32)

        t_part = measure(
            lambda i, s, r: pallas_kernels.fused_partials_pallas(
                s.at[0, 0].add(1e-12 * i), r, p3, jnp.asarray(0, jnp.int32), k, dof
            ).m00,
            sampled, refpack,
        )

        parts = pallas_kernels.fused_partials_pallas(sampled, refpack, p3, jnp.asarray(0, jnp.int32), k, dof)
        sync(parts.m00)

        def ll_chain(i, parts_res, parts_w, m00, m01, m11, v, ssum, nvalid):
            parts2 = pallas_kernels.FusedPartials(m00, m01, m11, v, ssum + 1e-12 * i, nvalid, parts_res, parts_w)
            denom = jnp.maximum(parts2.num_valid - 3.0, 1.0)
            precision_new = robust.precision_from_scale(pallas_kernels.scale_matrix(parts2) / denom)
            ll = robust.tdist_log_likelihood(parts2.residuals, precision_new, parts2.weights > 0, dof)
            A, b = pallas_kernels.assemble_normal_equations(parts2, precision_new)
            return ll + A[0, 0] + b[0]
        t_ll = measure(ll_chain, parts.residuals, parts.weights, parts.m00, parts.m01, parts.m11, parts.v, parts.scale_sum, parts.num_valid)

        h, w = lv.intensity.shape
        print(f"L{level} ({w}x{h}): refpack+sel {t_setup*1e6:7.1f}  accel {t_accel*1e6:7.1f}  quad {t_quad*1e6:7.1f}  gather {t_gather*1e6:7.1f}  partials {t_part*1e6:7.1f}  ll+assemble {t_ll*1e6:7.1f} us")

    # the solver glue: 6x6 solve + exp/log/compose
    A = jnp.eye(6, jnp.float32) * 100.0
    b = jnp.ones(6, jnp.float32)
    def glue(i, A, b):
        x = least_squares.solve_ldlt(A + 1e-9 * i, b)
        inc = se3.exp_se3(x)
        T2 = inc @ jnp.eye(4, dtype=jnp.float32)
        return se3.log_se3(se3.inverse(inc) @ T2) + x
    t_glue = measure(glue, A, b)
    print(f"solve+se3 glue:                  {t_glue*1e6:8.1f} us")


if __name__ == "__main__":
    main()
