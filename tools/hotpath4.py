"""Layout experiments: per-stage prepare costs with real cycling data, and
channel-major vs channel-minor variants of accel/quad/gather.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/hotpath4.py
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
    from dvo_slam_tpu.ops.camera import TUM_FR1
    from dvo_slam_tpu.ops.interp import build_quad_table
    from dvo_slam_tpu.ops.pyramid import (
        build_acceleration, build_pyramid, convert_raw_depth, selection_mask,
    )
    from dvo_slam_tpu.utils import synthetic

    cfg = benchmark_config().tracker
    shape = (480, 640)
    K_ITERS = 128
    B = 4
    sync = lambda out: np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

    poses = synthetic.circular_trajectory(B, radius=0.003, rot_amplitude=0.002)
    pyrs = []
    for i in range(B):
        intensity, depth, valid = synthetic.render_frame(
            poses[i], TUM_FR1, shape, seed=i, depth_noise=0.002, intensity_noise=1.0)
        iu8 = np.clip(intensity, 0, 255).astype(np.uint8)
        du16 = np.where(valid, depth * 5000.0, 0).astype(np.uint16)
        d, v = convert_raw_depth(jnp.asarray(du16))
        pyrs.append(build_pyramid(jnp.asarray(iu8).astype(jnp.float32), d, v, cfg.num_levels))
    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    pyr_b = stack(pyrs)
    sync(pyr_b)

    def measure(fn, *arrays, iters=K_ITERS):
        @jax.jit
        def run(*arrays):
            def step(carry, i):
                out = fn(i % B, *arrays)
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

    t_floor = measure(lambda i, x: x + jnp.float32(i), jnp.zeros((8, 128), jnp.float32))
    print(f"floor: {t_floor*1e6:7.1f} us")

    for level in (1, 2):
        lv_b = jax.tree.map(lambda x: x[:, ], pyr_b)  # full stack
        lvl = lambda i: jax.tree.map(lambda x: x[i], pyr_b)[level] if False else None
        k = TUM_FR1.at_level(level)
        pick = lambda i: jax.tree.map(lambda x: x[i], pyr_b)

        t_sel = measure(lambda i, p: selection_mask(pick(i)[level], 0.0, 0.0), pyr_b)
        t_accel = measure(lambda i, p: build_acceleration(pick(i)[level]), pyr_b)
        t_quad = measure(lambda i, p: build_quad_table(build_acceleration(pick(i)[level])), pyr_b)
        t_rp = measure(lambda i, p: _build_refpack(pick(i)[level], selection_mask(pick(i)[level], 0.0, 0.0), k), pyr_b)

        # channel-major variants
        def accel_cm(i, p):
            lv = pick(i)[level]
            n = lv.intensity.size
            return jnp.stack([
                lv.intensity.reshape(n), lv.depth.reshape(n), lv.idx.reshape(n),
                lv.idy.reshape(n), lv.zdx.reshape(n), lv.zdy.reshape(n),
                lv.zvalid.astype(jnp.float32).reshape(n), jnp.zeros(n, jnp.float32),
            ])  # [8, N]
        t_accel_cm = measure(accel_cm, pyr_b)

        def quad_cm(i, p):
            a = accel_cm(i, p)  # [8, N]
            h, w = pick(i)[level].intensity.shape
            right = jnp.roll(a, -1, axis=1)
            down = jnp.roll(a, -w, axis=1)
            dr = jnp.roll(a, -(w + 1), axis=1)
            return jnp.concatenate([a, right, down, dr], axis=0)  # [32, N]
        t_quad_cm = measure(quad_cm, pyr_b)

        h, w = pyrs[0][level].intensity.shape
        print(f"L{level} ({w}x{h}): sel {t_sel*1e6:6.1f}  accel {t_accel*1e6:7.1f}  +quad {t_quad*1e6:7.1f}  refpack {t_rp*1e6:7.1f}  | CM accel {t_accel_cm*1e6:7.1f}  CM +quad {t_quad_cm*1e6:7.1f} us")

    # gather comparison at L1
    level = 1
    n = pyrs[0][level].intensity.size
    rng = np.random.default_rng(0)
    idx_b = jnp.asarray(rng.integers(0, n - 1, (B, n)).astype(np.int32))
    accel = build_acceleration(pyrs[0][level])
    quad_rm = build_quad_table(accel)  # [N, 32]
    quad_cm1 = jnp.asarray(np.asarray(quad_rm).T.copy())  # [32, N]
    sync(quad_rm), sync(quad_cm1), sync(idx_b)

    t_row = measure(lambda i, q, ix: q[ix[i]], quad_rm, idx_b)
    t_col = measure(lambda i, q, ix: q[:, ix[i]], quad_cm1, idx_b)
    t_row_t = measure(lambda i, q, ix: q[ix[i]].T, quad_rm, idx_b)
    print(f"L1 gather [N,32] rows: {t_row*1e6:7.1f}  [32,N] cols: {t_col*1e6:7.1f}  rows->T: {t_row_t*1e6:7.1f} us")

    # transpose/pad cost of the current per-iteration prep ([N,8] -> [8,Npad])
    sampled = jnp.ones((n, 8), jnp.float32)
    t_pad = measure(lambda i, s: jnp.pad(s + jnp.float32(i), ((0, (-n) % 4096), (0, 0))).T, sampled)
    print(f"L1 per-iter pad+transpose [N,8]->[8,Npad]: {t_pad*1e6:7.1f} us")


if __name__ == "__main__":
    main()
