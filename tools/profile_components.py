"""Component-level TPU timing for the dense-tracking hot path.

Times each stage of the per-frame work separately (with the sandbox relay
protocol: distinct inputs per rep, download-synced) so optimization effort
goes where the milliseconds are:

  pyramid   — raw u8/u16 -> 4-level pyramid (+derivatives, masks)
  accel+quad — acceleration tensor + quad gather table per solved level
  gather    — warp_and_sample per solved level (the irregular access)
  partials  — fused Pallas partials kernel per solved level
  iter      — one full IRLS iteration per solved level (gather+partials+
              stats+solve)
  match     — full 3->1 coarse-to-fine solve (as in bench.py)

Run: python tools/profile_components.py [--backend pallas|fused]
"""

import argparse
import functools
import time

import numpy as np


def timed(fn, variants, sync, reps=5):
    """Median wall time of fn over distinct pre-uploaded inputs."""
    outs = [fn(*v) for v in variants[:1]]  # warmup (compile + first exec)
    sync(outs[0])
    times = []
    for v in variants[:reps]:
        t0 = time.perf_counter()
        out = fn(*v)
        sync(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="pallas", choices=["pallas", "fused", "xla"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import dataclasses

    import jax.numpy as jnp

    from dvo_slam_tpu.config import benchmark_config
    from dvo_slam_tpu.models.dense_tracker import (
        _build_refpack,
        _match_level,
        match_pyramids,
    )
    from dvo_slam_tpu.ops import pallas_kernels, se3
    from dvo_slam_tpu.ops.camera import TUM_FR1
    from dvo_slam_tpu.ops.interp import build_quad_table
    from dvo_slam_tpu.ops.pyramid import (
        build_acceleration,
        build_pyramid,
        convert_raw_depth,
        selection_mask,
    )
    from dvo_slam_tpu.ops.residuals import warp_and_sample
    from dvo_slam_tpu.utils import synthetic

    cfg = dataclasses.replace(benchmark_config().tracker, kernel_backend=args.backend)
    shape = (480, 640)
    reps = 5

    sync = lambda out: np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

    # distinct raw frames per rep
    raws = []
    for r in range(reps + 1):
        intensity, depth, valid = synthetic.render_frame(
            np.eye(4), TUM_FR1, shape, seed=r, depth_noise=0.002, intensity_noise=1.0
        )
        iu8 = jnp.asarray(np.clip(intensity, 0, 255).astype(np.uint8))
        du16 = jnp.asarray(np.where(valid, depth * 5000.0, 0).astype(np.uint16))
        sync(iu8), sync(du16)
        raws.append((iu8, du16))

    @jax.jit
    def pyramid_fn(iu8, du16):
        depth, valid = convert_raw_depth(du16)
        return build_pyramid(iu8.astype(jnp.float32), depth, valid, cfg.num_levels)

    t_pyr = timed(pyramid_fn, raws, sync, reps)
    print(f"pyramid build (4 levels, 640x480): {t_pyr*1e3:7.3f} ms")

    pyrs = [pyramid_fn(*r) for r in raws]
    for p in pyrs:
        sync(p)

    T_small = se3.exp_se3(jnp.asarray([0.01, 0.0, 0.005, 0.0, 0.0, 0.004], jnp.float32))

    total_iter = 0.0
    for level in range(cfg.first_level, cfg.last_level - 1, -1):
        k = TUM_FR1.at_level(level)
        levels = [p[level] for p in pyrs]

        accel_fn = jax.jit(lambda lv: build_quad_table(build_acceleration(lv)))
        t_accel = timed(accel_fn, [(lv,) for lv in levels], sync, reps)

        quads = [accel_fn(lv) for lv in levels]
        accels = [jax.jit(build_acceleration)(lv) for lv in levels]
        for q in quads:
            sync(q)

        gather_fn = jax.jit(
            lambda lv, accel, quad: warp_and_sample(lv.depth, accel, k, T_small, quad=quad)
        )
        gv = [(lv, a, q) for lv, a, q in zip(levels, accels, quads)]
        t_gather = timed(gather_fn, gv, sync, reps)

        # partials kernel alone
        sampled_list = []
        for lv, a, q in gv:
            s, z_t, _ = gather_fn(lv, a, q)
            s = s.at[:, 7].set(z_t)
            sel = jax.jit(functools.partial(selection_mask,
                intensity_threshold=cfg.intensity_derivative_threshold,
                depth_threshold=cfg.depth_derivative_threshold))(lv)
            rp = jax.jit(functools.partial(_build_refpack, intrinsics=k))(lv, sel)
            sync(s), sync(rp)
            sampled_list.append((s, rp))
        p3 = jnp.asarray([3000.0, 50.0, 2.0e5], jnp.float32)
        first = jnp.asarray(0, jnp.int32)
        kern = (
            pallas_kernels.fused_partials_pallas
            if args.backend == "pallas"
            else pallas_kernels.fused_partials_xla
        )
        part_fn = jax.jit(lambda s, rp: kern(s, rp, p3, first, k))
        t_part = timed(part_fn, sampled_list, sync, reps)

        # one full level solve (all iterations) — isolates while_loop cost
        def level_fn(lv_ref, lv_cur):
            sel = selection_mask(
                lv_ref,
                cfg.intensity_derivative_threshold,
                cfg.depth_derivative_threshold,
            )
            accel = build_acceleration(lv_cur)
            x = se3.log_se3(jnp.eye(4, dtype=jnp.float32))
            final, stats = _match_level(
                cfg, k, lv_ref, sel, accel, x,
                se3.identity(jnp.float32), jnp.eye(4, jnp.float32),
                jnp.eye(2, jnp.float32),
            )
            return final.T, stats.iterations
        level_jit = jax.jit(level_fn)
        lv_pairs = [(pyrs[i][level], pyrs[i + 1][level]) for i in range(reps)]
        t_level = timed(level_jit, lv_pairs, sync, reps - 1)
        iters = int(np.asarray(level_jit(*lv_pairs[0])[1]))
        total_iter += t_level

        h, w = levels[0].intensity.shape
        print(
            f"level {level} ({w}x{h}): accel+quad {t_accel*1e3:7.3f}  "
            f"gather {t_gather*1e3:7.3f}  partials {t_part*1e3:7.3f}  "
            f"full-solve {t_level*1e3:7.3f} ms ({iters} iters)"
        )

    match_fn = jax.jit(functools.partial(match_pyramids, cfg, TUM_FR1))
    mv = [(pyrs[i], pyrs[i + 1], jnp.eye(4, jnp.float32)) for i in range(reps)]
    t_match = timed(lambda a, b, c: match_fn(a, b, c).transformation, mv, sync, reps - 1)
    print(f"full match (3 levels):            {t_match*1e3:7.3f} ms")
    print(f"sum of level solves:              {total_iter*1e3:7.3f} ms")
    print(f"pyramid + match:                  {(t_pyr + t_match)*1e3:7.3f} ms "
          f"-> {1.0/(t_pyr + t_match):6.1f} fps equivalent")


if __name__ == "__main__":
    main()
