"""Component-level TPU timing for the dense-tracking hot path.

The sandbox relay adds ~60 ms of round-trip latency per dispatched
program, so per-call timing measures the tunnel, not the chip.  Every
component here is therefore looped ON DEVICE inside one jit program
(lax.scan over distinct per-iteration inputs) and timed as total/iters —
the same amortization bench.py's whole-sequence scan gets.

Stages:
  pyramid    — raw u8/u16 -> 4-level pyramid (+derivatives, masks)
  accel+quad — acceleration tensor + quad gather table per solved level
  gather     — warp_and_sample per solved level (the irregular access)
  partials   — fused partials kernel per solved level
  level      — one full IRLS level solve (all while_loop iterations)
  match      — full 3->1 coarse-to-fine solve

Run: PYTHONPATH=/root/repo python tools/profile_components.py [--backend pallas|fused]
"""

import argparse
import functools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="pallas", choices=["pallas", "fused", "xla"])
    ap.add_argument("--iters", type=int, default=32, help="on-device loop count")
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
    from dvo_slam_tpu.ops.interp import build_quad_table_cm
    from dvo_slam_tpu.ops.pyramid import (
        build_acceleration,
        build_pyramid,
        convert_raw_depth,
        selection_mask,
    )
    from dvo_slam_tpu.ops.residuals import warp_and_sample_cm
    from dvo_slam_tpu.utils import synthetic

    cfg = dataclasses.replace(benchmark_config().tracker, kernel_backend=args.backend)
    shape = (480, 640)
    K_ITERS = args.iters
    B = 4  # distinct input frames cycled on device

    sync = lambda out: np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

    raws = []
    for r in range(B + 1):
        intensity, depth, valid = synthetic.render_frame(
            np.eye(4), TUM_FR1, shape, seed=r, depth_noise=0.002, intensity_noise=1.0
        )
        iu8 = np.clip(intensity, 0, 255).astype(np.uint8)
        du16 = np.where(valid, depth * 5000.0, 0).astype(np.uint16)
        raws.append((iu8, du16))
    iu8_b = jnp.asarray(np.stack([r[0] for r in raws]))  # [B+1, H, W]
    du16_b = jnp.asarray(np.stack([r[1] for r in raws]))
    sync(iu8_b), sync(du16_b)

    def scanned(fn, n_inputs):
        """Build a jitted on-device loop: scan fn over K_ITERS steps,
        cycling through B distinct inputs; returns (callable, seconds/iter
        measurer).  fn takes (i, *arrays) and must return an array (chained
        into the carry so iterations cannot be elided)."""

        @jax.jit
        def run(*arrays):
            def step(carry, i):
                out = fn(i % B, *arrays)
                leaf = jax.tree.leaves(out)[0]
                return carry + jnp.sum(leaf.astype(jnp.float32)) * 1e-30, None

            total, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32), jnp.arange(K_ITERS)
            )
            return total

        def measure(*arrays):
            sync(run(*arrays))  # warmup: compile + stream executable
            best = np.inf
            for rep in range(3):
                t0 = time.perf_counter()
                sync(run(*arrays))
                best = min(best, time.perf_counter() - t0)
            return best / K_ITERS

        return measure

    # on-device input variation: index into the stacked frames
    def pyramid_of(i, iu8s, du16s):
        depth, valid = convert_raw_depth(du16s[i])
        return build_pyramid(iu8s[i].astype(jnp.float32), depth, valid, cfg.num_levels)

    t_pyr = scanned(pyramid_of, 2)(iu8_b, du16_b)
    print(f"pyramid build (4 levels, 640x480): {t_pyr*1e3:7.3f} ms/frame")

    # host-side: build pyramids once, stack per level
    pyr_fn = jax.jit(functools.partial(pyramid_of, iu8s=iu8_b, du16s=du16_b))
    pyrs = [pyr_fn(i) for i in range(B + 1)]
    for p in pyrs:
        sync(p)

    T_small = se3.exp_se3(jnp.asarray([0.01, 0.0, 0.005, 0.0, 0.0, 0.004], jnp.float32))
    sel_fn = functools.partial(
        selection_mask,
        intensity_derivative_threshold=cfg.intensity_derivative_threshold,
        depth_derivative_threshold=cfg.depth_derivative_threshold,
    )

    total_level = 0.0
    for level in range(cfg.first_level, cfg.last_level - 1, -1):
        k = TUM_FR1.at_level(level)
        stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
        lv_b = stack([p[level] for p in pyrs])  # batched PyramidLevel

        from dvo_slam_tpu.ops.pyramid import build_acceleration_cm

        lvl_w = pyrs[0][level].intensity.shape[1]
        t_accel = scanned(
            lambda i, lv: build_quad_table_cm(
                build_acceleration_cm(jax.tree.map(lambda x: x[i], lv)), lvl_w
            ),
            1,
        )(lv_b)

        # precompute refpack+quad stacks for the gather/partials stages
        rq_fn = jax.jit(
            lambda lv: (
                _build_refpack(lv, sel_fn(lv), k),
                build_quad_table_cm(build_acceleration_cm(lv), lvl_w),
            )
        )
        rps, quads = zip(*[rq_fn(p[level]) for p in pyrs])
        rp_b, quad_b = jnp.stack(rps), jnp.stack(quads)
        sync(rp_b), sync(quad_b)
        shape_l = pyrs[0][level].intensity.shape

        def gather_of(i, rp_b, quad_b):
            return warp_and_sample_cm(rp_b[i], quad_b[i], shape_l, k, T_small)

        t_gather = scanned(gather_of, 2)(rp_b, quad_b)

        # partials kernel alone over precomputed samples
        sams = []
        for rp, q in zip(rps, quads):
            s = jax.jit(lambda rp, q: warp_and_sample_cm(rp, q, shape_l, k, T_small))(rp, q)
            sync(s)
            sams.append(s)
        sam_b = jnp.stack(sams)
        p3 = jnp.asarray([3000.0, 50.0, 2.0e5], jnp.float32)
        first = jnp.asarray(0, jnp.int32)
        kern = (
            pallas_kernels.fused_partials_pallas
            if args.backend == "pallas"
            else pallas_kernels.fused_partials_xla
        )
        t_part = scanned(
            lambda i, sam_b, rp_b: kern(sam_b[i], rp_b[i], p3, first, k).m00, 2
        )(sam_b, rp_b)

        # one full level solve (all while_loop iterations)
        def level_of(i, lv):
            ref = jax.tree.map(lambda x: x[i], lv)
            cur = jax.tree.map(lambda x: x[(i + 1) % (B + 1)], lv)
            sel = sel_fn(ref)
            accel = build_acceleration(cur)
            x = se3.log_se3(jnp.eye(4, dtype=jnp.float32))
            final, stats, _ = _match_level(
                cfg, k, ref, sel, accel, x,
                se3.identity(jnp.float32), jnp.eye(4, dtype=jnp.float32),
                jnp.eye(2, dtype=jnp.float32),
            )
            return final.T

        t_level = scanned(level_of, 1)(lv_b)
        total_level += t_level

        h, w = pyrs[0][level].intensity.shape
        print(
            f"level {level} ({w:3d}x{h:3d}): accel+quad {t_accel*1e3:7.3f}  "
            f"gather {t_gather*1e3:7.3f}  partials {t_part*1e3:7.3f}  "
            f"level-solve {t_level*1e3:7.3f} ms"
        )

    pyr_b = stack(pyrs)

    def match_of(i, pyr_b):
        ref = jax.tree.map(lambda x: x[i], pyr_b)
        cur = jax.tree.map(lambda x: x[(i + 1) % (B + 1)], pyr_b)
        return match_pyramids(cfg, TUM_FR1, ref, cur, jnp.eye(4, dtype=jnp.float32)).transformation

    t_match = scanned(match_of, 1)(pyr_b)
    print(f"full match (3 levels):            {t_match*1e3:7.3f} ms")
    print(f"sum of level solves:              {total_level*1e3:7.3f} ms")
    fps = 1.0 / (t_pyr + t_match)
    print(f"pyramid + match:                  {(t_pyr + t_match)*1e3:7.3f} ms -> {fps:6.1f} fps")


if __name__ == "__main__":
    main()
