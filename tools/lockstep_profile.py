"""Component-level TPU timing of the LOCKSTEP multistream step at B streams.

Decomposes the per-step cost of parallel/multistream._track_streams_tuple:

  build    — batched pyramid build ([B, H, W] u8/u16 -> levels)
  prepref  — batched selection + refpack per solved level
  prepcur  — per-stream standalone quad-table builds (unrolled concats)
  eval L   — ONE solver iteration's evaluate at level L: vmapped warp
             coords + unrolled standalone-table gathers + batched stats
  match    — the full vmapped coarse-to-fine dual... (B-stream) solve
  step     — the whole scan step (everything above + carries)

Protocol: every stage loops on device inside one jit (lax.scan with
per-step input variation) and is timed by the two-length slope, because
the sandbox relay adds ~30 ms fixed cost per dispatched execution.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/lockstep_profile.py --streams 8
"""

import argparse
import functools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--stages", default="all")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from dvo_slam_tpu.config import benchmark_config
    from dvo_slam_tpu.models.dense_tracker import (
        PreparedFrame, _build_refpack, match_prepared,
    )
    from dvo_slam_tpu.ops import pallas_kernels, se3
    from dvo_slam_tpu.ops.camera import TUM_FR1
    from dvo_slam_tpu.ops.interp import build_quad_table_cm
    from dvo_slam_tpu.ops.pyramid import (
        build_acceleration_cm, build_pyramid, convert_raw_depth, selection_mask,
    )
    from dvo_slam_tpu.ops.residuals import warp_and_sample_cm
    from dvo_slam_tpu.utils import synthetic

    cfg = benchmark_config().tracker
    shape = (480, 640)
    B = args.streams
    K = args.iters
    num_levels = cfg.num_levels
    none = (None,) * num_levels
    solve_range = list(range(cfg.last_level, cfg.first_level + 1))
    sync = lambda out: np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    want = lambda s: args.stages in ("all", s)

    # B streams at consecutive trajectory steps: set A = frame b, set B =
    # frame b+1 of the same 30 Hz circular path, so ref->cur motion (and
    # therefore solver iteration counts) matches the real frame-to-frame
    # engine instead of an artificial far-apart pair
    poses = synthetic.circular_trajectory(B + 1, radius=0.05, rot_amplitude=0.02)
    ints, deps = [], []
    for i in range(B + 1):
        intensity, depth, valid = synthetic.render_frame(
            poses[i], TUM_FR1, shape, seed=i, depth_noise=0.002,
            intensity_noise=1.0,
        )
        ints.append(np.clip(intensity, 0, 255).astype(np.uint8))
        deps.append(np.where(valid, depth * 5000.0, 0).astype(np.uint16))
    iu8 = jnp.asarray(np.stack(ints[:B]))
    du16 = jnp.asarray(np.stack(deps[:B]))
    iu8b = jnp.asarray(np.stack(ints[1:]))
    du16b = jnp.asarray(np.stack(deps[1:]))
    sync(iu8), sync(du16), sync(iu8b), sync(du16b)

    def _timed(run, *arrays):
        sync(run(*arrays))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(*arrays))
            best = min(best, time.perf_counter() - t0)
        return best

    def measure(fn, *arrays):
        def scanned(k):
            @jax.jit
            def run(*arrays):
                def step(carry, i):
                    out = fn(i, *arrays)
                    leaves = [
                        jnp.sum(x.astype(jnp.float32))
                        for x in jax.tree.leaves(out)
                    ]
                    return carry + sum(leaves) * 1e-30, None

                total, _ = jax.lax.scan(
                    step, jnp.zeros((), jnp.float32), jnp.arange(k)
                )
                return total

            return run

        t_short = _timed(scanned(K), *arrays)
        t_long = _timed(scanned(K * 5), *arrays)
        return (t_long - t_short) / (K * 4)

    def build(int_u8, dep_u16):
        depth, valid = convert_raw_depth(dep_u16)
        return build_pyramid(
            int_u8.astype(jnp.float32), depth, valid, num_levels,
            skip_below=cfg.last_level,
        )

    def build_b(i, iu, du, iub, dub):
        sel = (i % 2).astype(jnp.uint8)
        return jax.vmap(build)(iu + sel, du)

    if want("build"):
        t = measure(build_b, iu8, du16, iu8b, du16b)
        print(f"build    (B={B} pyramids):          {t*1e3:7.3f} ms", flush=True)

    pyr_b = jax.vmap(build)(iu8, du16)
    pyr_b2 = jax.vmap(build)(iu8b, du16b)
    sync(pyr_b), sync(pyr_b2)

    def prep_ref(pyr):
        sel = [None] * num_levels
        refpack = [None] * num_levels
        for level in solve_range:
            lv = pyr[level]
            sel[level] = selection_mask(
                lv,
                cfg.intensity_derivative_threshold,
                cfg.depth_derivative_threshold,
            )
            refpack[level] = _build_refpack(
                lv, sel[level], TUM_FR1.at_level(level)
            )
        return tuple(sel), tuple(refpack)

    def _cycle(i, t1, t2):
        # real data cycling (select between two rendered sets) so XLA
        # cannot hoist the stage out of the measurement scan; the selects
        # themselves add ~bandwidth-cost of one pyramid copy
        return jax.tree.map(
            lambda a, b: jnp.where(i % 2 == 0, a, b), t1, t2
        )

    def prep_ref_b(i, pyr_b, pyr_b2):
        return jax.vmap(prep_ref)(_cycle(i, pyr_b, pyr_b2))

    if want("prepref"):
        t = measure(prep_ref_b, pyr_b, pyr_b2)
        print(f"prepref  (B={B} sel+refpack):       {t*1e3:7.3f} ms", flush=True)

    def prep_cur(i, pyr_b, pyr_b2):
        quads = []
        for level in solve_range:
            lv_b = _cycle(i, pyr_b[level], pyr_b2[level])
            accel_b = jax.vmap(build_acceleration_cm)(lv_b)
            w = lv_b.intensity.shape[-1]
            quads.append(tuple(build_quad_table_cm(accel_b[b], w) for b in range(B)))
        return tuple(quads)

    if want("prepcur"):
        t = measure(prep_cur, pyr_b, pyr_b2)
        print(f"prepcur  (B={B} quad tables):       {t*1e3:7.3f} ms", flush=True)

    # static prepared artifacts for the eval/match stages
    sel_b, refpack_b = jax.vmap(prep_ref)(pyr_b)
    quads = jax.jit(lambda p: prep_cur(jnp.zeros((), jnp.int32), p, p))(pyr_b2)
    sync(sel_b), sync(refpack_b), sync(quads)
    streams = jnp.arange(B, dtype=jnp.int32)

    # gather-only and stats-only at L1 (isolate the eval decomposition)
    if want("gather") or want("stats"):
        level = 1
        k_lv = TUM_FR1.at_level(level)
        lv_shape = tuple(s // (2 ** level) for s in shape)
        dof = cfg.influence_function_param
        quads_lv = quads[solve_range.index(level)]

        def gather_only(i, refpack_lv, streams):
            def one(refpack, stream):
                d = (i % 4).astype(jnp.float32) * 1e-3
                T = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(d)
                return warp_and_sample_cm(
                    refpack, quads_lv, lv_shape, k_lv, T, stream_index=stream
                )

            return jax.vmap(one, in_axes=(0, 0))(refpack_lv, streams)

        if want("gather"):
            t = measure(gather_only, refpack_b[level], streams)
            print(f"gather L{level} (B={B} warp+gather):   {t*1e3:7.3f} ms/iter", flush=True)

        if want("stats"):
            sampled_b = jax.jit(gather_only)(jnp.zeros((), jnp.int32), refpack_b[level], streams)
            sync(sampled_b)

            def stats_only(i, sampled_b, refpack_lv):
                def one(sampled, refpack):
                    p3 = jnp.asarray([1.0, 0.0, 1.0], jnp.float32)
                    s = sampled.at[0, 0].add((i % 4).astype(jnp.float32) * 1e-6)
                    stats = pallas_kernels.fused_stats_pallas(
                        s, refpack, p3, jnp.asarray(1, jnp.int32), k_lv, dof
                    )
                    return stats.m00

                return jax.vmap(one)(sampled_b, refpack_lv)

            t = measure(stats_only, sampled_b, refpack_b[level])
            print(f"stats L{level}  (B={B} fused stats):    {t*1e3:7.3f} ms/iter", flush=True)

            def stats_xla_only(i, sampled_b, refpack_lv):
                def one(sampled, refpack):
                    p3 = jnp.asarray([1.0, 0.0, 1.0], jnp.float32)
                    s = sampled.at[0, 0].add((i % 4).astype(jnp.float32) * 1e-6)
                    stats = pallas_kernels.fused_stats_xla(
                        s, refpack, p3, jnp.asarray(1, jnp.int32), k_lv, dof
                    )
                    return stats.m00

                return jax.vmap(one)(sampled_b, refpack_lv)

            t = measure(stats_xla_only, sampled_b, refpack_b[level])
            print(f"statsX L{level} (B={B} XLA-twin stats): {t*1e3:7.3f} ms/iter", flush=True)

    # one solver-iteration evaluate per level: vmapped warp+gather+stats
    for level in solve_range:
        if not want("eval"):
            break
        k_lv = TUM_FR1.at_level(level)
        lv_shape = tuple(s // (2 ** level) for s in shape)
        dof = cfg.influence_function_param

        def evaluate(i, refpack_lv, quads_lv, streams):
            def one(refpack, stream):
                d = (i % 4).astype(jnp.float32) * 1e-3
                T = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(d)
                sampled = warp_and_sample_cm(
                    refpack, quads_lv, lv_shape, k_lv, T, stream_index=stream
                )
                p3 = jnp.asarray([1.0, 0.0, 1.0], jnp.float32)
                stats = pallas_kernels.fused_stats_pallas(
                    sampled, refpack, p3, jnp.asarray(1, jnp.int32), k_lv, dof
                )
                return stats.m00

            return jax.vmap(one, in_axes=(0, 0))(refpack_lv, streams)

        t = measure(
            functools.partial(evaluate),
            refpack_b[level], quads[solve_range.index(level)], streams,
        )
        print(f"eval L{level}  (B={B} warp+gather+stats): {t*1e3:7.3f} ms/iter", flush=True)

    # full vmapped coarse-to-fine match on prepared artifacts
    def matcher(sel, refpack, quads_all, stream, init):
        ref = PreparedFrame(
            levels=none, sel=sel, refpack=refpack, accel=none, quad=none
        )
        q = [None] * num_levels
        for idx, level in enumerate(solve_range):
            q[level] = quads_all[idx]
        cur = PreparedFrame(
            levels=none, sel=none, refpack=none, accel=none, quad=tuple(q)
        )
        return match_prepared(cfg, TUM_FR1, ref, cur, init, stream_index=stream)

    def match_b(i, sel_b, refpack_b, quads, streams):
        init = jnp.broadcast_to(
            jnp.eye(4, dtype=jnp.float32), (B, 4, 4)
        ).at[:, 0, 3].add((i % 4).astype(jnp.float32) * 1e-3)
        r = jax.vmap(matcher, in_axes=(0, 0, None, 0, 0))(
            sel_b, refpack_b, quads, streams, init
        )
        return r.transformation

    if want("match"):
        # iteration counts first (max over streams = the lockstep cost)
        def match_stats(sel, refpack, quads_all, stream, init):
            r = matcher(sel, refpack, quads_all, stream, init)
            return tuple(s.iterations for s in r.level_stats)

        init0 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
        iters = jax.jit(
            lambda *a: jax.vmap(match_stats, in_axes=(0, 0, None, 0, 0))(*a)
        )(sel_b, refpack_b, quads, streams, init0)
        iters = [np.asarray(x) for x in iters]
        print(
            "match    per-level iterations (coarse->fine): "
            + "  ".join(
                f"max={int(x.max())} mean={float(x.mean()):.1f}" for x in iters
            ),
            flush=True,
        )
        t = measure(match_b, sel_b, refpack_b, quads, streams)
        print(f"match    (B={B} full solve):        {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
