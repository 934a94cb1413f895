"""Depth-buffered sampling cost drill (VERDICT r4 items 5/6).

Measures the L1-shaped quad sample + IRLS-iteration cost on the real
chip in four variants:
  plain        — no depth buffer (the round-2 fast path)
  zbuf         — current 5 cm depth-buffered form (divide renorm)
  zbuf_recip   — renormalize with one [N] reciprocal + [8,N] multiply
  zbuf_barrier — optimization_barrier between gather and the z-combine
single-stream and 8-way lockstep (per-stream standalone tables), to
locate where the buffered form loses 4% single / 10% lockstep.

Protocol: distinct input buffers per rep (the relay memoizes), download
sync, best-of-3.
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    H, W = 240, 320  # L1 shape
    N = H * W
    B = 8
    rng = np.random.default_rng(0)

    def make_table(seed):
        r = np.random.default_rng(seed)
        t = r.normal(size=(32, N)).astype(np.float32)
        # channel 1 = depth, VALID_CHANNEL flags mostly valid
        from dvo_slam_tpu.ops.interp import VALID_CHANNEL

        for base in (0, 8, 16, 24):
            t[base + 1] = r.uniform(0.5, 3.0, N).astype(np.float32)
            t[base + VALID_CHANNEL] = (r.uniform(size=N) > 0.05).astype(np.float32)
        return t

    u = rng.uniform(1, W - 2, N).astype(np.float32)
    v = rng.uniform(1, H - 2, N).astype(np.float32)
    z = rng.uniform(0.5, 3.0, N).astype(np.float32)

    from dvo_slam_tpu.ops import interp

    def sample_fn(variant, batched):
        def one(table, uu, vv, zz):
            hh, ww = H, W
            in_b = (uu >= 0.0) & (uu < ww - 1) & (vv >= 0.0) & (vv < hh - 1)
            uu = jnp.clip(uu, 0.0, ww - 1.001)
            vv = jnp.clip(vv, 0.0, hh - 1.001)
            x0 = jnp.floor(uu); y0 = jnp.floor(vv)
            x1w = uu - x0; y1w = vv - y0
            x0w = 1.0 - x1w; y0w = 1.0 - y1w
            idx = jnp.clip(y0.astype(jnp.int32) * ww + x0.astype(jnp.int32), 0, hh * ww - 1)
            cols = table[:, idx]
            if variant == "zbuf_barrier":
                cols = jax.lax.optimization_barrier(cols)
            a00, a10, a01, a11 = cols[:8], cols[8:16], cols[16:24], cols[24:32]
            VC = interp.VALID_CHANNEL
            if variant == "plain":
                vals = (a00 * x0w + a10 * x1w) * y0w + (a01 * x0w + a11 * x1w) * y1w
                ok = (a00[VC] > 0.5) & (a10[VC] > 0.5) & (a01[VC] > 0.5) & (a11[VC] > 0.5)
                return vals, in_b & ok
            z_eps = zz - interp.DEPTH_BUFFER_M
            if variant == "zbuf_mask":
                # plain combine + drop-on-intruder: a pixel whose 2x2
                # neighborhood contains an invalid or in-front neighbor
                # is invalidated instead of renormalized
                vals = (a00 * x0w + a10 * x1w) * y0w + (a01 * x0w + a11 * x1w) * y1w
                keep = lambda a: (a[VC] > 0.5) & (a[1] > z_eps)
                ok = keep(a00) & keep(a10) & keep(a01) & keep(a11)
                return vals, in_b & ok
            keep = lambda a: (a[VC] > 0.5) & (a[1] > z_eps)
            w00 = x0w * y0w * keep(a00); w10 = x1w * y0w * keep(a10)
            w01 = x0w * y1w * keep(a01); w11 = x1w * y1w * keep(a11)
            wsum = w00 + w10 + w01 + w11
            acc = a00 * w00 + a10 * w10 + a01 * w01 + a11 * w11
            if variant == "zbuf_recip":
                vals = acc * (1.0 / jnp.maximum(wsum, 1e-6))
            else:
                vals = acc / jnp.maximum(wsum, 1e-6)
            return vals, in_b & (wsum > 1e-6)

        # 100 DEPENDENT samples inside one program: one dispatch is ~30 ms
        # of relay latency, so per-iteration compute only shows when the
        # program iterates on device (each iteration's index stream
        # depends on the previous sample — nothing hoists)
        ITERS = 100

        if not batched:
            @jax.jit
            def run(table, uu, vv, zz):
                def body(c, _):
                    u_c, acc = c
                    vals, ok = one(table, u_c, vv, zz)
                    return (uu + vals[0] * 1e-6, acc + vals[0].sum() + ok.sum()), None

                (u_f, acc), _ = jax.lax.scan(
                    body, (uu, jnp.float32(0.0)), None, length=ITERS
                )
                return acc

            return run

        if variant.endswith("_stack"):
            # gather per stream -> STACK the raw [32, N] columns -> run
            # the (z-)combine once on the stacked [B, 32, N] array: the
            # gather's only consumer is the stack, the combine vectorizes
            # over streams away from the gather lowering
            base_variant = variant[: -len("_stack")]

            @jax.jit
            def run_stack(tables, uu_b, vv_b, zz_b):
                hh, ww = H, W

                def body(c, _):
                    u_c, acc = c
                    cols_l = []
                    for s in range(B):
                        uu = jnp.clip(u_c[s], 0.0, ww - 1.001)
                        vvc = jnp.clip(vv_b[s], 0.0, hh - 1.001)
                        idx = jnp.clip(
                            jnp.floor(vvc).astype(jnp.int32) * ww
                            + jnp.floor(uu).astype(jnp.int32),
                            0, hh * ww - 1,
                        )
                        cols_l.append(tables[s][:, idx])
                    cols = jnp.stack(cols_l)  # [B, 32, N]
                    uu = jnp.clip(u_c, 0.0, ww - 1.001)
                    vvc = jnp.clip(vv_b, 0.0, hh - 1.001)
                    x1w = uu - jnp.floor(uu); y1w = vvc - jnp.floor(vvc)
                    x0w = 1.0 - x1w; y0w = 1.0 - y1w
                    a00, a10, a01, a11 = (
                        cols[:, :8], cols[:, 8:16], cols[:, 16:24], cols[:, 24:32]
                    )
                    VC = interp.VALID_CHANNEL
                    if base_variant == "plain":
                        vals = (
                            (a00 * x0w[:, None] + a10 * x1w[:, None]) * y0w[:, None]
                            + (a01 * x0w[:, None] + a11 * x1w[:, None]) * y1w[:, None]
                        )
                        ok = (
                            (a00[:, VC] > 0.5) & (a10[:, VC] > 0.5)
                            & (a01[:, VC] > 0.5) & (a11[:, VC] > 0.5)
                        )
                    else:
                        z_eps = zz_b - interp.DEPTH_BUFFER_M
                        keep = lambda a: (a[:, VC] > 0.5) & (a[:, 1] > z_eps)
                        w00 = x0w * y0w * keep(a00); w10 = x1w * y0w * keep(a10)
                        w01 = x0w * y1w * keep(a01); w11 = x1w * y1w * keep(a11)
                        wsum = w00 + w10 + w01 + w11
                        acc_v = (
                            a00 * w00[:, None] + a10 * w10[:, None]
                            + a01 * w01[:, None] + a11 * w11[:, None]
                        )
                        vals = acc_v * (1.0 / jnp.maximum(wsum, 1e-6))[:, None]
                        ok = wsum > 1e-6
                    return (
                        uu_b + vals[:, 0] * 1e-6,
                        acc + vals[:, 0].sum() + ok.sum(),
                    ), None

                (_, acc), _ = jax.lax.scan(
                    body, (uu_b, jnp.float32(0.0)), None, length=ITERS
                )
                return acc

            return run_stack

        @jax.jit
        def run_b(tables, uu_b, vv_b, zz_b):
            def body(c, _):
                u_c, acc = c
                outs = []
                u_next = []
                for s in range(B):
                    vals, ok = one(tables[s], u_c[s], vv_b[s], zz_b[s])
                    outs.append(vals[0].sum() + ok.sum())
                    u_next.append(uu_b[s] + vals[0] * 1e-6)
                return (jnp.stack(u_next), acc + jnp.stack(outs).sum()), None

            (_, acc), _ = jax.lax.scan(
                body, (uu_b, jnp.float32(0.0)), None, length=ITERS
            )
            return acc

        return run_b

    out = {}
    tables = [jnp.asarray(make_table(s)) for s in range(B)]
    uu = jnp.asarray(u); vv = jnp.asarray(v); zz = jnp.asarray(z)
    uu_b = jnp.asarray(np.stack([u + i * 0.001 for i in range(B)]))
    vv_b = jnp.asarray(np.stack([v] * B)); zz_b = jnp.asarray(np.stack([z] * B))
    np.asarray(uu[0])

    for variant in ("zbuf_mask", "plain", "zbuf"):
        for batched in (False, True):
            if variant.endswith("_stack") and not batched:
                continue
            fn = sample_fn(variant, batched)
            if batched:
                args0 = (tuple(tables), uu_b, vv_b, zz_b)
                variants_in = [
                    (tuple(tables), uu_b + k * 1e-4, vv_b, zz_b) for k in range(3)
                ]
            else:
                args0 = (tables[0], uu, vv, zz)
                variants_in = [
                    (tables[0], uu + k * 1e-4, vv, zz) for k in range(3)
                ]
            np.asarray(fn(*args0))  # compile + warm
            for a in variants_in:
                np.asarray(a[1][..., 0])
            best = 1e9
            for a in variants_in:
                t0 = time.perf_counter()
                np.asarray(fn(*a))
                best = min(best, time.perf_counter() - t0)
            key = f"{variant}_{'lockstep8' if batched else 'single'}"
            out[key] = round(best * 1e3, 3)
            print(json.dumps({key: out[key]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
