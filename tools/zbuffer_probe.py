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

        if not batched:
            @jax.jit
            def run(table, uu, vv, zz):
                # 3 dependent samples emulate the IRLS chain
                vals, ok = one(table, uu, vv, zz)
                vals2, ok2 = one(table, uu + vals[0] * 1e-6, vv, zz)
                vals3, ok3 = one(table, uu, vv + vals2[0] * 1e-6, zz)
                return vals3.sum() + ok.sum() + ok2.sum() + ok3.sum()

            return run

        @jax.jit
        def run_b(tables, uu_b, vv_b, zz_b):
            outs = []
            for s in range(B):
                vals, ok = one(tables[s], uu_b[s], vv_b[s], zz_b[s])
                vals2, ok2 = one(tables[s], uu_b[s] + vals[0] * 1e-6, vv_b[s], zz_b[s])
                outs.append(vals2.sum() + ok.sum() + ok2.sum())
            return jnp.stack(outs)

        return run_b

    out = {}
    tables = [jnp.asarray(make_table(s)) for s in range(B)]
    uu = jnp.asarray(u); vv = jnp.asarray(v); zz = jnp.asarray(z)
    uu_b = jnp.asarray(np.stack([u + i * 0.001 for i in range(B)]))
    vv_b = jnp.asarray(np.stack([v] * B)); zz_b = jnp.asarray(np.stack([z] * B))
    np.asarray(uu[0])

    for variant in ("plain", "zbuf", "zbuf_recip", "zbuf_barrier"):
        for batched in (False, True):
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
