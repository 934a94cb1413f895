"""Focused TPU timing of the batched quad-table gather variants.

The lockstep multistream engine's viability hinges on how the per-
iteration bilinear gather lowers under stream batching (BASELINE.md).
This probe times, at the L1 operating shape (320x240, N = 76800):

  single   — unbatched gather: [32, N] table, [N] indices (the
             single-stream baseline)
  flat     — ONE flat gather: [32, B*N] table, [B*N] offset indices
             (what the flat-table lockstep path lowers to)
  sharedT  — vmapped bilinear_sample_quad_cm with an UNBATCHED table +
             per-stream lane offsets (flat gather + the custom_vmap
             rule's output swapaxes)
  batched  — vmapped with per-stream tables (the round-2 lockstep form:
             B unrolled gathers on slices of a [B, 32, N] operand)

Protocol: every variant loops on device inside one jit (lax.scan with
per-step index variation) — per-call host timing would measure the
sandbox relay, not the chip (see tools/profile_components.py).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/gather_probe.py
"""

import argparse
import functools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument(
        "--variant", default="all",
        choices=[
            "all", "single", "flat", "sharedT", "batched",
            "sliced", "tuple", "rowmajor", "sweep", "prepped", "dualidx",
            "pcopy", "dualbar", "tuplefull", "vmapfull",
            "tfullbar", "tfullstack", "tuplebf16",
        ],
        help="run one variant per process (tunnel compiles are slow)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from dvo_slam_tpu.ops.interp import bilinear_sample_quad_cm, gather_columns

    B = args.streams
    H, W = args.height, args.width
    N = H * W
    K_ITERS = args.iters
    rng = np.random.default_rng(0)

    sync = lambda out: np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

    def _timed(run, *arrays):
        sync(run(*arrays))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(*arrays))
            best = min(best, time.perf_counter() - t0)
        return best

    def measure(fn, *arrays):
        """Per-iteration time by SLOPE between two scan lengths — the
        relay adds a ~30 ms fixed cost per dispatched execution, which at
        a single scan length would swamp sub-ms iteration costs."""
        k_short = K_ITERS
        k_long = K_ITERS * 9
        t_short = _timed(scanned(fn, k_short), *arrays)
        t_long = _timed(scanned(fn, k_long), *arrays)
        return (t_long - t_short) / (k_long - k_short)

    def scanned(fn, k):
        @jax.jit
        def run(*arrays):
            def step(carry, i):
                out = fn(i, *arrays)
                return carry + jnp.sum(out.astype(jnp.float32)) * 1e-30, None

            total, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32), jnp.arange(k)
            )
            return total

        return run

    # smooth warp-like float coords (a small rigid shift per step so the
    # indices vary on device and nothing hoists)
    u0 = np.tile(np.arange(W, dtype=np.float32), H)
    v0 = np.repeat(np.arange(H, dtype=np.float32), W)
    u_b = jnp.asarray(np.stack([u0 + rng.uniform(0, 2) for _ in range(B)]))
    v_b = jnp.asarray(np.stack([v0 + rng.uniform(0, 2) for _ in range(B)]))
    table_b = jnp.asarray(rng.normal(size=(B, 32, N)).astype(np.float32))
    table_flat = jnp.asarray(
        np.swapaxes(np.asarray(table_b), 0, 1).reshape(32, B * N)
    )
    offs = jnp.arange(B, dtype=jnp.int32) * N
    sync(u_b), sync(v_b), sync(table_b), sync(table_flat)

    def shift(i, u):
        return u + (i % 4).astype(jnp.float32) * 0.25

    want = lambda name: args.variant in ("all", name)

    # single-stream gather (baseline)
    def single(i, table, u, v):
        out, _ = bilinear_sample_quad_cm(table, (H, W), shift(i, u), v)
        return out

    if want("single"):
        t = measure(single, table_b[0], u_b[0], v_b[0])
        print(f"single   (1 stream,  {N} rows): {t*1e3:7.3f} ms/iter", flush=True)

    # raw flat gather (no vmap anywhere)
    def flat(i, table, u, v):
        idx = (
            jnp.clip(v.astype(jnp.int32), 0, H - 2) * W
            + jnp.clip(shift(i, u).astype(jnp.int32), 0, W - 2)
        )
        idx = idx + jnp.repeat(offs, N, total_repeat_length=B * N)
        return gather_columns(table, idx)

    if want("flat"):
        t = measure(flat, table_flat, u_b.reshape(-1), v_b.reshape(-1))
        print(f"flat     ({B} streams, {B*N} rows): {t*1e3:7.3f} ms/iter", flush=True)

    # vmapped sampling on the shared flat table (the production lockstep form)
    def shared(i, table, u, v):
        out, _ = jax.vmap(
            lambda uu, vv, off: bilinear_sample_quad_cm(
                table, (H, W), shift(i, uu), vv, lane_offset=off
            ),
            in_axes=(0, 0, 0),
        )(u, v, offs)
        return out

    if want("sharedT"):
        t = measure(shared, table_flat, u_b, v_b)
        print(f"sharedT  ({B} streams, vmap+offsets): {t*1e3:7.3f} ms/iter", flush=True)

    # vmapped with per-stream tables (round-2 form)
    def batched(i, table, u, v):
        out, _ = jax.vmap(
            lambda tt, uu, vv: bilinear_sample_quad_cm(
                tt, (H, W), shift(i, uu), vv
            ),
            in_axes=(0, 0, 0),
        )(table, u, v)
        return out

    if want("batched"):
        t = measure(batched, table_b, u_b, v_b)
        print(f"batched  ({B} streams, per-stream tables): {t*1e3:7.3f} ms/iter", flush=True)

    # unrolled per-stream gathers on dynamic-sliced standalone tables: each
    # stream's [32, N] segment is sliced OUT of the flat table first (a
    # native-layout copy), then gathered exactly like the single-stream form
    def sliced(i, table, u, v):
        outs = []
        for b in range(B):
            seg = jax.lax.dynamic_slice_in_dim(table, b * N, N, axis=1)
            out, _ = bilinear_sample_quad_cm(seg, (H, W), shift(i, u[b]), v[b])
            outs.append(out)
        return jnp.stack(outs)

    if want("sliced"):
        t = measure(sliced, table_flat, u_b, v_b)
        print(f"sliced   ({B} streams, slice-out + gather): {t*1e3:7.3f} ms/iter", flush=True)

    # per-stream tables as SEPARATE arrays end to end (a tuple — never one
    # stacked [B, 32, N] operand), unrolled gathers
    def tupled(i, tables, u, v):
        outs = []
        for b in range(B):
            out, _ = bilinear_sample_quad_cm(tables[b], (H, W), shift(i, u[b]), v[b])
            outs.append(out)
        return jnp.stack(outs)

    if want("tuple"):
        tables = tuple(jnp.asarray(np.asarray(table_b[b])) for b in range(B))
        sync(tables[0])
        t = measure(tupled, tables, u_b, v_b)
        print(f"tuple    ({B} streams, separate tables): {t*1e3:7.3f} ms/iter", flush=True)

    # full bilinear sampling per stream, manually unrolled (all [N] shapes,
    # no batched intermediate) — the lower bound for the production path
    if want("tuplefull"):
        tables = tuple(jnp.asarray(np.asarray(table_b[b])) for b in range(B))
        sync(tables[0])

        def tuplefull(i, tables, u, v):
            outs = []
            for b in range(B):
                out, ok = bilinear_sample_quad_cm(
                    tables[b], (H, W), shift(i, u[b]), v[b]
                )
                outs.append(out.sum() + ok.sum())
            return jnp.stack(outs)

        t = measure(tuplefull, tables, u_b, v_b)
        print(f"tuplefull({B} streams, unrolled bilinear): {t*1e3:7.3f} ms/iter", flush=True)

    # tuplefull with an explicit optimization_barrier between the raw
    # gather and the combine+reduce — does the barrier actually stop the
    # slow gather-in-fusion lowering?
    if want("tfullbar"):
        tables = tuple(jnp.asarray(np.asarray(table_b[b])) for b in range(B))
        sync(tables[0])

        def tfullbar(i, tables, u, v):
            outs = []
            for b in range(B):
                uu = jnp.clip(shift(i, u[b]), 0.0, W - 1.001)
                vv = jnp.clip(v[b], 0.0, H - 1.001)
                x0 = jnp.floor(uu)
                y0 = jnp.floor(vv)
                idx = y0.astype(jnp.int32) * W + x0.astype(jnp.int32)
                cols = jax.lax.optimization_barrier(tables[b][:, idx])
                x1w = uu - x0
                y1w = vv - y0
                x0w = 1.0 - x1w
                y0w = 1.0 - y1w
                a00, a10, a01, a11 = cols[:8], cols[8:16], cols[16:24], cols[24:32]
                val = (a00 * x0w + a10 * x1w) * y0w + (a01 * x0w + a11 * x1w) * y1w
                ok = (a00[6] > 0.5) & (a10[6] > 0.5) & (a01[6] > 0.5) & (a11[6] > 0.5)
                outs.append(val.sum() + ok.sum())
            return jnp.stack(outs)

        t = measure(tfullbar, tables, u_b, v_b)
        print(f"tfullbar ({B} streams, barrier before combine): {t*1e3:7.3f} ms/iter", flush=True)

    # tuplefull consumed via STACKED full outputs (like 'tuple') but with
    # the validity channel consumed too — isolates validity consumption
    if want("tfullstack"):
        tables = tuple(jnp.asarray(np.asarray(table_b[b])) for b in range(B))
        sync(tables[0])

        def tfullstack(i, tables, u, v):
            outs, oks = [], []
            for b in range(B):
                out, ok = bilinear_sample_quad_cm(
                    tables[b], (H, W), shift(i, u[b]), v[b]
                )
                outs.append(out)
                oks.append(ok)
            return jnp.stack(outs), jnp.stack(oks)

        t = measure(tfullstack, tables, u_b, v_b)
        print(f"tfullstk ({B} streams, stacked out+valid): {t*1e3:7.3f} ms/iter", flush=True)

    # full bilinear sampling through the PRODUCTION vmapped form:
    # vmap(bilinear_sample_quad_cm) with a closed-over tuple of standalone
    # tables + stream_index (custom_vmap unrolls only the inner gather)
    if want("vmapfull"):

        tables = tuple(jnp.asarray(np.asarray(table_b[b])) for b in range(B))
        streams = jnp.arange(B, dtype=jnp.int32)
        sync(tables[0])

        def vmapfull(i, tables, u, v, streams):
            def one(uu, vv, s):
                out, ok = bilinear_sample_quad_cm(
                    tables, (H, W), shift(i, uu), vv, stream_index=s
                )
                return out.sum() + ok.sum()

            return jax.vmap(one)(u, v, streams)

        t = measure(vmapfull, tables, u_b, v_b, streams)
        print(f"vmapfull ({B} streams, vmapped bilinear): {t*1e3:7.3f} ms/iter", flush=True)

    # bf16 tables: is the standalone-table gather BYTE-bound (bf16 would
    # halve it) or INDEX-bound (no change)?
    if want("tuplebf16"):
        tables16 = tuple(
            jnp.asarray(np.asarray(table_b[b])).astype(jnp.bfloat16)
            for b in range(B)
        )
        sync(tables16[0])

        def tupled16(i, tables, u, v):
            outs = []
            for b in range(B):
                uu = jnp.clip(shift(i, u[b]), 0.0, W - 1.001)
                vv = jnp.clip(v[b], 0.0, H - 1.001)
                idx = (
                    vv.astype(jnp.int32) * W + uu.astype(jnp.int32)
                )
                outs.append(tables[b][:, idx])
            return jnp.stack(outs)

        t = measure(tupled16, tables16, u_b, v_b)
        print(f"tuplebf16({B} streams, bf16 tables): {t*1e3:7.3f} ms/iter", flush=True)

    # row-major gather: [N, 32] table, gather ROWS on the major axis
    def rowmajor(i, table, u, v):
        idx = (
            jnp.clip(v.astype(jnp.int32), 0, H - 2) * W
            + jnp.clip(shift(i, u).astype(jnp.int32), 0, W - 2)
        )
        return table[idx]  # [N, 32]

    if want("rowmajor"):
        table_rm = jnp.asarray(np.asarray(table_b[0]).T.copy())
        sync(table_rm)
        t = measure(rowmajor, table_rm, u_b[0], v_b[0])
        print(f"rowmajor (1 stream, [N,32] row gather): {t*1e3:7.3f} ms/iter", flush=True)
        table_rm_b = jnp.asarray(
            np.swapaxes(np.asarray(table_b), 1, 2).reshape(B * N, 32).copy()
        )
        u_f, v_f = u_b.reshape(-1), v_b.reshape(-1)

        def rowmajor_flat(i, table, u, v):
            idx = (
                jnp.clip(v.astype(jnp.int32), 0, H - 2) * W
                + jnp.clip(shift(i, u).astype(jnp.int32), 0, W - 2)
            )
            idx = idx + jnp.repeat(offs, N, total_repeat_length=B * N)
            return table[idx]

        sync(table_rm_b)
        t = measure(rowmajor_flat, table_rm_b, u_f, v_f)
        print(f"rowmajor ({B} streams, [B*N,32] row gather): {t*1e3:7.3f} ms/iter", flush=True)

    # PRODUCTION shape: per-stream tables sliced out of the batched array
    # INSIDE the jit (prepare stage), optimization_barrier'd into standalone
    # buffers, then unrolled gathers inside the solver scan — models the
    # lockstep engine where tables are built per frame from the batched
    # pyramid but must not fuse into the per-iteration gather
    if want("prepped"):

        @functools.partial(jax.jit, static_argnums=0)
        def prepped_run(k, table_b, u, v):
            tables = jax.lax.optimization_barrier(
                tuple(table_b[b] for b in range(B))
            )

            def step(carry, i):
                outs = []
                for b in range(B):
                    out, _ = bilinear_sample_quad_cm(
                        tables[b], (H, W), shift(i, u[b]), v[b]
                    )
                    outs.append(out)
                tot = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
                return carry + tot * 1e-30, None

            total, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(k))
            return total

        def run_k(k):
            return lambda *a: prepped_run(k, *a)

        sync(prepped_run(K_ITERS, table_b, u_b, v_b))
        t_short = _timed(run_k(K_ITERS), table_b, u_b, v_b)
        t_long = _timed(run_k(K_ITERS * 9), table_b, u_b, v_b)
        t = (t_long - t_short) / (K_ITERS * 8)
        print(f"prepped  ({B} streams, barrier-sliced tables): {t*1e3:7.3f} ms/iter", flush=True)

    # like prepped, but each slice goes through a PALLAS identity copy —
    # a distinct output buffer the slice cannot be elided into, testing
    # whether the gather slowdown is a property of the underlying BUFFER
    # (sub-region of one big allocation) rather than the logical shape
    if want("pcopy"):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _copy_kernel(src, dst):
            dst[:] = src[:]

        def pallas_copy(x):
            blk = 3072
            c, n = x.shape
            assert n % blk == 0, (c, n)
            return pl.pallas_call(
                _copy_kernel,
                grid=(n // blk,),
                in_specs=[pl.BlockSpec((c, blk), lambda g: (0, g))],
                out_specs=pl.BlockSpec((c, blk), lambda g: (0, g)),
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            )(x)

        @functools.partial(jax.jit, static_argnums=0)
        def pcopy_run(k, table_b, u, v):
            tables = tuple(pallas_copy(table_b[b]) for b in range(B))

            def step(carry, i):
                outs = []
                for b in range(B):
                    out, _ = bilinear_sample_quad_cm(
                        tables[b], (H, W), shift(i, u[b]), v[b]
                    )
                    outs.append(out)
                tot = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
                return carry + tot * 1e-30, None

            total, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(k))
            return total

        def run_k(k):
            return lambda *a: pcopy_run(k, *a)

        sync(pcopy_run(K_ITERS, table_b, u_b, v_b))
        t_short = _timed(run_k(K_ITERS), table_b, u_b, v_b)
        t_long = _timed(run_k(K_ITERS * 9), table_b, u_b, v_b)
        t = (t_long - t_short) / (K_ITERS * 8)
        print(f"pcopy    ({B} streams, pallas-copied tables): {t*1e3:7.3f} ms/iter", flush=True)

    # the DUAL-MATCH shape with an optimization_barrier between the flat
    # gather and the batch-unflatten transpose in the custom_vmap rule
    if want("dualbar"):

        def dualbar(i, table, u, v):
            outs = []
            for b in range(2):
                idx = (
                    jnp.clip(v[b].astype(jnp.int32), 0, H - 2) * W
                    + jnp.clip(shift(i, u[b]).astype(jnp.int32), 0, W - 2)
                )
                outs.append(table[:, idx])
            return jnp.stack(outs)

        t = measure(dualbar, table_b[0], u_b[:2], v_b[:2])
        print(f"dualbar  (2 streams, two N-idx gathers, shared table): {t*1e3:7.3f} ms/iter", flush=True)

    # the DUAL-MATCH shape: ONE shared [32, N] table (stays N lanes),
    # TWO streams of indices (the batch-2 keyframe/odometry match)
    if want("dualidx"):

        def dual(i, table, u, v):
            out, _ = jax.vmap(
                lambda uu, vv: bilinear_sample_quad_cm(
                    table, (H, W), shift(i, uu), vv
                ),
                in_axes=(0, 0),
            )(u, v)
            return out

        t = measure(dual, table_b[0], u_b[:2], v_b[:2])
        print(f"dualidx  (2 streams, shared [32,{N}] table): {t*1e3:7.3f} ms/iter", flush=True)

    # where is the size cliff? single flat gather at B' = 1, 2, 4 streams
    if want("sweep"):
        for bp in (1, 2, 4):
            tb = jnp.asarray(
                np.swapaxes(np.asarray(table_b[:bp]), 0, 1).reshape(32, bp * N)
            )
            ob = jnp.arange(bp, dtype=jnp.int32) * N

            def flat_b(i, table, u, v, ob=ob, bp=bp):
                idx = (
                    jnp.clip(v.astype(jnp.int32), 0, H - 2) * W
                    + jnp.clip(shift(i, u).astype(jnp.int32), 0, W - 2)
                )
                idx = idx + jnp.repeat(ob, N, total_repeat_length=bp * N)
                return gather_columns(table, idx)

            sync(tb)
            t = measure(flat_b, tb, u_b[:bp].reshape(-1), v_b[:bp].reshape(-1))
            print(
                f"sweep    ({bp} streams, flat {bp*N} rows): {t*1e3:7.3f} ms/iter",
                flush=True,
            )


if __name__ == "__main__":
    main()
