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
        choices=["all", "single", "flat", "sharedT", "batched"],
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


if __name__ == "__main__":
    main()
