"""Dump the optimized HLO of the vmapped lockstep warp+gather at B=8 L1.

The lockstep engine's production warp+gather measures ~5.8 ms/iter while
the bare unrolled tuple gather measures 1.6 ms (tools/gather_probe.py vs
tools/lockstep_profile.py) — this prints the compiled HLO so the extra
cost (copies/transposes/refused fusions) can be identified.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/gather_hlo.py
"""

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from dvo_slam_tpu.config import benchmark_config
    from dvo_slam_tpu.ops.camera import TUM_FR1
    from dvo_slam_tpu.ops.residuals import warp_and_sample_cm

    cfg = benchmark_config().tracker
    B = 8
    H, W = 240, 320
    N = H * W
    level = 1
    k_lv = TUM_FR1.at_level(level)
    rng = np.random.default_rng(0)

    refpack_b = jnp.asarray(rng.normal(size=(B, 8, N)).astype(np.float32))
    tables = tuple(
        jnp.asarray(rng.normal(size=(32, N)).astype(np.float32)) for _ in range(B)
    )
    streams = jnp.arange(B, dtype=jnp.int32)
    Ts = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))

    def gather_b(refpack_b, Ts, streams):
        def one(refpack, T, stream):
            return warp_and_sample_cm(
                refpack, tables, (H, W), k_lv, T, stream_index=stream
            )

        out = jax.vmap(one)(refpack_b, Ts, streams)
        # scan so while-loop-style context applies (loop-invariant hoisting)
        return jnp.sum(out)

    def scanned(refpack_b, Ts, streams):
        def step(c, i):
            t = Ts.at[:, 0, 3].add(i.astype(jnp.float32) * 1e-3)
            return c + gather_b(refpack_b, t, streams), None

        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(8))
        return tot

    lowered = jax.jit(scanned).lower(refpack_b, Ts, streams)
    try:
        compiled = lowered.compile()
        text = compiled.as_text()
        kind = "optimized"
    except Exception as e:  # remote-compile tunnels may not return text
        text = lowered.as_text()
        kind = f"unoptimized ({e})"
    print(f"=== {kind} HLO ===")
    print(text)


if __name__ == "__main__":
    main()
