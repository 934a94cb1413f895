"""Weak-scaling sanity on the virtual CPU mesh: for each mesh size,
compile the distributed engines, count the collectives in the optimized
HLO, and check numerical parity with the single-device path.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=/root/repo python tools/scaling_sanity.py
"""

import collections
import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def count_collectives(hlo_text):
    c = collections.Counter()
    for op in ("all-reduce", "all-gather", "reduce-scatter", "collective-permute", "all-to-all"):
        c[op] = len(re.findall(rf"\b{op}(?:-start)?\.?\d*\s*=", hlo_text))
    return {k: v for k, v in c.items() if v}


def main():
    from dvo_slam_tpu.config import TrackerConfig
    from dvo_slam_tpu.models import pose_graph as pg
    from dvo_slam_tpu.ops import se3
    from dvo_slam_tpu.parallel import distributed_ba
    from dvo_slam_tpu.parallel.mesh import make_mesh

    # distributed block-CG BA: collective counts per mesh size + parity
    def chain_graph(n=15):
        rng = np.random.default_rng(0)
        g = pg.PoseGraph()
        true = [np.eye(4)]
        for _ in range(n):
            true.append(true[-1] @ np.asarray(se3.exp_se3(jnp.asarray([0.2, 0, 0, 0, 0, 0.1], jnp.float32))))
        g.add_vertex(0, np.eye(4), fixed=True)
        pose = np.eye(4)
        for i in range(n):
            meas = np.linalg.inv(true[i]) @ true[i + 1]
            noise = np.asarray(se3.exp_se3(jnp.asarray(rng.normal(0, 0.01, 6), jnp.float32)))
            pose = pose @ meas @ noise
            g.add_vertex(i + 1, pose)
            g.add_edge(i, i + 1, meas, np.eye(6))
        g.add_edge(0, n, np.linalg.inv(true[0]) @ true[n], 100 * np.eye(6), robust=True)
        return g

    single, _ = pg.optimize(chain_graph().to_arrays(), iterations=6, solver="cg", cg_iterations=64)
    print("distributed block-CG bundle adjustment (16 vertices, 16 edges):")
    for n_dev in (2, 4, 8):
        mesh = make_mesh(n_dev)
        g = chain_graph()
        lowered = jax.jit(
            lambda a: distributed_ba.distributed_gauss_newton_cg(
                a, mesh, iterations=6, cg_iterations=64
            )
        ).lower(g.to_arrays())
        hlo = lowered.compile().as_text()
        out, _ = distributed_ba.distributed_gauss_newton_cg(
            g.to_arrays(), mesh, iterations=6, cg_iterations=64
        )
        err = float(jnp.abs(out.poses - single.poses).max())
        print(f"  mesh={n_dev}: collectives {count_collectives(hlo)}  max|dpose - single|={err:.2e}")

    # DP multistream: one stream per device, collective-free by design
    from dvo_slam_tpu.config import TrackerConfig
    from dvo_slam_tpu.parallel.multistream import _track_streams
    from dvo_slam_tpu.ops.camera import Intrinsics
    from dvo_slam_tpu.utils import synthetic
    import functools

    k = Intrinsics(40.0, 40.0, 19.5, 14.5)
    cfg = TrackerConfig(first_level=1, last_level=0, max_iterations_per_level=5)
    print("DP multistream (stream axis sharded):")
    for n_dev in (2, 4, 8):
        mesh = make_mesh(n_dev)
        from jax.sharding import NamedSharding, PartitionSpec as P

        iu = np.zeros((n_dev, 3, 30, 40), np.uint8)
        du = np.zeros((n_dev, 3, 30, 40), np.uint16)
        for b in range(n_dev):
            for t in range(3):
                i_img, d_img, v = synthetic.render_frame(np.eye(4), k, (30, 40), seed=b * 3 + t)
                iu[b, t] = np.clip(i_img, 0, 255).astype(np.uint8)
                du[b, t] = np.where(v, d_img * 5000.0, 0).astype(np.uint16)
        shard = NamedSharding(mesh, P("batch"))
        d_i = jax.device_put(iu, shard)
        d_d = jax.device_put(du, shard)
        fn = jax.jit(functools.partial(_track_streams, cfg, k))
        hlo = fn.lower(d_i, d_d).compile().as_text()
        out = np.asarray(fn(d_i, d_d))
        print(f"  mesh={n_dev}: collectives {count_collectives(hlo) or 'none'}  finite={np.isfinite(out).all()}")


if __name__ == "__main__":
    main()
