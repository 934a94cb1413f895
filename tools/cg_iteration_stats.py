"""CG iteration counts on realistic loopy pose graphs (BASELINE evidence).

The distributed block-CG back end pays ONE [N, 6] all-reduce per CG
iteration (parallel/distributed_ba.py), so the communication cost of a
GN step on a real loopy graph is exactly the measured CG iteration
count.  This tool builds the final-optimization shape — a drifty
odometry chain with periodic loop closures (keyframe_graph.cpp:257-281's
dense graph) — and records, per GN step, how many preconditioned-CG
iterations the tol=1e-6 solve actually takes.

Run: python tools/cg_iteration_stats.py  (CPU; f64 graph math)
"""

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,2048")
    ap.add_argument("--gn-steps", type=int, default=8)
    ap.add_argument("--loop-every", type=int, default=7)
    ap.add_argument("--cap", type=int, default=8192)
    args = ap.parse_args()

    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
    sys.path.insert(0, "/root/repo")

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from dvo_slam_tpu.models import pose_graph as pg
    from dvo_slam_tpu.ops import se3

    def _exp(xi):
        return np.asarray(se3.exp_se3(jnp.asarray(np.asarray(xi, np.float64))))

    def _rel(a, b):
        return np.linalg.inv(a) @ b

    for n in [int(s) for s in args.sizes.split(",")]:
        rng = np.random.default_rng(11)
        step = [0.4, 0.0, 0.0, 0.0, 0.0, 2 * np.pi / n]
        true = [np.eye(4)]
        for _ in range(n):
            true.append(true[-1] @ _exp(step))
        g = pg.PoseGraph(dtype=np.float64)
        pose = np.eye(4)
        g.add_vertex(0, pose, fixed=True)
        for i in range(n):
            meas = _rel(true[i], true[i + 1]) @ _exp(rng.normal(0, 0.02, 6))
            pose = pose @ meas
            g.add_vertex(i + 1, pose)
            g.add_edge(i, i + 1, meas, np.eye(6))
        n_loops = 0
        for i in range(0, n - args.loop_every, args.loop_every):
            g.add_edge(
                i, i + args.loop_every,
                _rel(true[i], true[i + args.loop_every]),
                50.0 * np.eye(6), robust=True,
            )
            n_loops += 1

        arrays = g.to_arrays()
        counts, chi2s = [], []

        @jax.jit
        def gn_step_counted(arrays):
            H_ii, H_ij, H_jj, b_i, b_j, chi2 = pg.edge_blocks(arrays)
            nv = arrays.poses.shape[0]
            free = arrays.vertex_mask & ~arrays.fixed_mask
            b = jnp.zeros((nv, 6), b_i.dtype).at[arrays.edge_i].add(b_i)
            b = b.at[arrays.edge_j].add(b_j)
            dx, k = pg.solve_blocks_cg(
                nv, arrays.edge_i, arrays.edge_j, H_ii, H_ij, H_jj, -b, free,
                iterations=args.cap, return_iterations=True,
            )
            dx = jnp.where(free[:, None], dx, 0.0)
            out = arrays._replace(poses=arrays.poses @ se3.exp_se3(dx))
            return out, k, jnp.sum(jnp.where(arrays.edge_mask, chi2, 0.0))

        for _ in range(args.gn_steps):
            arrays, k, chi2 = gn_step_counted(arrays)
            counts.append(int(k))
            chi2s.append(float(chi2))

        # the auto path on the same problem: chain elimination reduces the
        # loopy graph onto its separator set (loop-closure endpoints) and
        # factorizes the reduced dense system exactly — no Krylov iteration
        import time

        struct = g._chain_structure(0)
        t0 = time.perf_counter()
        hist = g.optimize(iterations=args.gn_steps, solver="auto")
        auto_s = time.perf_counter() - t0

        print(json.dumps({
            "vertices": n + 1,
            "odometry_edges": n,
            "loop_edges": n_loops,
            "tol": 1e-6,
            "cg_iterations_per_gn_step": counts,
            "chi2_before_each_step": [round(c, 6) for c in chi2s],
            "allreduces_per_gn_step_distributed": counts,
            "schur_separators": g._real_sep_count if struct is not None else None,
            "auto_solver": "schur" if (
                struct is not None
                and g._real_sep_count <= pg.PoseGraph.SCHUR_SEPARATOR_MAX_VERTICES
            ) else "cg",
            "auto_wall_s": round(auto_s, 2),
            "auto_chi2_history": [round(float(c), 6) for c in hist],
        }))


if __name__ == "__main__":
    main()
