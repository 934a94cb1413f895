"""Profile the dense final-optimization schedule at the e2e operating
point (round-5 drill: VERDICT r4 wants final_optimization <= 3 ms/frame).

Builds a graph shaped like the 200-frame e2e bench state (odometry chain
+ keyframe edges + loop closures, ~200 vertices / ~400 edges), promotes
everything to level 0, and times the 10-round optimize + outlier-prune
schedule — the exact loop of KeyframeGraph.final_optimization.  All
solves are host-pinned (like the reference's g2o+CSparse), so CPU timing
is faithful.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]

import numpy as np


def _exp(x):
    from dvo_slam_tpu.ops import se3
    import jax.numpy as jnp

    return np.asarray(se3.exp_se3(jnp.asarray(x, jnp.float64)))


def build_graph(n=200, n_kf=6):
    """The e2e bench's final-pass shape: every frame has an odometry edge
    to its predecessor AND a keyframe edge to its segment's keyframe
    vertex (LocalMap emits both per frame), plus robust loop-closure
    edges between keyframe pairs — ~2 edges/vertex with keyframe hubs of
    degree ~n/n_kf."""
    from dvo_slam_tpu.models.pose_graph import PoseGraph

    rng = np.random.default_rng(11)
    step = np.array([0.02, 0.0, 0.0, 0.0, 0.0, 2 * np.pi / n])
    true = [np.eye(4)]
    for _ in range(n - 1):
        true.append(true[-1] @ _exp(step))
    g = PoseGraph(vertex_capacity=256, edge_capacity=512)
    g.add_vertex(0, np.eye(4), fixed=True)
    est = np.eye(4)
    rel = lambda a, b: np.linalg.inv(true[a]) @ true[b]
    seg = n // n_kf
    kf_ids = list(range(0, n, seg))
    for i in range(1, n):
        noisy = rel(i - 1, i) @ _exp(rng.normal(0, 2e-3, 6))
        est = est @ noisy
        g.add_vertex(i, est)
        g.add_edge(i - 1, i, noisy, np.eye(6) * 100.0)
        kf = (i // seg) * seg  # this segment's keyframe vertex
        if kf != i and kf != i - 1:
            g.add_edge(kf, i, rel(kf, i) @ _exp(rng.normal(0, 1e-3, 6)),
                       np.eye(6) * 50.0)
    for a in kf_ids:
        for b in kf_ids:
            if b > a + seg:
                g.add_edge(a, b, rel(a, b) @ _exp(rng.normal(0, 1e-3, 6)),
                           np.eye(6) * 20.0, robust=True)
    return g


def run_schedule(g, iterations=60, rounds=10, threshold=0.02):
    per_round = []
    removed_total = 0
    for r in range(rounds):
        t0 = time.perf_counter()
        g.optimize(max(iterations // rounds, 1), max_level=0)
        t1 = time.perf_counter()
        removed = g.remove_outlier_edges(threshold)
        t2 = time.perf_counter()
        removed_total += removed
        per_round.append(
            {"round": r, "opt_ms": round((t1 - t0) * 1e3, 1),
             "prune_ms": round((t2 - t1) * 1e3, 1), "removed": removed}
        )
    return per_round, removed_total


def main():
    g = build_graph()
    print(json.dumps({"vertices": g.num_vertices, "edges": g.num_edges}),
          flush=True)
    g.set_all_edge_levels(0)
    # warm (compile)
    import copy

    gw = build_graph()
    gw.set_all_edge_levels(0)
    run_schedule(gw)

    t0 = time.perf_counter()
    rounds, removed = run_schedule(g)
    total = time.perf_counter() - t0
    print(json.dumps({"rounds": rounds}, indent=None), flush=True)
    print(json.dumps({
        "total_s": round(total, 3),
        "ms_per_frame_at_200": round(total / 200 * 1e3, 2),
        "removed_edges": removed,
    }), flush=True)


if __name__ == "__main__":
    main()
