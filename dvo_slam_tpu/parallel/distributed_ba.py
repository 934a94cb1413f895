"""Distributed pose-graph bundle adjustment over a device mesh.

The per-edge 6x6 Hessian blocks are the natural unit of distribution
(SURVEY.md 2.5, P6: the reference's NormalEquationsLeastSquares::combine
partial-sum merge becomes a psum).  Edges are sharded across the mesh;
each device computes its blocks and assembles a shard-local dense system;
one ``psum`` over ICI reduces the [N, N, 6, 6] normal equations; the 6N
Cholesky solve and pose update run replicated (N keyframes is small
relative to chip FLOPs — replication is cheaper than a distributed solve
until N is in the tens of thousands).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import pose_graph as pg
from ..ops import se3

try:  # JAX >= 0.7 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def distributed_gauss_newton(
    graph: pg.GraphArrays,
    mesh: Mesh,
    iterations: int = 10,
    delta: float = pg.CAUCHY_DELTA,
    axis: str = "batch",
):
    """Run GN iterations with edge-sharded block computation + psum.

    The padded edge capacity must be divisible by the mesh size (PoseGraph
    capacities are powers of two, so any power-of-two mesh works).
    Returns (graph, chi2_history).
    """
    n_dev = mesh.shape[axis]
    e = graph.edge_i.shape[0]
    if e % n_dev != 0:
        raise ValueError(f"edge capacity {e} not divisible by mesh size {n_dev}")

    edge_leaves = ("edge_i", "edge_j", "measurements", "information", "edge_mask", "robust")
    in_specs = pg.GraphArrays(
        poses=P(),
        vertex_mask=P(),
        fixed_mask=P(),
        edge_i=P(axis),
        edge_j=P(axis),
        measurements=P(axis),
        information=P(axis),
        edge_mask=P(axis),
        robust=P(axis),
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(in_specs,),
        out_specs=(P(), P()),
    )
    def run(g: pg.GraphArrays):
        n = g.poses.shape[0]
        free = g.vertex_mask & ~g.fixed_mask

        def body(carry, _):
            poses = carry
            local = g._replace(poses=poses)
            H_ii, H_ij, H_jj, b_i, b_j, chi2 = pg.edge_blocks(local, delta)
            H_loc, b_loc = pg.assemble_blocks(
                n, g.edge_i, g.edge_j, H_ii, H_ij, H_jj, b_i, b_j
            )
            # the ICI collective: reduce shard-local normal equations
            H = jax.lax.psum(H_loc, axis)
            b = jax.lax.psum(b_loc, axis)
            chi2_total = jax.lax.psum(
                jnp.sum(jnp.where(g.edge_mask, chi2, 0.0)), axis
            )
            H_flat, b_flat = pg.apply_gauge(H, b, free)
            delta_x = pg._solve_scaled(H_flat, -b_flat).reshape(n, 6)
            delta_x = jnp.where(free[:, None], delta_x, 0.0)
            return poses @ se3.exp_se3(delta_x), chi2_total

        poses, history = jax.lax.scan(body, g.poses, None, length=iterations)
        return poses, history

    poses, history = run(graph)
    return graph._replace(poses=poses), history


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def distributed_gauss_newton_jit(graph, mesh, iterations, delta=pg.CAUCHY_DELTA):
    return distributed_gauss_newton(graph, mesh, iterations, delta)


def distributed_gauss_newton_cg(
    graph: pg.GraphArrays,
    mesh: Mesh,
    iterations: int = 10,
    delta: float = pg.CAUCHY_DELTA,
    axis: str = "batch",
    cg_iterations: int = 256,
):
    """Edge-sharded GN whose communication is per-edge-block reductions.

    Unlike :func:`distributed_gauss_newton` (which psums the full dense
    [N, N, 6, 6] system — O(N^2) bytes per GN iteration), this variant
    never materializes the Hessian: each shard computes its edges' 6x6
    blocks locally and the solve is distributed block-CG, reducing ONE
    [N, 6] partial matvec (plus one [N, 6, 6] preconditioner psum) per CG
    iteration over ICI — the Schur-free scalable form of BASELINE.json's
    distributed BA target.  Returns (graph, chi2_history).
    """
    n_dev = mesh.shape[axis]
    e = graph.edge_i.shape[0]
    if e % n_dev != 0:
        raise ValueError(f"edge capacity {e} not divisible by mesh size {n_dev}")

    in_specs = pg.GraphArrays(
        poses=P(),
        vertex_mask=P(),
        fixed_mask=P(),
        edge_i=P(axis),
        edge_j=P(axis),
        measurements=P(axis),
        information=P(axis),
        edge_mask=P(axis),
        robust=P(axis),
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(in_specs,),
        out_specs=(P(), P()),
    )
    def run(g: pg.GraphArrays):
        n = g.poses.shape[0]
        free = g.vertex_mask & ~g.fixed_mask

        def body(carry, _):
            poses = carry
            local = g._replace(poses=poses)
            H_ii, H_ij, H_jj, b_i, b_j, chi2 = pg.edge_blocks(local, delta)
            b = jnp.zeros((n, 6), b_i.dtype).at[g.edge_i].add(b_i)
            b = b.at[g.edge_j].add(b_j)
            b = jax.lax.psum(b, axis)  # O(N) gradient reduction
            chi2_total = jax.lax.psum(
                jnp.sum(jnp.where(g.edge_mask, chi2, 0.0)), axis
            )
            delta_x = pg.solve_blocks_cg(
                n, g.edge_i, g.edge_j, H_ii, H_ij, H_jj, -b, free,
                iterations=cg_iterations, axis_name=axis,
            )
            delta_x = jnp.where(free[:, None], delta_x, 0.0)
            return poses @ se3.exp_se3(delta_x), chi2_total

        poses, history = jax.lax.scan(body, g.poses, None, length=iterations)
        return poses, history

    poses, history = run(graph)
    return graph._replace(poses=poses), history


def pad_chain_structure(struct: pg.ChainStructure, n_dev: int) -> pg.ChainStructure:
    """Pad the segment axis to a multiple of the mesh size with zero-length
    segments (schur_chain_solve treats seg_len == 0 as inert)."""
    import numpy as np

    g = struct.seg_len.shape[0]
    g_pad = -(-g // n_dev) * n_dev
    if g_pad == g:
        return struct
    extra = g_pad - g

    def pad0(x):
        a = np.asarray(x)
        width = [(0, extra)] + [(0, 0)] * (a.ndim - 1)
        return jnp.asarray(np.pad(a, width))

    return struct._replace(
        seg_edges=pad0(struct.seg_edges),
        seg_flip=pad0(struct.seg_flip),
        seg_len=pad0(struct.seg_len),
        seg_a=pad0(struct.seg_a),
        seg_b=pad0(struct.seg_b),
        seg_vert=pad0(struct.seg_vert),
    )


def distributed_gauss_newton_schur(
    graph: pg.GraphArrays,
    struct: pg.ChainStructure,
    mesh: Mesh,
    iterations: int = 10,
    delta: float = pg.CAUCHY_DELTA,
    axis: str = "batch",
):
    """Schur-complement distributed BA (BASELINE.json configs 4-5): the
    degree-2 odometry chains are sharded over the mesh, each device runs
    the block-tridiagonal elimination sweeps for ITS chains, and the
    communication per GN iteration is the reduced separator system — one
    [S, S, 6, 6] + [S, 6] psum (S = separator/keyframe count, independent
    of trajectory length) plus one [N, 6] psum of the back-substituted
    chain updates.  The small reduced solve runs replicated.

    Edge-block computation (elementwise over E) is replicated; the O(N)
    sequential elimination work — the actual bottleneck of chainy graphs —
    is what parallelizes.  Returns (graph, chi2_history).
    """
    struct = pad_chain_structure(struct, mesh.shape[axis])

    seg_specs = pg.ChainStructure(
        sep_ids=P(),
        sep_edge=P(),
        sep_edge_a=P(),
        sep_edge_b=P(),
        seg_edges=P(axis),
        seg_flip=P(axis),
        seg_len=P(axis),
        seg_a=P(axis),
        seg_b=P(axis),
        seg_vert=P(axis),
    )
    graph_specs = jax.tree.map(lambda _: P(), graph)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(graph_specs, seg_specs),
        out_specs=(P(), P()),
    )
    def run(g: pg.GraphArrays, st: pg.ChainStructure):
        n = g.poses.shape[0]
        free = g.vertex_mask & ~g.fixed_mask

        def body(carry, _):
            poses = carry
            local = g._replace(poses=poses)
            H_ii, H_ij, H_jj, b_i, b_j, chi2 = pg.edge_blocks(local, delta)
            b = jnp.zeros((n, 6), b_i.dtype).at[g.edge_i].add(b_i)
            b = b.at[g.edge_j].add(b_j)
            dx = pg.schur_chain_solve(
                st, n, H_ii, H_ij, H_jj, b, free, axis_name=axis
            )
            chi2_total = jnp.sum(jnp.where(g.edge_mask, chi2, 0.0))
            return poses @ se3.exp_se3(dx), chi2_total

        poses, history = jax.lax.scan(body, g.poses, None, length=iterations)
        return poses, history

    poses, history = run(graph, struct)
    return graph._replace(poses=poses), history
