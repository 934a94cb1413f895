"""SE(3) pose-graph optimization in JAX — the g2o replacement.

The reference delegates all graph optimization to g2o: the per-keyframe
mini-graph uses Levenberg-Marquardt + CSparse (dvo_slam/src/local_map.cpp:57-90,
208-213) and the global keyframe graph uses Dogleg + CSparse with Cauchy
robust kernels of width 5 on loop-closure edges
(dvo_slam/src/keyframe_graph.cpp:126-142, 840-853).

TPU-native redesign (SURVEY.md section 7, translation 6):

  * Vertices are a dense [N, 4, 4] pose tensor; edges are index arrays +
    stacked [E, 4, 4] measurements and [E, 6, 6] information matrices with
    a boolean active mask (the reference's edge "levels" and outlier
    removal become mask updates — keyframe_graph.cpp:257-264, 643-674).
  * One Gauss-Newton/LM iteration is a fixed-shape jit: batched edge
    residuals/Jacobians, per-edge 6x6 Hessian blocks scattered into a
    dense [6N, 6N] system, one Cholesky solve.  Block scatter-adds are
    the P6 partial-sum merge; under pjit the same blocks psum over ICI
    (parallel/distributed_ba.py).
  * Graphs are padded to capacity so growth does not recompile.

Conventions: vertex update is right-multiplicative (T <- T exp(xi));
edge residual r = log(T_meas^{-1} T_i^{-1} T_j), so a perfect edge has
T_meas = T_i^{-1} T_j (g2o EdgeSE3 convention, as produced by the
front end's relative measurements, local_map.cpp:103-118).
"""

from __future__ import annotations

import contextlib
import functools
import os
import warnings
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3

CAUCHY_DELTA = 5.0  # reference: keyframe_graph.cpp:845 (setDelta(5))

# Where PoseGraph.optimize runs its solves.  "host" (default) pins graph
# solves to the CPU backend whenever the session's default backend is an
# accelerator; "default" leaves them on the default backend.  The
# reference runs ALL graph optimization on host (g2o + CSparse doubles,
# keyframe_graph.cpp:138-142) while the SSE tracker owns the camera-rate
# path; the TPU-native split is the same: dense image alignment on the
# chip, the small f64 graph solves on host — native f64 instead of the
# TPU's emulated double arithmetic, no relay-dispatch latency per LM
# step, and a TPU kernel fault cannot take the back end down with it
# (the BENCH_r03 crash was an f64 Schur-LM result download from the TPU).
GRAPH_SOLVE_DEVICE = os.environ.get("DVO_GRAPH_SOLVE_DEVICE", "host")


def _host_solve_device():
    """CPU device to pin graph solves to, or None to stay on the default
    backend (already CPU, or pinning disabled via DVO_GRAPH_SOLVE_DEVICE)."""
    if GRAPH_SOLVE_DEVICE != "host":
        return None
    try:
        if jax.default_backend() == "cpu":
            return None
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


class GraphArrays(NamedTuple):
    """Device-side pose graph in padded dense-array form."""

    poses: jnp.ndarray  # [N, 4, 4]
    vertex_mask: jnp.ndarray  # [N] bool — allocated vertices
    fixed_mask: jnp.ndarray  # [N] bool — gauge-fixed vertices
    edge_i: jnp.ndarray  # [E] int32
    edge_j: jnp.ndarray  # [E] int32
    measurements: jnp.ndarray  # [E, 4, 4]
    information: jnp.ndarray  # [E, 6, 6]
    edge_mask: jnp.ndarray  # [E] bool — active edges
    robust: jnp.ndarray  # [E] bool — Cauchy-robustified edges


def edge_residuals(graph: GraphArrays):
    """Per-edge residual r = log(T_m^{-1} T_i^{-1} T_j) and chi2 = r^T O r."""
    Ti = graph.poses[graph.edge_i]
    Tj = graph.poses[graph.edge_j]
    B = se3.inverse(Ti) @ Tj
    X = se3.inverse(graph.measurements) @ B
    r = se3.log_se3(X)
    chi2 = jnp.einsum("ei,eij,ej->e", r, graph.information, r)
    return r, B, chi2


def cauchy_weights(chi2, robust, delta: float = CAUCHY_DELTA):
    """Cauchy robust-kernel weight rho'(s) = 1 / (1 + s/delta^2) on
    robustified edges, 1 elsewhere (g2o RobustKernelCauchy semantics used
    for outlier pruning at keyframe_graph.cpp:653-662)."""
    w = 1.0 / (1.0 + chi2 / (delta * delta))
    return jnp.where(robust, w, 1.0)


def _edge_jacobians(r, B):
    """J_j = Jr^{-1}(r), J_i = -Jr^{-1}(r) Ad(B^{-1}) for right-mult updates."""
    jr_inv = se3.right_jacobian_inverse_approx(r)
    adj_b_inv = se3.adjoint(se3.inverse(B))
    return -jnp.einsum("eab,ebc->eac", jr_inv, adj_b_inv), jr_inv


def assemble_blocks(n, ei, ej, H_ii, H_ij, H_jj, b_i, b_j):
    """Scatter per-edge blocks into raw dense normal equations
    ([N, N, 6, 6], [N, 6]) — no gauge yet, so shard-local systems can be
    psum-reduced before gauging."""
    H = jnp.zeros((n, n, 6, 6), H_ii.dtype)
    H = H.at[ei, ei].add(H_ii)
    H = H.at[ei, ej].add(H_ij)
    H = H.at[ej, ei].add(jnp.swapaxes(H_ij, -1, -2))
    H = H.at[ej, ej].add(H_jj)
    b = jnp.zeros((n, 6), b_i.dtype)
    b = b.at[ei].add(b_i)
    b = b.at[ej].add(b_j)
    return H, b


GAUGE_DAMPING = 1e-6  # numerical-safety floor of every solver's damping


def apply_gauge(H, b, free, damping=GAUGE_DAMPING):
    """Zero rows/cols of fixed vertices, identity on their diagonal, plus
    Levenberg damping; flatten to ([6N, 6N], [6N]).

    ``damping`` defaults to the tiny numerical-safety floor (plain GN);
    the LM loop passes its adapted lambda here instead
    (reference: g2o Levenberg, local_map.cpp:57-90)."""
    n = H.shape[0]
    freef = free.astype(H.dtype)
    H = H * freef[:, None, None, None] * freef[None, :, None, None]
    eye = jnp.eye(6, dtype=H.dtype)
    diag_fix = (1.0 - freef)[:, None, None] * eye
    H = H.at[jnp.arange(n), jnp.arange(n)].add(diag_fix)
    H = H.at[jnp.arange(n), jnp.arange(n)].add(damping * eye)
    b = b * freef[:, None]
    return H.transpose(0, 2, 1, 3).reshape(n * 6, n * 6), b.reshape(n * 6)


def _assemble_dense(n, ei, ej, H_ii, H_ij, H_jj, b_i, b_j, free, damping=GAUGE_DAMPING):
    H, b = assemble_blocks(n, ei, ej, H_ii, H_ij, H_jj, b_i, b_j)
    return apply_gauge(H, b, free, damping)


def _solve_scaled(H, b):
    """Cholesky solve with symmetric Jacobi scaling (float32-safe)."""
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(H), 1e-12))
    d_inv = 1.0 / d
    Hs = H * d_inv[:, None] * d_inv[None, :]
    bs = b * d_inv
    L = jnp.linalg.cholesky(Hs + 1e-9 * jnp.eye(H.shape[0], dtype=H.dtype))
    y = jax.scipy.linalg.cho_solve((L, True), bs)
    return y * d_inv


def edge_blocks(graph: GraphArrays, delta: float = CAUCHY_DELTA):
    """Per-edge 6x6 Hessian blocks and 6-vector gradient blocks.

    The unit of work for both the single-device solver and the
    edge-sharded distributed BA (each shard computes its blocks locally,
    then the assembled systems psum over ICI — P6 in SURVEY.md 2.5).
    Returns (H_ii, H_ij, H_jj, b_i, b_j, chi2) over [E, ...].
    """
    r, B, chi2 = edge_residuals(graph)
    w = cauchy_weights(chi2, graph.robust, delta) * graph.edge_mask
    W = w[:, None, None] * graph.information  # [E, 6, 6]

    J_i, J_j = _edge_jacobians(r, B)
    WJi = jnp.einsum("eab,ebc->eac", W, J_i)
    WJj = jnp.einsum("eab,ebc->eac", W, J_j)
    H_ii = jnp.einsum("eba,ebc->eac", J_i, WJi)
    H_ij = jnp.einsum("eba,ebc->eac", J_i, WJj)
    H_jj = jnp.einsum("eba,ebc->eac", J_j, WJj)
    Wr = jnp.einsum("eab,eb->ea", W, r)
    b_i = jnp.einsum("eba,eb->ea", J_i, Wr)
    b_j = jnp.einsum("eba,eb->ea", J_j, Wr)
    return H_ii, H_ij, H_jj, b_i, b_j, chi2


def block_diag_preconditioner(
    n, ei, ej, H_ii, H_jj, free, dtype, axis_name=None, damping=GAUGE_DAMPING
):
    """Cholesky factors of the block-Jacobi preconditioner: the per-vertex
    6x6 diagonal blocks of the gauged system (scatter-add of each edge's
    diagonal contributions + damping, identity on fixed vertices).  With
    ``axis_name`` the shard-local accumulations psum over the mesh before
    gauging (one [N, 6, 6] collective per GN iteration)."""
    eye = jnp.eye(6, dtype=dtype)
    freef = free.astype(dtype)
    D = jnp.zeros((n, 6, 6), dtype)
    D = D.at[ei].add(H_ii)
    D = D.at[ej].add(H_jj)
    if axis_name is not None:
        D = jax.lax.psum(D, axis_name)
    D = D * freef[:, None, None] + (1.0 - freef)[:, None, None] * eye
    D = D + damping * eye
    return jax.vmap(jnp.linalg.cholesky)(D)


def edge_matvec_partial(ei, ej, H_ii, H_ij, H_jj, free, x):
    """Pure edge contribution P_free H_edges P_free @ x (no gauge terms):
    the shard-local unit of the distributed SpMV — partial products from
    each edge shard psum over ICI (SURVEY.md 2.5 P6), gauge terms are
    added once after the reduction."""
    freef = free.astype(x.dtype)[:, None]
    xf = x * freef
    xi = xf[ei]
    xj = xf[ej]
    yi = jnp.einsum("eab,eb->ea", H_ii, xi) + jnp.einsum("eab,eb->ea", H_ij, xj)
    yj = jnp.einsum("eba,eb->ea", H_ij, xi) + jnp.einsum("eab,eb->ea", H_jj, xj)
    y = jnp.zeros_like(x).at[ei].add(yi).at[ej].add(yj)
    return y * freef


def _gauge_terms(x, free, damping=GAUGE_DAMPING):
    """Identity rows for fixed/unallocated vertices + Levenberg damping on
    free rows (matching :func:`apply_gauge`)."""
    freef = free.astype(x.dtype)[:, None]
    return damping * x * freef + x * (1.0 - freef)


def edge_matvec(ei, ej, H_ii, H_ij, H_jj, free, x, damping=GAUGE_DAMPING):
    """y = H_gauged @ x without materializing H: gather the two endpoint
    blocks of x per edge, apply the 6x6 blocks, scatter-add the results —
    the block-sparse SpMV whose per-edge unit matches the reference's
    CSparse structure (keyframe_graph.cpp:126-142).

    Gauge semantics match :func:`apply_gauge`: fixed/unallocated vertices
    act as identity rows, free rows carry the Levenberg damping.
    """
    return edge_matvec_partial(ei, ej, H_ii, H_ij, H_jj, free, x) + _gauge_terms(
        x, free, damping
    )


def solve_blocks_cg(
    n,
    ei,
    ej,
    H_ii,
    H_ij,
    H_jj,
    rhs,  # [N, 6]
    free,  # [N] bool
    iterations: int = 100,
    tol: float = 1e-6,
    axis_name: Optional[str] = None,
    damping=GAUGE_DAMPING,
    return_iterations: bool = False,
):
    """Preconditioned conjugate gradients on the block-sparse gauged
    normal equations — the scalable replacement for the dense [6N, 6N]
    Cholesky (reference: g2o's sparse CSparse backends,
    keyframe_graph.cpp:138-142, local_map.cpp:57-90).  O(E) memory and
    compute per iteration; jit/scan-safe (fixed-shape while_loop).

    With ``axis_name`` (inside shard_map) the edge arrays are this
    shard's slice and ``rhs`` must already be globally reduced: each CG
    iteration psums ONE [N, 6] partial product over ICI — O(N) per
    iteration instead of the O(N^2) dense-system reduction."""
    dtype = rhs.dtype
    rhs = rhs * free.astype(dtype)[:, None]
    L = block_diag_preconditioner(
        n, ei, ej, H_ii, H_jj, free, dtype, axis_name, damping
    )

    def precond(r):
        y = jax.vmap(
            lambda Li, ri: jax.scipy.linalg.solve_triangular(Li, ri, lower=True)
        )(L, r)
        return jax.vmap(
            lambda Li, yi: jax.scipy.linalg.solve_triangular(Li.T, yi, lower=False)
        )(L, y)

    if axis_name is None:
        matvec = lambda v: edge_matvec(ei, ej, H_ii, H_ij, H_jj, free, v, damping)
    else:
        def matvec(v):
            part = edge_matvec_partial(ei, ej, H_ii, H_ij, H_jj, free, v)
            return jax.lax.psum(part, axis_name) + _gauge_terms(v, free, damping)

    x0 = jnp.zeros_like(rhs)
    r0 = rhs  # b - H @ 0
    z0 = precond(r0)
    rz0 = jnp.vdot(r0, z0)
    stop2 = tol * tol * jnp.maximum(jnp.vdot(rhs, rhs), 1e-30)

    def cond(c):
        _, r, _, _, _, k = c
        return (k < iterations) & (jnp.vdot(r, r) > stop2)

    def body(c):
        x, r, z, p, rz, k = c
        Hp = matvec(p)
        alpha = rz / jnp.maximum(jnp.vdot(p, Hp), 1e-30)
        x = x + alpha * p
        r = r - alpha * Hp
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, z, p, rz_new, k + 1

    x, r, _, _, _, k = jax.lax.while_loop(
        cond, body, (x0, r0, z0, z0, rz0, jnp.asarray(0))
    )
    if return_iterations:
        return x, k
    return x


class ChainStructure(NamedTuple):
    """Host-computed elimination structure for the Schur chain solver.

    The dense final pass (keyframe_graph.cpp:257-281 with the dense graph,
    i.e. all odometry vertices included) is dominated by degree-2 chains:
    every odometry vertex sits between exactly two neighbours.  Eliminating
    those chains by block-tridiagonal (Thomas) factorization reduces the
    system EXACTLY onto the separator vertices (keyframes / loop-closure
    endpoints) — the Schur-complement trick of sparse SLAM solvers, and the
    direct-solve replacement for CG's O(N)-iteration Krylov bound on long
    chains (reference: g2o + CSparse, keyframe_graph.cpp:138-142).

    All index arrays are static per optimize() call (structure only changes
    when edges are added/masked), so the whole GN loop jits.
    """

    sep_ids: jnp.ndarray  # [S] int32 — global vertex index per separator
    sep_edge: jnp.ndarray  # [Es] int32 — edges with both endpoints separators
    sep_edge_a: jnp.ndarray  # [Es] int32 — dense sep index of edge_i endpoint
    sep_edge_b: jnp.ndarray  # [Es] int32 — dense sep index of edge_j endpoint
    seg_edges: jnp.ndarray  # [G, K+1] int32 — edge ids along each chain
    seg_flip: jnp.ndarray  # [G, K+1] bool — stored edge runs Q->P
    seg_len: jnp.ndarray  # [G] int32 — interior vertex count k (>= 1)
    seg_a: jnp.ndarray  # [G] int32 — dense sep index of the chain head
    seg_b: jnp.ndarray  # [G] int32 — dense sep index of the chain tail
    seg_vert: jnp.ndarray  # [G, K] int32 — global interior vertex ids


def chain_partition(n, ei, ej, active, allocated, free):
    """Host-side (NumPy) structure analysis: split allocated vertices into
    degree-2 interior chains and separators.  Returns a ChainStructure or
    None when the graph has no eliminable chain (then the dense/CG paths
    are the right tool).

    Separators are: fixed vertices, any vertex of degree != 2, self-loop
    endpoints, and one demoted vertex per pure interior cycle (a ring of
    degree-2 vertices needs an anchor to cut it into one open chain).
    """
    ei = np.asarray(ei)
    ej = np.asarray(ej)
    active = np.asarray(active)
    allocated = np.asarray(allocated)
    free = np.asarray(free)
    deg = np.zeros(n, np.int64)
    adj = [[] for _ in range(n)]
    forced = np.zeros(n, bool)
    for e in np.nonzero(active)[0]:
        i, j = int(ei[e]), int(ej[e])
        if i == j:
            forced[i] = True
            continue
        deg[i] += 1
        deg[j] += 1
        adj[i].append((int(e), j))
        adj[j].append((int(e), i))
    interior = allocated & free & (deg == 2) & ~forced
    if not interior.any():
        return None
    used = np.zeros(len(ei), bool)
    segments = []  # (sep_a, sep_b, [interior verts], [edges])
    sep_edges = []

    def walk(e0, v0):
        path_e = [e0]
        path_v = []
        used[e0] = True
        prev_e, cur = e0, v0
        while interior[cur]:
            path_v.append(cur)
            (ea, oa), (eb, ob) = adj[cur]
            ne, nv = (eb, ob) if ea == prev_e else (ea, oa)
            used[ne] = True
            path_e.append(ne)
            prev_e, cur = ne, nv
        return path_v, cur, path_e

    def sweep_from(s):
        for e0, v0 in adj[s]:
            if used[e0]:
                continue
            if not interior[v0]:
                used[e0] = True
                sep_edges.append(e0)
                continue
            path_v, end, path_e = walk(e0, v0)
            segments.append((s, end, path_v, path_e))

    for s in range(n):
        if not allocated[s] or interior[s]:
            continue
        sweep_from(s)
    # pure interior cycles: both edges of some interior are still unused —
    # demote it to a separator and cut the ring there (a==b segment)
    for v in range(n):
        if interior[v] and not any(used[e] for e, _ in adj[v]):
            interior[v] = False
            sweep_from(v)
    # self-loop edges (both endpoints the same separator)
    for e in np.nonzero(active)[0]:
        if int(ei[e]) == int(ej[e]):
            sep_edges.append(int(e))
    if not segments:
        return None

    sep_list = [v for v in range(n) if allocated[v] and not interior[v]]
    sep_of = np.full(n, -1, np.int64)
    sep_of[sep_list] = np.arange(len(sep_list))
    g_count = len(segments)
    k_max = max(len(s[2]) for s in segments)
    seg_edges = np.zeros((g_count, k_max + 1), np.int32)
    seg_flip = np.zeros((g_count, k_max + 1), bool)
    seg_len = np.zeros(g_count, np.int32)
    seg_a = np.zeros(g_count, np.int32)
    seg_b = np.zeros(g_count, np.int32)
    seg_vert = np.zeros((g_count, k_max), np.int32)
    for gidx, (sa, sb, verts, edges) in enumerate(segments):
        k = len(verts)
        seg_len[gidx] = k
        seg_a[gidx] = sep_of[sa]
        seg_b[gidx] = sep_of[sb]
        seg_vert[gidx, :k] = verts
        order = [sa] + verts  # P endpoint of edge t along the canonical walk
        for t, e in enumerate(edges):
            seg_edges[gidx, t] = e
            seg_flip[gidx, t] = int(ei[e]) != order[t]
    se = np.asarray(sorted(set(sep_edges)), np.int32)
    # HOST (NumPy) leaves on purpose: the structure is built outside any
    # device context, and jnp.asarray here would commit the index arrays
    # to the DEFAULT device — on a TPU-default session that meant a
    # ~23 ms relay round trip PER ARRAY when pad_chain_structure read
    # them back (~0.5 s of pure transfer per optimize() call, profiled).
    # NumPy pytree leaves are placed at jit-call time under the caller's
    # (host-pinned) device context instead.
    return ChainStructure(
        sep_ids=np.asarray(sep_list, np.int32),
        sep_edge=se,
        sep_edge_a=sep_of[np.asarray(ei)[se]].astype(np.int32),
        sep_edge_b=sep_of[np.asarray(ej)[se]].astype(np.int32),
        seg_edges=seg_edges,
        seg_flip=seg_flip,
        seg_len=seg_len,
        seg_a=seg_a,
        seg_b=seg_b,
        seg_vert=seg_vert,
    )


def _pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def pad_chain_structure(struct: ChainStructure, fixed_vertex: int) -> ChainStructure:
    """Pad every ChainStructure axis to the next power of two so the jitted
    Schur solvers keep STABLE SHAPES as the graph grows.

    Without this, every keyframe insertion changes the structure shapes
    and the incremental optimization recompiles per call — through this
    sandbox's remote-compile tunnel that cost ~0.5 s/frame of the
    end-to-end SLAM budget.  Padding is free by construction:
    zero-length segments are masked by ``seg_len == 0``; padded separator
    rows point at ``fixed_vertex`` (free = 0, so their reduced-system rows
    gauge to identity and back-substitute to zero before the scatter-add);
    padded separator-separator edge slots couple two such gauged rows.
    """
    s = {k: np.asarray(v) for k, v in struct._asdict().items()}
    g, kp1 = s["seg_edges"].shape
    k = kp1 - 1
    g_pad = _pow2(g)
    k_pad = _pow2(max(k, 1))
    s_count = s["sep_ids"].shape[0]
    s_pad = _pow2(s_count)
    e_count = s["sep_edge"].shape[0]
    e_pad = _pow2(max(e_count, 1))

    def pad_to(a, shape, fill=0):
        out = np.full(shape, fill, a.dtype)
        out[tuple(slice(0, d) for d in a.shape)] = a
        return out

    # padded separators sit on a fixed (gauged-out) vertex; padded
    # sep-edges couple two padded separator rows
    pad_sep_row = s_count  # first padded dense separator index
    if s_pad == s_count:
        # need at least one gauged row to park padded edges on
        if e_pad != e_count:
            s_pad = _pow2(s_count + 1)
    # host leaves, like chain_partition (see the note there)
    return ChainStructure(
        sep_ids=pad_to(s["sep_ids"], (s_pad,), fill=int(fixed_vertex)),
        sep_edge=pad_to(s["sep_edge"], (e_pad,)),
        sep_edge_a=pad_to(
            s["sep_edge_a"], (e_pad,), fill=min(pad_sep_row, s_pad - 1)
        ),
        sep_edge_b=pad_to(
            s["sep_edge_b"], (e_pad,), fill=min(pad_sep_row, s_pad - 1)
        ),
        seg_edges=pad_to(s["seg_edges"], (g_pad, k_pad + 1)),
        seg_flip=pad_to(s["seg_flip"], (g_pad, k_pad + 1)),
        seg_len=pad_to(s["seg_len"], (g_pad,)),
        seg_a=pad_to(s["seg_a"], (g_pad,)),
        seg_b=pad_to(s["seg_b"], (g_pad,)),
        seg_vert=pad_to(s["seg_vert"], (g_pad, k_pad)),
    )


def schur_chain_solve(
    struct: ChainStructure, n, H_ii, H_ij, H_jj, b, free, axis_name=None,
    damping=GAUGE_DAMPING,
):
    """Exact direct solve of the gauged normal equations by chain
    elimination: block-tridiagonal forward/backward sweeps (lax.scan of
    6x6 solves, vectorized over all chains) reduce the system onto the
    separator vertices; one small dense Cholesky solves the reduced
    (Schur-complement) system; back-substitution recovers the chain
    updates from the SAME tridiagonal solve columns — two sweeps total.

    Solves H_gauged dx = -b with apply_gauge semantics (fixed rows/cols
    zeroed + identity diag, Levenberg damping on free rows); the result
    matches the dense oracle to factorization tolerance.

    Zero-length (seg_len == 0) padding segments contribute nothing, so the
    segment axis can be padded/sharded freely.  With ``axis_name`` (inside
    shard_map) the segment arrays are this shard's slice: each device
    eliminates its own chains, the reduced [S, S, 6, 6] system psums over
    ICI (S = separator count — the Schur-complement communication shape of
    BASELINE.json's distributed BA), the small solve runs replicated, and
    the back-substituted interior updates psum once as an [N, 6] tensor.
    """
    dtype = b.dtype
    eye = jnp.eye(6, dtype=dtype)
    freef = free.astype(dtype)
    rhs = -b * freef[:, None]
    s_count = struct.sep_ids.shape[0]
    g_count, kp1 = struct.seg_edges.shape
    k_max = kp1 - 1
    segf = (struct.seg_len > 0).astype(dtype)  # padding-segment mask

    e = struct.seg_edges
    flip = struct.seg_flip[..., None, None]
    Hii_e, Hij_e, Hjj_e = H_ii[e], H_ij[e], H_jj[e]
    HijT = jnp.swapaxes(Hij_e, -1, -2)
    Dp = jnp.where(flip, Hjj_e, Hii_e)  # diag block on the earlier endpoint
    Dq = jnp.where(flip, Hii_e, Hjj_e)  # diag block on the later endpoint
    U = jnp.where(flip, HijT, Hij_e)  # H(P, Q) coupling along the walk

    tpos = jnp.arange(k_max)
    valid_t = tpos[None, :] < struct.seg_len[:, None]  # [G, K]
    last = jnp.maximum(struct.seg_len - 1, 0)

    # interior tridiagonal: D_t = Dq(edge t) + Dp(edge t+1) + damping
    D = Dq[:, :k_max] + Dp[:, 1:] + damping * eye
    D = jnp.where(valid_t[..., None, None], D, eye)
    # off-diagonal O_t couples interior t -> t+1 (edge t+1), real for t <= k-2
    valid_o = tpos[None, :] < (struct.seg_len[:, None] - 1)
    O = jnp.where(valid_o[..., None, None], U[:, 1:], 0.0)

    free_sep = freef[struct.sep_ids]
    fa = free_sep[struct.seg_a] * segf
    fb = free_sep[struct.seg_b] * segf
    # gauged couplings to the endpoint separators
    Ca = jnp.swapaxes(U[:, 0], -1, -2) * fa[:, None, None]  # H(v_0, sep_a)
    U_last = jnp.take_along_axis(
        U, struct.seg_len[:, None, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    Cb = U_last * fb[:, None, None]  # H(v_{k-1}, sep_b)

    b_int = rhs[struct.seg_vert] * valid_t[..., None]  # [G, K, 6]
    onehot0 = (tpos == 0).astype(dtype)
    onehotk = (tpos[None, :] == last[:, None]).astype(dtype)
    # multi-RHS columns: [A^T at row 0 | B^T at row k-1 | rhs]
    R = jnp.concatenate(
        [
            Ca[:, None] * onehot0[None, :, None, None],
            Cb[:, None] * onehotk[..., None, None],
            b_int[..., None],
        ],
        axis=-1,
    )  # [G, K, 6, 13]

    # time-major for the scans
    Dm = jnp.moveaxis(D, 1, 0)
    Om = jnp.moveaxis(O, 1, 0)
    Rm = jnp.moveaxis(R, 1, 0)

    def _spd_solve(d, r):
        """Batched SPD block solve via Cholesky — the eliminated diagonal
        blocks stay SPD (+damping), and unlike LU this lowers on every
        backend's f64 path (TPU implements f64 Cholesky/triangular but NOT
        LuDecomposition)."""
        L = jnp.linalg.cholesky(d)
        y = jax.scipy.linalg.solve_triangular(L, r, lower=True)
        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), y, lower=False
        )

    def fwd(carry, inp):
        d_prev, r_prev, o_prev = carry
        d_t, r_t, o_t = inp
        z = _spd_solve(d_prev, jnp.concatenate([o_prev, r_prev], -1))
        zo, zr = z[..., :6], z[..., 6:]
        d_new = d_t - jnp.einsum("gba,gbc->gac", o_prev, zo)
        r_new = r_t - jnp.einsum("gba,gbc->gac", o_prev, zr)
        return (d_new, r_new, o_t), (d_new, r_new)

    # derive the scan inits from the (possibly shard-varying) operands so
    # their varying-axes types match under shard_map
    zD = Dm[0] - Dm[0]
    init = (zD + eye, Rm[0] - Rm[0], zD)
    _, (Dt, Rt) = jax.lax.scan(fwd, init, (Dm, Rm, Om))

    def bwd(x_next, inp):
        d_t, r_t, o_t = inp
        x_t = _spd_solve(d_t, r_t - jnp.einsum("gab,gbc->gac", o_t, x_next))
        return x_t, x_t

    _, Xm = jax.lax.scan(bwd, Rm[0] - Rm[0], (Dt, Rt, Om), reverse=True)
    X = jnp.moveaxis(Xm, 0, 1)  # [G, K, 6, 13]

    X0 = X[:, 0]
    Xk = jnp.take_along_axis(X, last[:, None, None, None].astype(jnp.int32), axis=1)[:, 0]
    Arow = jnp.swapaxes(Ca, -1, -2)  # H(sep_a, v_0), gauged
    Brow = jnp.swapaxes(Cb, -1, -2)
    corr_a = jnp.einsum("gab,gbc->gac", Arow, X0)  # [G, 6, 13]
    corr_b = jnp.einsum("gab,gbc->gac", Brow, Xk)

    # reduced separator system: shard-local segment contributions ...
    segw = segf[:, None, None]
    Dq_last = jnp.take_along_axis(
        Dq, struct.seg_len[:, None, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    S_seg = jnp.zeros((s_count, s_count, 6, 6), dtype)
    S_seg = S_seg.at[struct.seg_a, struct.seg_a].add(Dp[:, 0] * segw - corr_a[..., :6])
    S_seg = S_seg.at[struct.seg_a, struct.seg_b].add(-corr_a[..., 6:12])
    S_seg = S_seg.at[struct.seg_b, struct.seg_a].add(-corr_b[..., :6])
    S_seg = S_seg.at[struct.seg_b, struct.seg_b].add(Dq_last * segw - corr_b[..., 6:12])
    rhs_seg = jnp.zeros((s_count, 6), dtype)
    rhs_seg = rhs_seg.at[struct.seg_a].add(-corr_a[..., 12])
    rhs_seg = rhs_seg.at[struct.seg_b].add(-corr_b[..., 12])
    if axis_name is not None:
        S_seg = jax.lax.psum(S_seg, axis_name)
        rhs_seg = jax.lax.psum(rhs_seg, axis_name)
    # ... plus the replicated separator-separator edge part
    S = S_seg
    sa, sb = struct.sep_edge_a, struct.sep_edge_b
    S = S.at[sa, sa].add(H_ii[struct.sep_edge])
    S = S.at[sa, sb].add(H_ij[struct.sep_edge])
    S = S.at[sb, sa].add(jnp.swapaxes(H_ij[struct.sep_edge], -1, -2))
    S = S.at[sb, sb].add(H_jj[struct.sep_edge])
    rhs_sep = rhs[struct.sep_ids] + rhs_seg
    # gauge + damping on the reduced system (apply_gauge semantics)
    S = S * free_sep[:, None, None, None] * free_sep[None, :, None, None]
    diag = jnp.arange(s_count)
    S = S.at[diag, diag].add(
        ((1.0 - free_sep) + damping)[:, None, None] * eye
    )
    Hs = S.transpose(0, 2, 1, 3).reshape(s_count * 6, s_count * 6)
    x_sep = _solve_scaled(Hs, (rhs_sep * free_sep[:, None]).reshape(-1)).reshape(
        s_count, 6
    )
    x_sep = x_sep * free_sep[:, None]

    # back-substitute chains from the already-solved columns
    xa = x_sep[struct.seg_a]
    xb = x_sep[struct.seg_b]
    x_int = (
        X[..., 12]
        - jnp.einsum("gkab,gb->gka", X[..., :6], xa)
        - jnp.einsum("gkab,gb->gka", X[..., 6:12], xb)
    ) * (valid_t * segf[:, None])[..., None]

    dx_int = jnp.zeros((n, 6), dtype).at[struct.seg_vert.reshape(-1)].add(
        x_int.reshape(-1, 6)
    )
    if axis_name is not None:
        dx_int = jax.lax.psum(dx_int, axis_name)
    dx = dx_int.at[struct.sep_ids].add(x_sep)
    return dx * freef[:, None]


@functools.partial(jax.jit, static_argnums=(2, 3))
def _optimize_schur_jit(arrays: GraphArrays, struct: ChainStructure, iterations, delta):
    """Fixed-count GN loop with the Schur chain direct solver (jit; the
    elimination structure is static per call)."""

    def body(g, _):
        H_ii, H_ij, H_jj, b_i, b_j, chi2 = edge_blocks(g, delta)
        n = g.poses.shape[0]
        free = g.vertex_mask & ~g.fixed_mask
        b = jnp.zeros((n, 6), b_i.dtype).at[g.edge_i].add(b_i).at[g.edge_j].add(b_j)
        dx = schur_chain_solve(struct, n, H_ii, H_ij, H_jj, b, free)
        g2 = g._replace(poses=g.poses @ se3.exp_se3(dx))
        return g2, jnp.sum(jnp.where(g.edge_mask, chi2, 0.0))

    return jax.lax.scan(body, arrays, None, length=iterations)


def apply_pose_update(graph: GraphArrays, H, b):
    """Solve the assembled system and right-update the free poses."""
    n = graph.poses.shape[0]
    free = graph.vertex_mask & ~graph.fixed_mask
    delta_x = _solve_scaled(H, -b).reshape(n, 6)
    delta_x = jnp.where(free[:, None], delta_x, 0.0)
    return graph._replace(poses=graph.poses @ se3.exp_se3(delta_x))


def gauss_newton_iteration(
    graph: GraphArrays,
    delta: float = CAUCHY_DELTA,
    solver: str = "dense",
    cg_iterations: int = 100,
):
    """One robust Gauss-Newton iteration; returns (new_graph, total_chi2).

    ``solver``: "dense" assembles the full [6N, 6N] system and Cholesky-
    solves it (the small-graph oracle); "cg" runs block-Jacobi
    preconditioned CG directly on the per-edge blocks — O(E) memory, the
    scalable path for graphs with thousands of vertices."""
    H_ii, H_ij, H_jj, b_i, b_j, chi2 = edge_blocks(graph, delta)
    n = graph.poses.shape[0]
    free = graph.vertex_mask & ~graph.fixed_mask
    if solver == "dense":
        H, b = _assemble_dense(
            n, graph.edge_i, graph.edge_j, H_ii, H_ij, H_jj, b_i, b_j, free
        )
        new_graph = apply_pose_update(graph, H, b)
    elif solver == "cg":
        b = jnp.zeros((n, 6), b_i.dtype).at[graph.edge_i].add(b_i)
        b = b.at[graph.edge_j].add(b_j)
        delta_x = solve_blocks_cg(
            n, graph.edge_i, graph.edge_j, H_ii, H_ij, H_jj, -b, free,
            iterations=cg_iterations,
        )
        delta_x = jnp.where(free[:, None], delta_x, 0.0)
        new_graph = graph._replace(poses=graph.poses @ se3.exp_se3(delta_x))
    else:
        raise ValueError(f"unknown solver {solver!r}")
    total = jnp.sum(jnp.where(graph.edge_mask, chi2, 0.0))
    return new_graph, total


def optimize(
    graph: GraphArrays,
    iterations: int,
    delta: float = CAUCHY_DELTA,
    solver: str = "dense",
    cg_iterations: int = 100,
):
    """Run a fixed number of robust GN iterations (jit-able; mirrors
    g2o's optimize(n) calls, e.g. keyframe_graph.cpp:481-489).

    Returns (graph, chi2_history [iterations])."""

    def body(g, _):
        g, chi2 = gauss_newton_iteration(g, delta, solver, cg_iterations)
        return g, chi2

    graph, history = jax.lax.scan(body, graph, None, length=iterations)
    return graph, history


def _graph_chi2(graph: GraphArrays, delta=CAUCHY_DELTA):
    """Total robustified chi2 at the current poses — the LM accept metric.

    Matches g2o's activeRobustChi2(): robust edges contribute
    rho(chi2) = delta^2 log(1 + chi2/delta^2) (Cauchy), so a gross
    outlier cannot mask genuine improvement elsewhere."""
    _, _, chi2 = edge_residuals(graph)
    d2 = delta * delta
    rho = jnp.where(graph.robust, d2 * jnp.log1p(chi2 / d2), chi2)
    return jnp.sum(jnp.where(graph.edge_mask, rho, 0.0))


def _solve_step(graph: GraphArrays, delta, solver, cg_iterations, damping, struct=None):
    """One damped normal-equations solve at the current poses.

    Returns (dx [N, 6], b [N, 6], chi2_robust []) — the shared unit of the
    GN and LM loops across the dense / CG / Schur solver paths."""
    H_ii, H_ij, H_jj, b_i, b_j, chi2 = edge_blocks(graph, delta)
    n = graph.poses.shape[0]
    free = graph.vertex_mask & ~graph.fixed_mask
    b = jnp.zeros((n, 6), b_i.dtype).at[graph.edge_i].add(b_i)
    b = b.at[graph.edge_j].add(b_j)
    if solver == "dense":
        H, bf = _assemble_dense(
            n, graph.edge_i, graph.edge_j, H_ii, H_ij, H_jj, b_i, b_j, free,
            damping,
        )
        dx = _solve_scaled(H, -bf).reshape(n, 6)
    elif solver == "cg":
        dx = solve_blocks_cg(
            n, graph.edge_i, graph.edge_j, H_ii, H_ij, H_jj, -b, free,
            iterations=cg_iterations, damping=damping,
        )
    elif solver == "schur":
        dx = schur_chain_solve(
            struct, n, H_ii, H_ij, H_jj, b, free, damping=damping
        )
    else:
        raise ValueError(f"unknown solver {solver!r}")
    dx = jnp.where(free[:, None], dx, 0.0)
    return dx, b, _graph_chi2(graph, delta)


def optimize_lm(
    graph: GraphArrays,
    iterations: int,
    delta: float = CAUCHY_DELTA,
    solver: str = "dense",
    cg_iterations: int = 100,
    struct: Optional[ChainStructure] = None,
    lambda_init: float = 1e-5,
    lambda_min: float = 1e-10,
    lambda_max: float = 1e8,
    tol: float = 0.0,
):
    """Levenberg-Marquardt with Nielsen lambda adaptation — the adaptive
    trust-region loop the reference gets from g2o (LM on the local map,
    local_map.cpp:57-90, 208-213; Dogleg on the global graph,
    keyframe_graph.cpp:138-142 — both adapt per iteration, where plain GN
    can diverge on a bad loop closure or near-singular subgraph).

    Each step solves (H + lambda I) dx = -b through the selected
    solver path, evaluates the candidate's ROBUSTIFIED chi2, and
    accepts/rejects: on accept lambda shrinks by Nielsen's gain-ratio
    factor max(1/3, 1 - (2 rho - 1)^3); on reject the step is discarded
    and lambda grows by the doubling sequence nu.  Rejected steps count
    against ``iterations`` (as in g2o).  Returns (graph, chi2_history)
    with the chi2 BEFORE each step (monotone non-increasing).

    ``tol`` > 0 adds convergence-based EARLY EXIT (lax.while_loop): the
    loop stops once an accepted step improves the robustified chi2 by
    less than ``tol`` relative, or a step is rejected at the lambda
    ceiling (no admissible step left) — the role g2o's internal
    terminate action plays for the reference's large fixed iteration
    budgets (OptimizationIterations=20 incremental / 5000 final,
    config.cpp:44-49: warm-started graphs converge in a handful of
    steps, and the remaining budget must not be paid for).  The history
    keeps its static [iterations] shape; slots past the exit hold the
    final chi2 so it stays monotone non-increasing."""

    def step(g, lam, nu):
        dx, b, chi2_cur = _solve_step(
            g, delta, solver, cg_iterations, GAUGE_DAMPING + lam, struct
        )
        cand = g._replace(poses=g.poses @ se3.exp_se3(dx))
        chi2_new = _graph_chi2(cand, delta)
        # predicted chi2 decrease of the damped quadratic model:
        # dx^T (lambda dx - b) (the g2o Levenberg scale term)
        pred = jnp.sum(dx * (lam * dx - b))
        rho = (chi2_cur - chi2_new) / jnp.maximum(pred, 1e-30)
        accept = (chi2_new < chi2_cur) & jnp.isfinite(chi2_new)
        poses = jnp.where(accept, cand.poses, g.poses)
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        new_lam = jnp.where(accept, lam * shrink, lam * nu)
        new_lam = jnp.clip(new_lam, lambda_min, lambda_max)
        new_nu = jnp.where(accept, 2.0, nu * 2.0)
        return g._replace(poses=poses), new_lam, new_nu, chi2_cur, chi2_new, accept, lam

    dtype = graph.poses.dtype
    lam0 = jnp.asarray(lambda_init, dtype)
    nu0 = jnp.asarray(2.0, dtype)

    if tol <= 0.0:

        def body(carry, _):
            g, lam, nu = carry
            g, lam, nu, chi2_cur, _, _, _ = step(g, lam, nu)
            return (g, lam, nu), chi2_cur

        (graph, _, _), history = jax.lax.scan(
            body, (graph, lam0, nu0), None, length=iterations
        )
        return graph, history

    def cond(c):
        _, _, _, it, done, _ = c
        return (it < iterations) & ~done

    def body(c):
        g, lam, nu, it, _, hist = c
        g, lam, nu, chi2_cur, chi2_new, accept, lam_used = step(g, lam, nu)
        # Converged when the candidate step barely MOVES the chi2 in
        # either direction — at the optimum LM steps are tiny and usually
        # REJECTED (chi2_new >= chi2_cur by float dust), so an
        # accepted-only test would burn the whole budget rejecting
        # (measured: a converged 230-vertex final pass spent 0.7 s/call
        # on 100 rejected steps, tools/final-opt probe).  A genuinely bad
        # step has a large |delta| and keeps the loop alive so lambda can
        # adapt.
        converged = jnp.isfinite(chi2_new) & (
            jnp.abs(chi2_cur - chi2_new) < tol * jnp.maximum(chi2_cur, 1e-30)
        )
        # rejected at the lambda ceiling: the damped model cannot produce
        # an acceptable step of any length — LM breakdown, stop burning
        # the iteration budget
        stuck = ~accept & (lam_used >= 0.5 * lambda_max)
        hist = hist.at[it].set(chi2_cur)
        return g, lam, nu, it + 1, converged | stuck, hist

    hist0 = jnp.zeros(iterations, dtype)
    graph, _, _, steps, _, history = jax.lax.while_loop(
        cond, body, (graph, lam0, nu0, jnp.asarray(0), jnp.asarray(False), hist0)
    )
    final = _graph_chi2(graph, delta)
    history = jnp.where(jnp.arange(iterations) < steps, history, final)
    return graph, history


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _optimize_lm_jit(arrays, iterations, delta, solver, cg_iterations, tol=0.0):
    return optimize_lm(arrays, iterations, delta, solver, cg_iterations, tol=tol)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _optimize_schur_lm_jit(arrays, struct, iterations, delta, tol=0.0):
    return optimize_lm(
        arrays, iterations, delta, solver="schur", struct=struct, tol=tol
    )


@functools.lru_cache(maxsize=8)
def _sparse_blocks_jit(delta: float):
    """Module-cached per-edge-blocks jit for the sparse-direct solver
    (one trace per delta; a per-call jax.jit re-traced every solve)."""
    return jax.jit(functools.partial(edge_blocks, delta=delta))


@functools.lru_cache(maxsize=8)
def _sparse_chi2_jit(delta: float):
    return jax.jit(functools.partial(_graph_chi2, delta=delta))


def edge_robust_weights(graph: GraphArrays, delta: float = CAUCHY_DELTA):
    """Per-edge Cauchy weights for outlier pruning
    (reference: removeOutlierConstraints, keyframe_graph.cpp:643-674)."""
    _, _, chi2 = edge_residuals(graph)
    return cauchy_weights(chi2, graph.robust, delta), chi2


def _padded_chain_structure(cap, edge_i, edge_j, active, allocated, fixed):
    """(pow2-padded ChainStructure or None, unpadded separator count).

    Raises a clear ValueError when the graph has no gauge-fixed vertex —
    pad_chain_structure parks padded separator rows on the fixed vertex,
    so the caller must have applied the fix-first-vertex gauge first."""
    struct = chain_partition(
        cap, edge_i, edge_j, active, allocated, allocated & ~fixed
    )
    if struct is None:
        return None, 0
    real = int(struct.sep_ids.shape[0])
    fixed_idx = np.nonzero(fixed)[0]
    if fixed_idx.size == 0:
        raise ValueError(
            "chain-structure padding requires a gauge-fixed vertex: fix one "
            "vertex (optimize() fixes the first subgraph vertex when nothing "
            "is fixed) before building the elimination structure"
        )
    return pad_chain_structure(struct, int(fixed_idx[0])), real


class _Subgraph(NamedTuple):
    """Compacted active subgraph (host NumPy, pow2-padded) + the index map
    back into the owning PoseGraph's vertex storage."""

    vidx: np.ndarray  # [n] original vertex indices
    n: int  # real vertex count (arrays padded beyond)
    e: int  # real edge count
    poses: np.ndarray
    vertex_mask: np.ndarray
    fixed: np.ndarray
    edge_i: np.ndarray
    edge_j: np.ndarray
    measurements: np.ndarray
    information: np.ndarray
    edge_mask: np.ndarray
    robust: np.ndarray

    def to_graph_arrays(self) -> GraphArrays:
        """Upload to the CURRENT default device (callers pin graph solves
        to host via jax.default_device)."""
        return GraphArrays(
            poses=jnp.asarray(self.poses),
            vertex_mask=jnp.asarray(self.vertex_mask),
            fixed_mask=jnp.asarray(self.fixed),
            edge_i=jnp.asarray(self.edge_i),
            edge_j=jnp.asarray(self.edge_j),
            measurements=jnp.asarray(self.measurements),
            information=jnp.asarray(self.information),
            edge_mask=jnp.asarray(self.edge_mask),
            robust=jnp.asarray(self.robust),
        )

    def chain_structure(self):
        return _padded_chain_structure(
            len(self.poses), self.edge_i, self.edge_j, self.edge_mask,
            self.vertex_mask, self.fixed,
        )


class PoseGraph:
    """Host-side growable pose graph over padded device arrays.

    Replaces the g2o SparseOptimizer facade used by LocalMap and
    KeyframeGraph.  Vertices/edges are appended on host (NumPy) and the
    padded arrays are shipped to the device per optimize() call; capacity
    doubles amortize recompilation.
    """

    def __init__(self, vertex_capacity: int = 16, edge_capacity: int = 32, dtype=np.float32):
        self.dtype = dtype
        self._n = 0
        self._e = 0
        self._vertex_ids: dict = {}
        # structure cache: the compacted subgraph + its chain elimination
        # structure are pure functions of (graph STRUCTURE, max_level) —
        # vertex/edge sets, activity, levels, gauge — not of the poses.
        # The dense final pass re-optimizes the SAME structure 10 rounds
        # in a row (outlier pruning usually removes nothing after round
        # 1), and the host O(N+E) compaction + chain walk + pow2 padding
        # per round was ~half its per-round cost (VERDICT r4).  Mutators
        # bump _struct_version; optimize() refreshes only the poses.
        self._struct_version = 0
        self._struct_cache = None  # ((version, max_level), entry dict)
        # convergence memo: an optimize() whose LM loop exited via the
        # |delta chi2| < tol test has reached its fixed point for the
        # current (structure, poses); re-solving the identical state (the
        # final pass's remaining rounds when outlier pruning removed
        # nothing — the reference's g2o happily re-pays the solve,
        # keyframe_graph.cpp:266-281) costs a full Schur factorization
        # per round for zero movement.  Keyed on both versions so ANY
        # mutation invalidates.  edge_diagnostics memoizes the same way
        # (outlier pruning calls it every round).
        self._poses_version = 0
        self._converged_memo = None
        self._diag_memo = None
        # (min_idx, max_idx) -> [edge indices]: find_edge was an O(E)
        # scan per query; the final-pass re-search queries per candidate
        # pair, O(K^2 * E) at fr3 scale (VERDICT r4 weakness 6)
        self._edge_index: dict = {}
        self._alloc_vertices(vertex_capacity)
        self._alloc_edges(edge_capacity)

    def _touch_structure(self):
        self._struct_version += 1
        self._struct_cache = None

    def _touch_poses(self):
        self._poses_version += 1

    def _alloc_vertices(self, cap):
        self.poses = np.tile(np.eye(4, dtype=self.dtype), (cap, 1, 1))
        self.fixed = np.zeros(cap, bool)

    def _alloc_edges(self, cap):
        self.edge_i = np.zeros(cap, np.int32)
        self.edge_j = np.zeros(cap, np.int32)
        self.measurements = np.tile(np.eye(4, dtype=self.dtype), (cap, 1, 1))
        self.information = np.tile(np.eye(6, dtype=self.dtype), (cap, 1, 1))
        self.edge_active = np.zeros(cap, bool)
        self.robust = np.zeros(cap, bool)
        # edge "level": 0 = always optimized, 2 = only in dense mode — the
        # reference's g2o edge levels (keyframe_graph.cpp:764-772, 257-264)
        self.edge_level = np.zeros(cap, np.int32)

    @property
    def num_vertices(self) -> int:
        return self._n

    @property
    def num_edges(self) -> int:
        return self._e

    def add_vertex(self, key, pose, fixed: bool = False) -> int:
        """Add (or update) a vertex keyed by any hashable id; returns index."""
        if key in self._vertex_ids:
            idx = self._vertex_ids[key]
            self.poses[idx] = np.asarray(pose, self.dtype)
            self._touch_poses()
            if bool(self.fixed[idx]) != fixed:
                self._touch_structure()  # gauge change
            self.fixed[idx] = fixed
            return idx
        self._touch_structure()
        self._touch_poses()
        if self._n == len(self.poses):
            old_p, old_f = self.poses, self.fixed
            self._alloc_vertices(2 * len(old_p))
            self.poses[: self._n] = old_p
            self.fixed[: self._n] = old_f
        idx = self._n
        self._vertex_ids[key] = idx
        self.poses[idx] = np.asarray(pose, self.dtype)
        self.fixed[idx] = fixed
        self._n += 1
        return idx

    def vertex_index(self, key) -> int:
        return self._vertex_ids[key]

    def has_vertex(self, key) -> bool:
        return key in self._vertex_ids

    def vertex_pose(self, key) -> np.ndarray:
        return self.poses[self._vertex_ids[key]]

    def set_vertex_pose(self, key, pose):
        self.poses[self._vertex_ids[key]] = np.asarray(pose, self.dtype)
        self._touch_poses()

    def set_fixed(self, key, fixed: bool = True):
        self.fixed[self._vertex_ids[key]] = fixed
        self._touch_structure()

    def add_edge(
        self,
        key_i,
        key_j,
        measurement,
        information,
        robust: bool = False,
        level: int = 0,
    ) -> int:
        """Add edge with measurement T_i^{-1} T_j and 6x6 information."""
        if self._e == len(self.edge_i):
            old = (
                self.edge_i,
                self.edge_j,
                self.measurements,
                self.information,
                self.edge_active,
                self.robust,
                self.edge_level,
            )
            self._alloc_edges(2 * len(self.edge_i))
            for new, o in zip(
                (
                    self.edge_i,
                    self.edge_j,
                    self.measurements,
                    self.information,
                    self.edge_active,
                    self.robust,
                    self.edge_level,
                ),
                old,
            ):
                new[: self._e] = o
        k = self._e
        self.edge_i[k] = self._vertex_ids[key_i]
        self.edge_j[k] = self._vertex_ids[key_j]
        self.measurements[k] = np.asarray(measurement, self.dtype)
        self.information[k] = np.asarray(information, self.dtype)
        self.edge_active[k] = True
        self.robust[k] = robust
        self.edge_level[k] = level
        self._e += 1
        a, b = int(self.edge_i[k]), int(self.edge_j[k])
        self._edge_index.setdefault((min(a, b), max(a, b)), []).append(k)
        self._touch_structure()
        return k

    def rename_vertex(self, old_key, new_key):
        """Re-key a vertex (the reference's g2o changeId promotion of an
        odometry vertex to a keyframe vertex, keyframe_graph.cpp:776-780)."""
        idx = self._vertex_ids.pop(old_key)
        self._vertex_ids[new_key] = idx

    def set_edge_level(self, edge_index: int, level: int):
        self.edge_level[edge_index] = level
        self._touch_structure()

    def set_all_edge_levels(self, level: int):
        """Promote every edge into the optimized set (the dense final
        optimization mode, keyframe_graph.cpp:257-264)."""
        self.edge_level[: self._e] = level
        self._touch_structure()

    def find_edge(self, key_i, key_j):
        """Index of the first active edge between two vertices (either
        direction), or None — O(1) via the pair index (an O(E) scan per
        query made the final-pass re-search O(K^2 E) at scale)."""
        a, b = int(self._vertex_ids[key_i]), int(self._vertex_ids[key_j])
        for k in self._edge_index.get((min(a, b), max(a, b)), ()):
            if self.edge_active[k]:
                return k
        return None

    def edge_list(self):
        """Host iteration over active edges as
        (key_i, key_j, measurement, information, robust, level)."""
        rev = {v: k for k, v in self._vertex_ids.items()}
        out = []
        for k in range(self._e):
            if not self.edge_active[k]:
                continue
            out.append(
                (
                    rev[int(self.edge_i[k])],
                    rev[int(self.edge_j[k])],
                    self.measurements[k],
                    self.information[k],
                    bool(self.robust[k]),
                    int(self.edge_level[k]),
                )
            )
        return out

    def vertex_keys(self):
        return list(self._vertex_ids.keys())

    def deactivate_edges(self, edge_indices):
        """Mask out edges (the outlier-removal primitive)."""
        self.edge_active[np.asarray(edge_indices, np.int64)] = False
        self._touch_structure()

    def to_arrays(self) -> GraphArrays:
        cap_v, cap_e = len(self.poses), len(self.edge_i)
        vmask = np.zeros(cap_v, bool)
        vmask[: self._n] = True
        return GraphArrays(
            poses=jnp.asarray(self.poses),
            vertex_mask=jnp.asarray(vmask),
            fixed_mask=jnp.asarray(self.fixed & vmask),
            edge_i=jnp.asarray(self.edge_i),
            edge_j=jnp.asarray(self.edge_j),
            measurements=jnp.asarray(self.measurements),
            information=jnp.asarray(self.information),
            edge_mask=jnp.asarray(self.edge_active),
            robust=jnp.asarray(self.robust),
        )

    # above this many allocated vertices the dense [6N, 6N] Cholesky is
    # replaced by block-sparse preconditioned CG (a 128-vertex dense solve
    # is a 768x768 factorization — past that the dense path's O(N^2)
    # memory and O(N^3) solve lose to O(E) CG)
    DENSE_SOLVER_MAX_VERTICES = 128

    # separator-set cap for the Schur chain direct solver: the reduced
    # system is a dense [6S, 6S] f64 Cholesky, cheap far beyond the
    # all-vertex dense cap (S=384 -> 2304^2, ~4 GFLOP).  Keeping this
    # high matters because block-Jacobi CG converges SLOWLY on loopy
    # keyframe graphs — measured (tools/cg_iteration_stats.py): a
    # 2049-vertex ring with loop closures every 7 frames needs 5-8k CG
    # iterations per GN step at tol=1e-6, while chain elimination solves
    # it exactly in two sweeps + one ~1750-dof dense factorization.
    SCHUR_SEPARATOR_MAX_VERTICES = 384

    # "auto" prefers the host sparse-direct solver (exact f64 scipy
    # factorization — the reference's g2o+CSparse architecture) up to
    # this many vertices when chain elimination is DEGENERATE (separator
    # set close to the whole graph).  The e2e SLAM graph is the
    # motivating shape: LocalMap emits an odometry edge AND a keyframe
    # edge per frame, so every vertex has degree >= 3, chains vanish,
    # and "schur" decays into a dense 6S x 6S factorization of
    # essentially the full system per LM iteration — measured 1.15 s per
    # keyframe event at 300 keyframes (tools/backend_scale_probe.py)
    # where sparse Cholesky takes milliseconds.
    SPARSE_DIRECT_MAX_VERTICES = 4096

    # chain elimination is worthwhile only when it eliminates most of
    # the graph; past this separator fraction the reduced system IS the
    # system and schur pays elimination sweeps for nothing
    SCHUR_SEPARATOR_MAX_FRACTION = 0.6

    def _chain_structure(self, max_level):
        """Host elimination-structure analysis for the Schur chain solver,
        under the same gauge convention as optimize() (vertex 0 fixed when
        nothing is)."""
        cap = len(self.poses)
        allocated = np.zeros(cap, bool)
        allocated[: self._n] = True
        fixed = (self.fixed & allocated).copy()
        if not fixed[: self._n].any():
            fixed[0] = True
        active = self.edge_active & (
            self.edge_level[: len(self.edge_i)] <= max_level
        )
        struct, self._real_sep_count = _padded_chain_structure(
            cap, self.edge_i, self.edge_j, active, allocated, fixed
        )
        return struct

    def _compact_subgraph(self, max_level) -> Optional["_Subgraph"]:
        """Host-side compaction of the ACTIVE subgraph: only vertices
        touched by an active edge with level <= max_level enter the solve.

        This is what g2o's initializeOptimization(level) gives the
        reference (keyframe_graph.cpp:481-489): the incremental sparse
        pass (max_level=0) optimizes the ~K keyframe vertices, NOT the
        whole allocated graph.  Without compaction the solver policy saw
        the total vertex count (keyframes + odometry) and routed a
        K-vertex problem to the big-graph f64 Schur path — the round-3
        back end spent 626 ms/frame there.  Vertices outside the
        subgraph received a zero update anyway (gauge-damped, zero
        gradient), so compaction is exact.

        Arrays are pow2-padded so jitted solvers see one shape per
        capacity bucket as the graph grows."""
        e_act = self.edge_active[: self._e] & (
            self.edge_level[: self._e] <= max_level
        )
        eidx = np.nonzero(e_act)[0]
        if eidx.size == 0:
            return None
        used = np.zeros(self._n, bool)
        used[self.edge_i[eidx]] = True
        used[self.edge_j[eidx]] = True
        vidx = np.nonzero(used)[0]
        n_sub, e_sub = int(vidx.size), int(eidx.size)
        remap = np.zeros(self._n, np.int32)
        remap[vidx] = np.arange(n_sub, dtype=np.int32)
        cap_v, cap_e = _pow2(n_sub), _pow2(e_sub)
        poses = np.tile(np.eye(4, dtype=self.dtype), (cap_v, 1, 1))
        poses[:n_sub] = self.poses[vidx]
        vmask = np.zeros(cap_v, bool)
        vmask[:n_sub] = True
        fixed = np.zeros(cap_v, bool)
        fixed[:n_sub] = self.fixed[vidx]
        if not fixed[:n_sub].any():
            # gauge: fix the first subgraph vertex (the convention g2o
            # requires before initializeOptimization)
            fixed[0] = True
        ei = np.zeros(cap_e, np.int32)
        ei[:e_sub] = remap[self.edge_i[eidx]]
        ej = np.zeros(cap_e, np.int32)
        ej[:e_sub] = remap[self.edge_j[eidx]]
        meas = np.tile(np.eye(4, dtype=self.dtype), (cap_e, 1, 1))
        meas[:e_sub] = self.measurements[eidx]
        info = np.tile(np.eye(6, dtype=self.dtype), (cap_e, 1, 1))
        info[:e_sub] = self.information[eidx]
        emask = np.zeros(cap_e, bool)
        emask[:e_sub] = True
        robust = np.zeros(cap_e, bool)
        robust[:e_sub] = self.robust[eidx]
        return _Subgraph(
            vidx=vidx, n=n_sub, e=e_sub, poses=poses, vertex_mask=vmask,
            fixed=fixed, edge_i=ei, edge_j=ej, measurements=meas,
            information=info, edge_mask=emask, robust=robust,
        )

    def _optimize_sparse_direct(self, iterations, delta, arrays, algorithm="gn",
                                tol: float = 0.0):
        """Host-side sparse-direct GN/LM: per-edge blocks via jit, exact
        f64 sparse Cholesky/LU on host — the literal architecture of the
        reference's g2o+CSparse backends (keyframe_graph.cpp:138-142:
        Jacobians in the optimizer, factorization in a host sparse
        library).  Exact at any N; the oracle for the iterative CG path
        on graphs too big for the dense solver, and the pure-host
        fallback when a device solve faults.

        Returns (history, poses [N, 4, 4]) — the caller scatters the
        poses back (optimize() owns the subgraph index map)."""
        with jax.enable_x64(True):
            return self._optimize_sparse_direct_x64(
                iterations, delta, arrays, algorithm, tol
            )

    @staticmethod
    def _finish_history(history, chi2_final):
        """Append the post-step chi2 so a tol-terminated run's history
        ends in the converged plateau — the convergence-memo detection
        (optimize()) reads the tail delta, and the jitted LM paths pad
        the same way."""
        if np.isfinite(chi2_final):
            history.append(float(chi2_final))

    def _optimize_sparse_direct_x64(self, iterations, delta, arrays, algorithm,
                                    tol):
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        from ..ops import se3 as se3_ops

        n = arrays.poses.shape[0]
        free = np.asarray(arrays.vertex_mask & ~arrays.fixed_mask)
        ei = np.asarray(arrays.edge_i)
        ej = np.asarray(arrays.edge_j)
        history = []
        # the blocks feed an exact f64 factorization — compute them in f64
        # too (the device solvers promote the same way)
        arrays = jax.tree.map(
            lambda x: x.astype(jnp.float64) if x.dtype == jnp.float32 else x,
            arrays,
        )
        # module-cached jits: building them per call re-traced (and
        # through a cold persistent cache re-compiled) edge_blocks/_chi2
        # on EVERY optimize call — measured ~0.8 s per final-pass round
        # of pure retrace overhead at the e2e shape
        blocks_fn = _sparse_blocks_jit(delta)
        chi2_fn = _sparse_chi2_jit(delta)
        poses = arrays.poses
        lam, nu = 1e-5, 2.0  # LM state (Nielsen adaptation, as optimize_lm)
        for _ in range(iterations):
            g = arrays._replace(poses=poses)
            H_ii, H_ij, H_jj, b_i, b_j, chi2 = blocks_fn(g)
            history.append(
                float(jnp.sum(jnp.where(arrays.edge_mask, chi2, 0.0)))
            )
            H_ii, H_ij, H_jj = (
                np.asarray(H_ii, np.float64),
                np.asarray(H_ij, np.float64),
                np.asarray(H_jj, np.float64),
            )
            b = np.zeros((n, 6))
            np.add.at(b, ei, np.asarray(b_i, np.float64))
            np.add.at(b, ej, np.asarray(b_j, np.float64))
            # assemble the gauged sparse system in COO block form
            rows, cols, vals = [], [], []
            r6 = np.arange(6)
            rr, cc = np.meshgrid(r6, r6, indexing="ij")

            def add_block(i_arr, j_arr, blk):
                rows.append((i_arr[:, None, None] * 6 + rr[None]).ravel())
                cols.append((j_arr[:, None, None] * 6 + cc[None]).ravel())
                vals.append(blk.ravel())

            freef = free.astype(np.float64)
            scale = freef[ei] * freef[ej]
            add_block(ei, ei, H_ii * freef[ei][:, None, None])
            add_block(ei, ej, H_ij * scale[:, None, None])
            add_block(ej, ei, np.swapaxes(H_ij, 1, 2) * scale[:, None, None])
            add_block(ej, ej, H_jj * freef[ej][:, None, None])
            # gauge diagonal: damping on free vertices, identity(+damping)
            # on fixed/unallocated ones (matching apply_gauge)
            diag = np.arange(n)
            diag_idx = (diag[:, None] * 6 + r6[None]).ravel()
            damping = GAUGE_DAMPING + (lam if algorithm == "lm" else 0.0)
            diag_vals = np.where(free, damping, 1.0 + damping)
            rows.append(diag_idx)
            cols.append(diag_idx)
            vals.append(np.repeat(diag_vals, 6))
            H = sp.coo_matrix(
                (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
                shape=(6 * n, 6 * n),
            ).tocsc()
            rhs = (-b * freef[:, None]).ravel()
            dx = spla.spsolve(H, rhs).reshape(n, 6)
            dx = np.where(free[:, None], dx, 0.0)
            cand = poses @ se3_ops.exp_se3(jnp.asarray(dx, arrays.poses.dtype))
            if algorithm == "lm":
                chi2_cur = float(chi2_fn(arrays._replace(poses=poses)))
                chi2_new = float(chi2_fn(arrays._replace(poses=cand)))
                if np.isfinite(chi2_new) and chi2_new < chi2_cur:
                    poses = cand
                    pred = float(np.sum(dx * (lam * dx - b)))
                    rho = (chi2_cur - chi2_new) / max(pred, 1e-30)
                    lam = max(1e-10, lam * max(1.0 / 3.0, 1.0 - (2 * rho - 1) ** 3))
                    nu = 2.0
                else:
                    lam = min(1e8, lam * nu)
                    nu *= 2.0
                    if tol > 0.0 and lam >= 0.5e8:
                        # LM breakdown: rejected at the lambda ceiling —
                        # no admissible step left, i.e. a fixed point
                        self._finish_history(history, chi2_cur)
                        break
                # converged when the step barely moves chi2 either way
                # (tiny rejected steps ARE convergence — see optimize_lm)
                if (
                    tol > 0.0
                    and np.isfinite(chi2_new)
                    and abs(chi2_cur - chi2_new) < tol * max(chi2_cur, 1e-30)
                ):
                    self._finish_history(history, min(chi2_cur, chi2_new))
                    break
            else:
                poses = cand
        # history stays f64: the convergence-memo detection reads the
        # tail delta against tol=1e-8, below f32 resolution at chi2~0.2
        return np.asarray(history, np.float64), np.asarray(poses)

    def optimize(
        self,
        iterations: int = 50,
        delta: float = CAUCHY_DELTA,
        max_level: int = 0,
        solver: str = "auto",
        algorithm: str = "lm",
        tol: float = 1e-8,
    ) -> np.ndarray:
        """Optimize in place over edges with level <= max_level; returns the
        chi2 history.  max_level=0 is the sparse keyframe-graph mode,
        max_level >= 2 the dense mode including odometry edges.

        The solve always runs on the COMPACTED active subgraph (vertices
        touched by an in-level active edge — what g2o's
        initializeOptimization(level) gives the reference), and is pinned
        to the host CPU backend when the session's default backend is an
        accelerator (module doc: the reference's g2o+CSparse runs on host
        too; f64 on TPU is emulated and was the round-3 crash site).

        ``solver``: "auto" uses the dense Cholesky oracle up to
        DENSE_SOLVER_MAX_VERTICES *active* vertices; beyond that it
        prefers the Schur chain direct solver when elimination reduces
        the graph to a small separator set (the dense-final-pass shape:
        odometry chains between keyframes) and falls back to block-sparse
        CG otherwise (the reference's CSparse role,
        keyframe_graph.cpp:138-142); "dense" / "cg" / "schur" / "sparse"
        force a path.

        ``algorithm``: "lm" (default) runs Levenberg-Marquardt with
        adaptive lambda — chi2-increase steps are REJECTED and damping
        grows, matching the reference's g2o Levenberg/Dogleg behavior
        (local_map.cpp:57-90, keyframe_graph.cpp:138-142); "gn" runs the
        fixed-damping Gauss-Newton loop (the round-2 behavior, kept for
        parity/oracle use).

        ``tol``: relative chi2-decrease convergence threshold for the LM
        paths (0 disables early exit and runs the full budget).  A device
        fault during the solve degrades to the pure-host sparse-direct
        solver instead of killing the caller."""
        if self._n < 2 or self._e < 1:
            return np.zeros(0, self.dtype)
        if algorithm not in ("gn", "lm"):
            raise ValueError(f"unknown algorithm {algorithm!r}")
        # Convergence memo (see __init__): identical (structure, poses,
        # objective) to a solve that already exited via the tol test —
        # the state IS the fixed point; return its final chi2 instead of
        # re-factorizing for a zero-length step.
        solver_arg = solver  # memo keys use the PRE-resolution name
        memo_key = (
            self._struct_version, self._poses_version, max_level, solver,
            algorithm, delta, tol,
        )
        if (
            tol > 0.0
            and self._converged_memo is not None
            and self._converged_memo[0] == memo_key
        ):
            return np.asarray(self._converged_memo[1]).copy()
        # The compaction + chain walk depend only on STRUCTURE (see
        # __init__): consecutive optimize() calls with no intervening
        # mutation (the final pass's 10 rounds when outlier pruning
        # removed nothing) reuse both and refresh only the poses.
        key = (self._struct_version, max_level)
        if self._struct_cache is not None and self._struct_cache[0] == key:
            entry = self._struct_cache[1]
        else:
            sub0 = self._compact_subgraph(max_level)
            entry = None if sub0 is None else {"sub": sub0}
            self._struct_cache = (key, entry)
        if entry is None:
            return np.zeros(0, self.dtype)
        sub = entry["sub"]
        sub.poses[: sub.n] = self.poses[sub.vidx]

        def cached_chain():
            if "chain" not in entry:
                entry["chain"] = sub.chain_structure()
            return entry["chain"]

        chain = None
        if solver == "auto":
            if sub.n <= self.DENSE_SOLVER_MAX_VERTICES:
                solver = "dense"
            else:
                # computed ONCE and reused by the schur solve below
                chain, self._real_sep_count = cached_chain()
                sep_ok = (
                    chain is not None
                    and self._real_sep_count <= self.SCHUR_SEPARATOR_MAX_VERTICES
                    and self._real_sep_count
                    <= self.SCHUR_SEPARATOR_MAX_FRACTION * sub.n
                )
                if sep_ok:
                    solver = "schur"
                elif sub.n <= self.SPARSE_DIRECT_MAX_VERTICES:
                    # degenerate chains / loopy graphs: exact sparse
                    # Cholesky on host (see SPARSE_DIRECT_MAX_VERTICES)
                    solver = "sparse"
                else:
                    solver = "cg"
        elif solver == "schur":
            chain, self._real_sep_count = cached_chain()
            if chain is None:
                # nothing to eliminate — the dense oracle IS the reduced
                # system (or CG for big chain-free graphs)
                solver = (
                    "dense" if sub.n <= self.DENSE_SOLVER_MAX_VERTICES else "cg"
                )

        try:
            history, out_poses = self._solve_compact(
                sub, chain, iterations, delta, solver, algorithm, tol
            )
        except RuntimeError as err:
            if solver == "sparse":
                raise
            # A device fault must DEGRADE, not kill the run (the round-3
            # bench died in a nondeterministic TPU worker fault at the
            # schur-LM result download).  The sparse-direct path is exact
            # host linear algebra over host-pinned block jits.
            warnings.warn(
                f"pose-graph {solver!r} solve failed ({err!r}); "
                "falling back to the host sparse-direct solver"
            )
            dev = _host_solve_device()
            ctx = (
                jax.default_device(dev) if dev is not None
                else contextlib.nullcontext()
            )
            with ctx:
                history, out_poses = self._optimize_sparse_direct(
                    iterations, delta, sub.to_graph_arrays(), algorithm, tol
                )
        self.poses[sub.vidx] = out_poses[: sub.n].astype(self.dtype, copy=False)
        self._touch_poses()
        history = np.asarray(history)
        # Memo only a solve the tol test actually terminated: the padded
        # history repeats the final chi2 past the exit point, so a tail
        # |delta| below tol distinguishes a converged fixed point from a
        # budget exhausted mid-descent.
        if (
            tol > 0.0
            and history.shape[0] >= 2
            and abs(float(history[-1]) - float(history[-2]))
            < tol * max(abs(float(history[-1])), 1e-30)
        ):
            self._converged_memo = (
                (
                    self._struct_version, self._poses_version, max_level,
                    solver_arg, algorithm, delta, tol,
                ),
                history.copy(),
            )
        else:
            self._converged_memo = None
        return history

    def _solve_compact(self, sub, chain, iterations, delta, solver, algorithm,
                       tol):
        """Run one solver path on a compacted subgraph; returns
        (history, poses [cap_v, 4, 4] np.ndarray)."""
        dev = _host_solve_device()
        ctx = (
            jax.default_device(dev) if dev is not None
            else contextlib.nullcontext()
        )
        lm = algorithm == "lm"
        lm_tol = tol if lm else 0.0
        with ctx:
            arrays = sub.to_graph_arrays()
            if solver == "sparse":
                return self._optimize_sparse_direct(
                    iterations, delta, arrays, algorithm, tol
                )
            # Krylov bound: a chain of N vertices needs ~N CG iterations
            # to propagate a correction end to end; the tolerance check
            # exits early on well-conditioned (loopy) graphs.
            cg_iterations = min(max(256, 2 * sub.n), 8192)
            promote = lambda x: (
                x.astype(jnp.float64) if x.dtype == jnp.float32 else x
            )
            if solver == "schur":
                # direct factorization in double like the reference's
                # CSparse (long chains are too ill-conditioned for f32
                # elimination)
                with jax.enable_x64(True):
                    a64 = jax.tree.map(promote, arrays)
                    if lm:
                        out, history = _optimize_schur_lm_jit(
                            a64, chain, iterations, delta, lm_tol
                        )
                    else:
                        out, history = _optimize_schur_jit(
                            a64, chain, iterations, delta
                        )
                    return np.asarray(history), np.asarray(out.poses)
            if solver == "cg":
                # The reference solves graphs in double (g2o/CSparse);
                # block-CG on big graphs needs the same — f32 stalls on
                # the soft modes of long chains.  enable_x64 scopes the
                # promotion to this solve; image alignment stays f32.
                with jax.enable_x64(True):
                    a64 = jax.tree.map(promote, arrays)
                    if lm:
                        out, history = optimize_lm(
                            a64, iterations, delta, solver, cg_iterations,
                            tol=lm_tol,
                        )
                    else:
                        out, history = optimize(
                            a64, iterations, delta, solver, cg_iterations
                        )
                    return np.asarray(history), np.asarray(out.poses)
            if solver != "dense":
                raise ValueError(f"unknown solver {solver!r}")
            if dev is not None:
                # host-pinned: run the small dense system in f64 like the
                # reference's g2o doubles (free on CPU; the f32 form is
                # kept for the on-accelerator path)
                with jax.enable_x64(True):
                    a64 = jax.tree.map(promote, arrays)
                    if lm:
                        out, history = _optimize_lm_jit(
                            a64, iterations, delta, solver, cg_iterations,
                            lm_tol,
                        )
                    else:
                        out, history = _optimize_jit(
                            a64, iterations, delta, solver, cg_iterations
                        )
                    return np.asarray(history), np.asarray(out.poses)
            if lm:
                out, history = _optimize_lm_jit(
                    arrays, iterations, delta, solver, cg_iterations, lm_tol
                )
            else:
                out, history = _optimize_jit(
                    arrays, iterations, delta, solver, cg_iterations
                )
            return np.asarray(history), np.asarray(out.poses)

    def edge_diagnostics(self) -> Tuple[np.ndarray, np.ndarray]:
        """(robust_weight, chi2) per active edge — the EdgeErrorSerializer
        data (reference: map_serializer.cpp:76-93).  Host-pinned like the
        solves: outlier pruning calls this once per final-pass round, and
        a relay dispatch per round is pure overhead.  Memoized on the
        (structure, poses) versions: a pure function of graph state, and
        converged final-pass rounds re-query the identical state."""
        memo_key = (self._struct_version, self._poses_version)
        if self._diag_memo is not None and self._diag_memo[0] == memo_key:
            w, chi2 = self._diag_memo[1]
            return w.copy(), chi2.copy()
        dev = _host_solve_device()
        ctx = (
            jax.default_device(dev) if dev is not None
            else contextlib.nullcontext()
        )
        with ctx:
            w, chi2 = edge_robust_weights(self.to_arrays())
            w = np.asarray(w)[: self._e]
            chi2 = np.asarray(chi2)[: self._e]
            self._diag_memo = (memo_key, (w.copy(), chi2.copy()))
            return w, chi2

    def remove_outlier_edges(self, weight_threshold: float, n_max: int = -1) -> int:
        """Deactivate robustified edges whose Cauchy weight falls below the
        threshold, worst-first (keyframe_graph.cpp:643-674)."""
        w, _ = self.edge_diagnostics()
        candidates = [
            (w[k], k)
            for k in range(self._e)
            if self.edge_active[k] and self.robust[k] and w[k] < weight_threshold
        ]
        candidates.sort()
        if n_max >= 0:
            candidates = candidates[:n_max]
        if candidates:
            self.deactivate_edges([k for _, k in candidates])
        return len(candidates)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _optimize_jit(
    arrays: GraphArrays,
    iterations: int,
    delta: float,
    solver: str = "dense",
    cg_iterations: int = 100,
):
    return optimize(arrays, iterations, delta, solver, cg_iterations)
