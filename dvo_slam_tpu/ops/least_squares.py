"""6-DoF normal-equation solvers and partial-sum merging.

TPU-native parity for the reference's least-squares family
(dvo_core/src/core/least_squares.cpp):

  * ``solve_ldlt``      — the production path: symmetric 6x6 solve with
    Jacobi pre-scaling (NormalEquationsLeastSquares::solve,
    least_squares.cpp:82-85; the reference solves in double, we recover
    float32 conditioning by symmetric diagonal equilibration).
  * ``solve_evd``       — eigendecomposition solve with small-eigenvalue
    truncation (EvdLeastSquares, least_squares.cpp:87-114): rank-deficient
    directions are dropped instead of amplified, useful for degenerate
    geometry (e.g. a single plane filling the view).
  * ``solve_svd``       — minimum-norm SVD solve of the stacked system
    (SvdLeastSquares, least_squares.cpp:116-145).
  * ``combine``         — merge independently accumulated partial normal
    equations (NormalEquationsLeastSquares::combine, least_squares.cpp:66-72
    and OptimizedSelfAdjointMatrix6x6f::operator+=, math_sse.cpp:180-188).
    Under sharding this merge is a ``jax.lax.psum`` — see
    parallel/distributed_ba.py (SURVEY.md 2.5 P6).

The reference's ``PrecomputedNormalEquationsLeastSquares``
(least_squares.cpp:147-234) — normal equations assembled once, re-solved
for many right-hand sides — maps to :class:`ops.pallas_kernels.FusedPartials`:
the fused kernel emits precision-independent partials from which
``assemble_normal_equations`` re-forms (A, b) for any 2x2 precision
without touching pixels again.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class NormalEquations(NamedTuple):
    """A x = b with A [6, 6] symmetric PSD, b [6]; ``error`` carries the
    accumulated weighted squared residual, ``num_constraints`` the count
    (the reference's NormalEquationsLeastSquares fields)."""

    A: jnp.ndarray  # [6, 6]
    b: jnp.ndarray  # [6]
    error: jnp.ndarray  # []
    num_constraints: jnp.ndarray  # []


def combine(a: NormalEquations, b: NormalEquations) -> NormalEquations:
    """Merge two partial accumulations (the P6 partial-sum merge)."""
    return NormalEquations(
        A=a.A + b.A,
        b=a.b + b.b,
        error=a.error + b.error,
        num_constraints=a.num_constraints + b.num_constraints,
    )


def _cholesky_solve_unrolled(A, b, n: int = 6):
    """Fully unrolled Cholesky solve for a tiny SPD system.

    ``jnp.linalg.solve`` lowers to an LU custom call that cannot fuse and
    serializes the TPU inside the IRLS while_loop; for a 6x6 system the
    unrolled factorization is ~150 scalar ops that XLA fuses into the
    surrounding iteration for free.  Diagonal pivots are floored so a
    singular system yields large-but-finite steps (the equilibrated
    diagonal is ~1, so the floor only engages on rank deficiency).
    """
    a = [[A[i, j] for j in range(n)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    tiny = jnp.asarray(1e-20, A.dtype)
    for j in range(n):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, tiny))
        for i in range(j + 1, n):
            s = a[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s / L[j][j]
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def solve_ldlt(A, b):
    """Solve the 6x6 system with symmetric Jacobi pre-scaling.

    D^-1/2 A D^-1/2 y = D^-1/2 b, x = D^-1/2 y — equilibration recovers
    the conditioning the reference buys with a float64 LDLT
    (dense_tracking.cpp:345-347) while staying in float32 on device.
    """
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(A), 1e-20))
    d_inv = 1.0 / d
    A_s = A * d_inv[:, None] * d_inv[None, :]
    b_s = b * d_inv
    y = _cholesky_solve_unrolled(A_s, b_s)
    return y * d_inv


def solve_evd(A, b, rel_threshold=1e-6):
    """Eigendecomposition solve, truncating eigenvalues below
    ``rel_threshold`` x the largest (EvdLeastSquares semantics: drop
    unobservable directions rather than divide by them)."""
    w, V = jnp.linalg.eigh(A)
    w_max = jnp.max(jnp.abs(w))
    keep = w > rel_threshold * w_max
    inv_w = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
    return V @ (inv_w * (V.T @ b))


def solve_svd(J, r, w=None):
    """Minimum-norm solve of the stacked weighted system J x = -r via SVD
    (SvdLeastSquares).  ``J`` is [M, 6], ``r`` [M]; optional weights [M]
    are applied as sqrt(w) row scaling."""
    if w is not None:
        sw = jnp.sqrt(w)
        J = J * sw[:, None]
        r = r * sw
    x, _, _, _ = jnp.linalg.lstsq(J, -r)
    return x
