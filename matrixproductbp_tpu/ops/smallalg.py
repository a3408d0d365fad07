"""Unrolled small-matrix linear algebra — no ``lax.linalg`` latency floors.

Stock ``lax.linalg`` decompositions (cholesky/QR/SVD/eigh) lower to
while-loop kernels with a measured ~14-220 ms latency floor *per call* on TPU
at our shapes (tiny n, huge batch) — see CLAUDE.md.  The STTA sketch path
(``ops/stta.py``) needs exactly one SPD solve per compression; at n <= ~32
an n-step **unrolled** Cholesky + substitution is pure fused VPU code over
the batch dimension, with no latency floor and no host round-trip.  XLA maps
each unrolled step to vectorized multiply-adds across the (large) batch, so
throughput is bandwidth-bound, which these sizes trivially satisfy.

All functions take static small trailing dims and arbitrary leading batch
dims.  They are exact (same recurrence as LAPACK's unblocked Cholesky-Crout),
validated against ``jnp.linalg`` in ``tests/test_smallalg.py``.

Reference context: the Julia reference leans on LAPACK SVD for every
compression (``mpems.jl:67-94``); this module is part of the TPU-native
redesign that removes per-step decompositions from the hot loop entirely.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["chol_unrolled", "solve_lower_unrolled", "solve_lower_t_unrolled",
           "spd_solve_unrolled", "cholqr_unrolled"]

_FLOOR = 1e-30


def chol_unrolled(G: jnp.ndarray) -> jnp.ndarray:
    """Cholesky factor L (lower) of SPD ``G [..., n, n]``, unrolled over the
    n columns (Cholesky-Crout).  n must be small (<= ~32) and static."""
    n = G.shape[-1]
    idx = jnp.arange(n)
    cols = []                                   # cols[j] = L[..., :, j]
    for j in range(n):
        v = G[..., :, j]
        for k in range(j):
            v = v - cols[k] * cols[k][..., j:j + 1]
        d = jnp.sqrt(jnp.maximum(v[..., j], _FLOOR))
        col = v / d[..., None]
        cols.append(jnp.where(idx >= j, col, 0.0))
    return jnp.stack(cols, axis=-1)


def solve_lower_unrolled(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L Y = B by forward substitution; L [..., n, n] lower,
    B [..., n, k]."""
    n = L.shape[-1]
    rows = []                                   # rows[i] = Y[..., i, :]
    for i in range(n):
        acc = B[..., i, :]
        for k in range(i):
            acc = acc - L[..., i, k][..., None] * rows[k]
        rows.append(acc / jnp.maximum(L[..., i, i][..., None], _FLOOR))
    return jnp.stack(rows, axis=-2)


def solve_lower_t_unrolled(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T X = B by back substitution; L [..., n, n] lower."""
    n = L.shape[-1]
    rows: list = [None] * n
    for i in range(n - 1, -1, -1):
        acc = B[..., i, :]
        for k in range(i + 1, n):
            acc = acc - L[..., k, i][..., None] * rows[k]
        rows[i] = acc / jnp.maximum(L[..., i, i][..., None], _FLOOR)
    return jnp.stack(rows, axis=-2)


def spd_solve_unrolled(G: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve G X = B for SPD ``G [..., n, n]``, ``B [..., n, k]`` with one
    unrolled Cholesky + two unrolled substitutions (no ``lax.linalg``)."""
    L = chol_unrolled(G)
    return solve_lower_t_unrolled(L, solve_lower_unrolled(L, B))


def cholqr_unrolled(A: jnp.ndarray, eps: float | None = None):
    """Thin QR via Cholesky-QR with unrolled factorization: A [..., m, n] ->
    (Q [..., m, n], R [..., n, n]) with A = Q R, R = L^T upper triangular.

    The reduced-QR replacement for the randomized-rounding projection step
    (``ops/randomized.py``): only Q's column space matters there, and CholQR
    is pure fused VPU code over the batch (no ``lax.linalg`` latency floor).
    A small trace-scaled jitter keeps the Gram factorization defined when the
    sketch is rank-deficient; junk directions carry ~zero projection weight
    and are removed by the caller's final truncating sweep.
    """
    n = A.shape[-1]
    if eps is None:
        eps = 1e-12 if A.dtype == jnp.float64 else 1e-6
    G = jnp.einsum("...mi,...mj->...ij", A, A)
    tr = jnp.maximum(
        jnp.trace(G, axis1=-2, axis2=-1), _FLOOR)[..., None, None]
    L = chol_unrolled(G + (eps / n) * tr * jnp.eye(n, dtype=A.dtype))
    # Q = A L^{-T}  <=>  Q^T = L^{-1} A^T
    Qt = solve_lower_unrolled(L, jnp.swapaxes(A, -1, -2))
    return jnp.swapaxes(Qt, -1, -2), jnp.swapaxes(L, -1, -2)
