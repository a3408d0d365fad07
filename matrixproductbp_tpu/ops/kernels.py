"""Pallas TPU kernels for batched small-matrix factorizations.

The BP sweep's hot loop performs thousands of factorizations of *tiny*
matrices ([m <= 128, n <= 32]) batched over edges/nodes.  XLA's stock
QR/SVD/eigh lower to QDWH/Householder while-loops with a ~10-200ms floor per
call at these sizes — they dominate the sweep (see bench notes).  These
kernels instead put the **batch in the lane dimension** (128 lanes) and unroll
the tiny factorization loop over columns, so each step is a fully vectorized
VPU op across the batch:

* ``batched_cholqr(A)``: Q, R with A = Q R via Cholesky-QR
  (G = A^T A + eps, L = chol(G), Q = A L^{-T}, R = L^T).  One pallas_call,
  ~n unrolled column steps.

Used by the ``method='randomized'`` fast path; the deterministic path keeps
stock QR/SVD (accuracy gates).  On CPU (tests) the kernel runs in interpreter
mode automatically.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["batched_cholqr", "cholqr_reference", "cholqr"]

_LANES = 128


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def cholqr(A: jax.Array, eps: float | None = None):
    """Thin QR for the randomized-rounding projection (``ops/randomized.py``):
    the Pallas lane-batched kernel on TPU, the unrolled VPU fallback on CPU
    (interpret-mode Pallas is too slow for the test suite).  Both are exact
    CholQR up to the rank-deficiency jitter."""
    if eps is None:
        eps = 1e-12 if A.dtype == jnp.float64 else 1e-6
    if jax.default_backend() == "tpu":
        return batched_cholqr(A, eps=eps)
    from .smallalg import cholqr_unrolled
    return cholqr_unrolled(A, eps=eps)


def cholqr_reference(A: jax.Array, eps: float = 1e-7):
    """jnp reference: A [..., m, n] -> (Q [..., m, n], R [..., n, n])."""
    n = A.shape[-1]
    G = jnp.einsum("...mi,...mj->...ij", A, A)
    scale = jnp.maximum(jnp.trace(G, axis1=-2, axis2=-1), 1e-30)[..., None, None]
    L = jnp.linalg.cholesky(G + eps * scale * jnp.eye(n, dtype=A.dtype) / n)
    Q = jax.lax.linalg.triangular_solve(L, A, left_side=False, lower=True,
                                        transpose_a=True)
    R = jnp.swapaxes(L, -1, -2)
    return Q, R


def _cholqr_kernel(a_ref, q_ref, r_ref, *, m: int, n: int, eps: float):
    """One batch tile: a [m, n, 128] -> q [m, n, 128], r [n, n, 128]."""
    A = a_ref[:]                                        # [m, n, L]
    # Gram: G[i, j, L] = sum_m A[m, i, L] A[m, j, L]   (VPU reduce over m,
    # row-by-row to keep VMEM temporaries at [m, n, L])
    G = jnp.stack([jnp.sum(A * A[:, i:i + 1, :], axis=0) for i in range(n)],
                  axis=0)                               # [n(i), n(j), L]
    tr = sum(G[i, i] for i in range(n))                 # [L]
    jitter = eps * jnp.maximum(tr, 1e-30) / n           # [L]

    # Cholesky, unrolled over columns: G = L L^T (lower)
    Lrows = []                                          # row j: [n, L]
    for j in range(n):
        s = G[j]                                        # [n, L] column j of G^T
        acc = jnp.zeros_like(s)
        for k in range(j):
            acc = acc + Lrows[k] * Lrows[k][j][None, :]
        v = s - acc                                     # [n, L]
        djj = v[j] + jitter                             # [L]
        d = jnp.sqrt(jnp.maximum(djj, 1e-30))
        row = v / d[None, :]                            # [n, L]
        # zero the upper part: row[i] valid for i >= j
        mask = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) >= j)
        row = jnp.where(mask, row, 0.0)
        Lrows.append(row)
    # Lmat[i, j, L] = L[i, j]: Lrows[j][i] holds L[i, j]
    Lmat = jnp.stack(Lrows, axis=1)                     # [n(i), n(j), L]

    # Q = A L^{-T}: forward substitution over columns j
    Qcols = []
    for j in range(n):
        acc = A[:, j, :]                                # [m, L]
        for k in range(j):
            acc = acc - Qcols[k] * Lmat[j, k][None, :]
        Qcols.append(acc / jnp.maximum(Lmat[j, j][None, :], 1e-30))
    Q = jnp.stack(Qcols, axis=1)                        # [m, n, L]

    q_ref[:] = Q
    # R = L^T
    r_ref[:] = jnp.swapaxes(Lmat, 0, 1)


@partial(jax.jit, static_argnames=("eps",))
def batched_cholqr(A: jax.Array, eps: float = 1e-6):
    """A [..., m, n] -> (Q, R) via the Pallas lane-batched kernel.

    Batch dims are flattened and padded to a multiple of 128 lanes; m, n must
    be small enough that one [m, n, 128] tile fits VMEM (m*n <= ~8192).
    """
    from jax.experimental import pallas as pl

    *batch, m, n = A.shape
    B = int(np.prod(batch)) if batch else 1
    Bp = max(_LANES, ((B + _LANES - 1) // _LANES) * _LANES)
    Af = A.reshape(B, m, n)
    Af = jnp.pad(Af, ((0, Bp - B), (0, 0), (0, 0)))
    Al = Af.transpose(1, 2, 0)                          # [m, n, Bp]

    grid = (Bp // _LANES,)
    q, r = pl.pallas_call(
        partial(_cholqr_kernel, m=m, n=n, eps=eps),
        grid=grid,
        in_specs=[pl.BlockSpec((m, n, _LANES), lambda i: (0, 0, i))],
        out_specs=(pl.BlockSpec((m, n, _LANES), lambda i: (0, 0, i)),
                   pl.BlockSpec((n, n, _LANES), lambda i: (0, 0, i))),
        out_shape=(jax.ShapeDtypeStruct((m, n, Bp), A.dtype),
                   jax.ShapeDtypeStruct((n, n, Bp), A.dtype)),
        interpret=_use_interpret(),
    )(Al)
    Q = q.transpose(2, 0, 1)[:B].reshape(*batch, m, n)
    R = r.transpose(2, 0, 1)[:B].reshape(*batch, n, n)
    return Q, R
