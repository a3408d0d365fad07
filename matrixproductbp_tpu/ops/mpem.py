"""MPEM3 -> MPEM2 conversion: the left-to-right SVD re-grouping sweep.

TPU-native redesign of ``mpem2(::MPEM3)`` (``/root/reference/src/mpems.jl:67-94``):
the BP update produces a 5-leg transfer object ``B[t][m, n, xi, xj, xi']``
(``xi'`` = x_i at t+1); the sweep SVD-regroups ``(xi, xj)`` onto the left bond
and pushes ``xi'`` into the next core, yielding a 4-leg message train with legs
``(xi, xj)`` per time.

Static-shape formulation: input bonds ``Db``; every SVD in the sweep has shape
``[qi*qj*r, Db*qi]`` with rank exactly ``min(., Db*qi)``, so the output train
has uniform bond capacity ``Dmid = qi * Db`` with *no truncation* (the caller
compresses with ``assume='left'`` afterwards, mirroring
``compress!(mpem2(B); is_orthogonal=:left)`` at ``recursive_bp_factor.jl:156``).

Per-step max-abs rescaling accumulates into ``logz`` exactly like the
reference's ``c`` accumulator (``mpems.jl:76-80``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .tensortrain import TensorTrain, _safe_scale, _fit_axis

__all__ = ["mpem3_to_mpem2", "mpem3_to_mpem2_periodic", "evaluate_mpem3",
           "evaluate_mpem3_periodic"]


def mpem3_to_mpem2(B: jax.Array, logz: jax.Array) -> TensorTrain:
    """B: f[T1, Db, Db, qi, qj, qi] -> left-orthogonal TensorTrain with
    phys=(qi, qj) and bond capacity qi*Db.

    The represented tensor satisfies, for any trajectory x=(xi, xj)_t:
      TT(x_0..x_T) = sum-free product of B[t][:, :, xi_t, xj_t, xi_{t+1}]
    with the last core's xi' leg taken at index 0 (reference asserts all its
    xi' slices are equal, ``mpems.jl:35``).
    """
    T1, Db, _, qi, qj, _ = B.shape
    Dmid = qi * Db
    dtype = B.dtype

    def svd_step(M, lg):
        # M: [qi*qj*r, Db*qi]
        m = _safe_scale(jnp.max(jnp.abs(M)))
        M = M / m
        lg = lg - jnp.log(m)
        U, S, Vt = jnp.linalg.svd(M, full_matrices=False)  # k = Db*qi = Dmid
        return U, S, Vt, lg

    # ---- t = 0: rows (xi, xj, m=Db), cols (n=Db, xi') --------------------
    M0 = B[0].transpose(2, 3, 0, 1, 4).reshape(qi * qj * Db, Db * qi)
    U, S, Vt, lg = svd_step(M0, logz)
    C0 = U.reshape(qi, qj, Db, Dmid).transpose(2, 3, 0, 1).reshape(Db, Dmid, qi * qj)
    carry0 = (S[:, None] * Vt).reshape(Dmid, Db, qi)

    # ---- t = 1 .. T1-2 ----------------------------------------------------
    def step(carry, Bt):
        C, lg = carry  # C: [Dmid, Db, qi]
        A = jnp.einsum("kli,lnijr->knijr", C, Bt)  # [Dmid, Db, qi, qj, qi]
        M = A.transpose(2, 3, 0, 1, 4).reshape(qi * qj * Dmid, Db * qi)
        U, S, Vt, lg = svd_step(M, lg)
        Ct = U.reshape(qi, qj, Dmid, Dmid).transpose(2, 3, 0, 1) \
              .reshape(Dmid, Dmid, qi * qj)
        Cnew = (S[:, None] * Vt).reshape(Dmid, Db, qi)
        return (Cnew, lg), Ct

    (C, lg), mids = jax.lax.scan(step, (carry0, lg), B[1:-1])

    # ---- t = T1-1: absorb carry, drop the (uniform) xi' leg at index 0 ----
    A = jnp.einsum("kli,lnijr->knijr", C, B[-1])  # [Dmid, Db, qi, qj, qi]
    Clast = A[..., 0].reshape(Dmid, Db, qi * qj)

    cores = jnp.concatenate(
        [
            _fit_axis(C0, 0, Dmid)[None],
            mids,
            _fit_axis(Clast, 1, Dmid)[None],
        ],
        axis=0,
    )
    return TensorTrain(cores, lg, (qi, qj))


def mpem3_to_mpem2_periodic(B: jax.Array, logz: jax.Array) -> TensorTrain:
    """Periodic variant (``mpem2(::PeriodicMPEM3)``, ``mpems.jl:124-155``):
    the sweep runs over *all* T1 cores and the final (lambda * Vt) carry folds
    into core 0, diagonal in its x_i leg."""
    T1, Db, _, qi, qj, _ = B.shape
    Dmid = qi * Db
    dtype = B.dtype

    def svd_step(M, lg):
        m = _safe_scale(jnp.max(jnp.abs(M)))
        M = M / m
        lg = lg - jnp.log(m)
        U, S, Vt = jnp.linalg.svd(M, full_matrices=False)
        return U, S, Vt, lg

    M0 = B[0].transpose(2, 3, 0, 1, 4).reshape(qi * qj * Db, Db * qi)
    U, S, Vt, lg = svd_step(M0, logz)
    C0 = U.reshape(qi, qj, Db, Dmid).transpose(2, 3, 0, 1)   # [Db, Dmid, qi, qj]
    carry0 = (S[:, None] * Vt).reshape(Dmid, Db, qi)

    def step(carry, Bt):
        C, lg = carry
        A = jnp.einsum("kli,lnijr->knijr", C, Bt)
        M = A.transpose(2, 3, 0, 1, 4).reshape(qi * qj * Dmid, Db * qi)
        U, S, Vt, lg = svd_step(M, lg)
        Ct = U.reshape(qi, qj, Dmid, Dmid).transpose(2, 3, 0, 1) \
              .reshape(Dmid, Dmid, qi * qj)
        Cnew = (S[:, None] * Vt).reshape(Dmid, Db, qi)
        return (Cnew, lg), Ct

    (C, lg), mids = jax.lax.scan(step, (carry0, lg), B[1:])
    # wrap: C0'[m, n, xi, xj] = sum_l C[m, l, xi] C0[l, n, xi, xj]
    C0w = jnp.einsum("mli,lnij->mnij", C, C0).reshape(Dmid, Dmid, qi * qj)
    cores = jnp.concatenate([C0w[None], mids], axis=0)
    return TensorTrain(cores, lg, (qi, qj), True)


def evaluate_mpem3(B: jax.Array, logz: jax.Array, xi: jax.Array,
                   xj: jax.Array) -> jax.Array:
    """Reference ``evaluate(::MPEM3)`` (``mpems.jl:56-64``): product of
    ``B[t][:, :, xi_t, xj_t, xi_{t+1}]`` with the last xi' index 0."""
    T1 = B.shape[0]
    xnext = jnp.concatenate([xi[1:], jnp.zeros((1,), xi.dtype)])
    v = jnp.zeros((B.shape[1],), B.dtype).at[0].set(1.0)
    for t in range(T1):
        v = v @ B[t][:, :, xi[t], xj[t], xnext[t]]
    return v[0] * jnp.exp(-logz)


def evaluate_mpem3_periodic(B: jax.Array, logz: jax.Array, xi: jax.Array,
                            xj: jax.Array) -> jax.Array:
    """Periodic evaluate: xi' wraps to xi[0] and the product closes with a
    trace (``mpems.jl:113-122``)."""
    T1 = B.shape[0]
    xnext = jnp.concatenate([xi[1:], xi[:1]])
    M = jnp.eye(B.shape[1], dtype=B.dtype)
    for t in range(T1):
        M = M @ B[t][:, :, xi[t], xj[t], xnext[t]]
    return jnp.trace(M) * jnp.exp(-logz)
