"""Exhaustive-enumeration oracle for tiny instances.

TPU-native counterpart of ``/root/reference/src/exact.jl``: enumerate every
trajectory of the reweighted dynamics, accumulate log-factors, normalize.
Trajectories are decoded from mixed-radix integers in one vectorized pass and
the per-step transition probabilities come from the same dense factor tables
(``factors.transition_probs``) the BP sweep uses, so this oracle shares no code
path with BP — exactly the cross-validation structure of the reference tests
(SURVEY.md §4).
"""
from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

from .bp import MPBP
from .factors import transition_probs

__all__ = [
    "exact_prob", "site_marginals", "exact_marginals",
    "exact_pair_marginals", "exact_alternate_marginals",
    "exact_autocorrelations", "exact_autocovariances",
    "exact_marginal_expectations",
]


def _decode_all(Q: int, q: int, N: int, T1: int) -> np.ndarray:
    """X[Q, N, T1]: trajectory of config-index x; time is the fast digit
    (matching ``_int_to_matrix``'s (T+1, N) reshape, ``exact.jl:1-3``)."""
    codes = np.arange(Q, dtype=np.int64)
    digits = (codes[:, None] // (q ** np.arange(N * T1, dtype=np.int64))) % q
    return digits.reshape(Q, N, T1).astype(np.int32)


def exact_prob(bp: MPBP):
    """(p[Q], Z): exact trajectory distribution and partition function
    (``exact_prob``, ``exact.jl:5-41``)."""
    g = bp.graph
    N, T1, q = bp.N, bp.T + 1, bp.q
    if N * (T1 - 1) > 16:
        warnings.warn(f"T*N={N * (T1 - 1)}: exhaustive enumeration will be slow")
    Q = q ** (N * T1)
    X = _decode_all(Q, q, N, T1)                      # [Q, N, T1]
    phi = np.asarray(bp.phi)
    psi = np.asarray(bp.psi)

    import jax
    nbr = np.minimum(g.nbr, g.N - 1)
    mask = jnp.asarray(g.in_mask)

    def pfun(t, xn, xt):
        tb = bp.tables.at_time(t)
        return jax.jit(jax.vmap(
            lambda a, b: transition_probs(tb, mask, a, b)))(xn, xt)

    # hard (zero-probability) observations legitimately produce log(0) = -inf
    # trajectory weights; silence the divide warning deliberately
    # (semantics asserted in tests/test_sampling_and_observations.py)
    with np.errstate(divide="ignore"):
        logp = np.log(phi[np.arange(N)[None, :], 0, X[:, :, 0]]).sum(axis=1)
        for t in range(1, T1):
            logp += np.log(
                phi[np.arange(N)[None, :], t, X[:, :, t]]).sum(axis=1)

        for t in range(T1 - 1):
            xt = X[:, :, t]
            xn = xt[:, nbr]                           # [Q, N, K]
            p = np.asarray(
                pfun(t, jnp.asarray(xn), jnp.asarray(xt)))  # [Q, N, q]
            logp += np.log(
                p[np.arange(Q)[:, None], np.arange(N)[None, :], X[:, :, t + 1]]
            ).sum(axis=1)
        if bp.periodic:
            # time-periodic wrap: transition from t = T back to t = 0 with the
            # last factor w[i][end] (reference exact.jl:24-26)
            xt = X[:, :, T1 - 1]
            xn = xt[:, nbr]
            p = np.asarray(pfun(T1 - 1, jnp.asarray(xn), jnp.asarray(xt)))
            logp += np.log(
                p[np.arange(Q)[:, None], np.arange(N)[None, :], X[:, :, 0]]
            ).sum(axis=1)

        src, dst = g.edge_src, g.edge_dst
        for t in range(T1):
            logp += 0.5 * np.log(
                psi[np.arange(g.E)[None, :], t, X[:, src, t], X[:, dst, t]]
            ).sum(axis=1)

    m = logp.max()
    logZ = m + np.log(np.exp(logp - m).sum())
    p = np.exp(logp - logZ)
    return p, np.exp(logZ)


def site_marginals(bp: MPBP, p=None):
    """Full per-site trajectory marginals: list of [q]*T1 tensors
    (``site_marginals``, ``exact.jl:43-58``)."""
    if p is None:
        p, _ = exact_prob(bp)
    N, T1, q = bp.N, bp.T + 1, bp.q
    X = _decode_all(len(p), q, N, T1)
    out = []
    for i in range(N):
        m = np.zeros((q,) * T1)
        np.add.at(m, tuple(X[:, i, t] for t in range(T1)), p)
        out.append(m)
    return out


def exact_marginals(bp: MPBP, p=None) -> np.ndarray:
    """[N, T1, q] single-site single-time marginals (``exact.jl:60-74``)."""
    if p is None:
        p, _ = exact_prob(bp)
    N, T1, q = bp.N, bp.T + 1, bp.q
    X = _decode_all(len(p), q, N, T1)
    out = np.zeros((N, T1, q))
    for i in range(N):
        for t in range(T1):
            np.add.at(out[i, t], X[:, i, t], p)
    return out


def exact_pair_marginals(bp: MPBP, p=None) -> np.ndarray:
    """[E, T1, q, q] same-time pair marginals per directed edge
    (``exact_pair_marginals``, ``exact.jl:102-119``)."""
    if p is None:
        p, _ = exact_prob(bp)
    g = bp.graph
    N, T1, q = bp.N, bp.T + 1, bp.q
    X = _decode_all(len(p), q, N, T1)
    out = np.zeros((g.E, T1, q, q))
    for e in range(g.E):
        i, j = int(g.edge_src[e]), int(g.edge_dst[e])
        for t in range(T1):
            np.add.at(out[e, t], (X[:, i, t], X[:, j, t]), p)
    return out


def exact_alternate_marginals(bp: MPBP, p=None) -> np.ndarray:
    """[E, T1-1, q, q]: p(x_i^t, x_j^{t+1}) (``exact.jl:132-148``)."""
    if p is None:
        p, _ = exact_prob(bp)
    g = bp.graph
    N, T1, q = bp.N, bp.T + 1, bp.q
    X = _decode_all(len(p), q, N, T1)
    out = np.zeros((g.E, T1 - 1, q, q))
    for e in range(g.E):
        i, j = int(g.edge_src[e]), int(g.edge_dst[e])
        for t in range(T1 - 1):
            np.add.at(out[e, t], (X[:, i, t], X[:, j, t + 1]), p)
    return out


def exact_autocorrelations(bp: MPBP, values=None, p=None) -> np.ndarray:
    """[N, T1, T1] <f(x^t) f(x^u)> for t < u (``exact.jl:161-186``)."""
    if p is None:
        p, _ = exact_prob(bp)
    N, T1, q = bp.N, bp.T + 1, bp.q
    v = np.arange(q, dtype=float) if values is None else np.asarray(values)
    X = _decode_all(len(p), q, N, T1)
    out = np.zeros((N, T1, T1))
    for i in range(N):
        fv = v[X[:, i, :]]                            # [Q, T1]
        for t in range(T1):
            for u in range(t + 1, T1):
                out[i, t, u] = np.sum(fv[:, t] * fv[:, u] * p)
    return out


def exact_marginal_expectations(bp: MPBP, values=None, p=None) -> np.ndarray:
    m = exact_marginals(bp, p)
    q = bp.q
    v = np.arange(q, dtype=float) if values is None else np.asarray(values)
    return m @ v


def exact_autocovariances(bp: MPBP, values=None, p=None) -> np.ndarray:
    if p is None:
        p, _ = exact_prob(bp)
    r = exact_autocorrelations(bp, values, p)
    mu = exact_marginal_expectations(bp, values, p)
    c = r - mu[:, :, None] * mu[:, None, :]
    T1 = mu.shape[1]
    mask = np.triu(np.ones((T1, T1), bool), k=1)
    return c * mask[None]


def exact_pair_marginal_expectations(bp: MPBP, values=None, p=None) -> np.ndarray:
    """<f(x_i^t) f(x_j^t)> per directed edge (``exact.jl:121-130``)."""
    m = exact_pair_marginals(bp, p)
    q = bp.q
    v = np.arange(q, dtype=float) if values is None else np.asarray(values)
    return np.einsum("etab,a,b->et", m, v, v)


def exact_alternate_marginal_expectations(bp: MPBP, values=None,
                                          p=None) -> np.ndarray:
    """<f(x_i^t) f(x_j^{t+1})> per directed edge (``exact.jl:150-158``)."""
    m = exact_alternate_marginals(bp, p)
    q = bp.q
    v = np.arange(q, dtype=float) if values is None else np.asarray(values)
    return np.einsum("etab,a,b->et", m, v, v)
