"""Stationary / infinite-time mode: uniform (single-core) edge messages.

TPU-native counterpart of ``/root/reference/src/stationary.jl``: in the
T -> infinity limit every message is an *infinite uniform* tensor train — one
repeated core ``A[D, D, P]`` — and all train algebra reduces to spectral
properties of the D x D transfer matrix ``E = sum_x A[x]``:

* normalization per time step = leading eigenvalue of E (power iteration),
* marginals from the leading left/right eigenvectors,
* bond truncation in the canonical (Vidal) gauge: Gram fixed points of the
  doubled transfer, Cholesky, one SVD — the single-site equivalent of the
  reference's ``TruncVUMPS`` (TensorTrains.jl VUMPS truncator).

The BP update mirrors the reference stationary path exactly: lift/merge with
*no* compression inside the cavity fold (``stationary.jl:157`` leaves it
commented out), a single-SVD MPEM3->MPEM2 rotation (``stationary.jl:30-41``),
then VUMPS truncation + normalization of the outgoing message; damping is not
supported (``stationary.jl:174-182``).

Node updates run as host-level loops over the (small) graphs this mode is used
for — the per-node tensors are single cores, so there is no batch dimension
worth sharding; each distinct degree compiles once.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .graph import Graph
from .factors import RecursiveFactorTables
from .ops.truncation import SVDTrunc

__all__ = ["UniformMessage", "TruncVUMPS", "flat_uniform", "rand_uniform",
           "uniform_lognorm", "uniform_normalize", "uniform_marginals",
           "uniform_twovar_marginals", "uniform_dot", "truncate_vumps",
           "truncate_vumps_variational",
           "MPBPStationary", "mpbp_stationary",
           "mpbp_stationary_infinite_graph",
           "mpbp_stationary_infinite_bipartite_graph",
           "iterate_stationary", "beliefs_stationary",
           "bethe_free_energy_stationary", "pair_beliefs_stationary"]


@dataclasses.dataclass(frozen=True)
class TruncVUMPS(SVDTrunc):
    """Bond cap for uniform trains (reference default ``TruncVUMPS(4)``,
    ``stationary.jl:258``).

    ``refine = 0``: canonical-gauge SVD crop (quasi-optimal).
    ``refine > 0``: that crop is then improved by ``refine`` rounds of the
    *variational* uniform-MPS fit (:func:`truncate_vumps_variational`) — the
    ALS fixed point of the mixed transfer environments, the single-site
    analogue of the reference's TensorTrains.jl VUMPS truncator."""
    d: int
    power_iters: int = 100
    refine: int = 0

    @property
    def max_bond(self):
        return self.d


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class UniformMessage:
    """One repeated core; value per site carries ``exp(-logz)``."""
    core: jax.Array       # [D, D, P]
    logz: jax.Array       # []
    phys: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    def tree_flatten(self):
        return (self.core, self.logz), self.phys

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)

    @property
    def D(self):
        return self.core.shape[0]

    @property
    def P(self):
        return self.core.shape[2]


def flat_uniform(D: int, phys: Sequence[int], dtype=jnp.float64) -> UniformMessage:
    P = int(np.prod(phys)) if phys else 1
    core = jnp.zeros((D, D, P), dtype).at[0, 0, :].set(1.0)
    return UniformMessage(core, jnp.zeros((), dtype), tuple(phys))


def rand_uniform(key, D: int, phys: Sequence[int], dtype=jnp.float64) -> UniformMessage:
    P = int(np.prod(phys)) if phys else 1
    core = jax.random.uniform(key, (D, D, P), dtype)
    return UniformMessage(core, jnp.zeros((), dtype), tuple(phys))


# ---------------------------------------------------------------------------
# spectral helpers
# ---------------------------------------------------------------------------

def _leading_eig(E: jax.Array, iters: int = 200):
    """(lambda, l, r) of a (nonnegative-ish) matrix by power iteration."""
    D = E.shape[0]

    def step(carry, _):
        l, r = carry
        r2 = E @ r
        r2 = r2 / jnp.maximum(jnp.linalg.norm(r2), 1e-300)
        l2 = E.T @ l
        l2 = l2 / jnp.maximum(jnp.linalg.norm(l2), 1e-300)
        return (l2, r2), None

    v0 = jnp.ones((D,), E.dtype) / jnp.sqrt(D)
    (l, r), _ = jax.lax.scan(step, (v0, v0), None, length=iters)
    lam = (l @ E @ r) / (l @ r)
    return lam, l, r


def _gram_fixed_point(core: jax.Array, side: str, iters: int = 200):
    """Fixed point of rho -> sum_x A[x]^T rho A[x] (left) or
    A[x] rho A[x]^T (right); PSD-symmetric."""
    D = core.shape[0]

    def step(rho, _):
        if side == "left":
            r2 = jnp.einsum("mnp,mk,klp->nl", core, rho, core)
        else:
            r2 = jnp.einsum("mnp,nk,lkp->ml", core, rho, core)
        r2 = 0.5 * (r2 + r2.T)
        r2 = r2 / jnp.maximum(jnp.max(jnp.abs(r2)), 1e-300)
        return r2, None

    rho0 = jnp.eye(D, dtype=core.dtype)
    rho, _ = jax.lax.scan(step, rho0, None, length=iters)
    return rho


def uniform_lognorm(u: UniformMessage):
    """log of the per-time-step normalization (leading transfer eigenvalue)."""
    E = u.core.sum(axis=2)
    lam, _, _ = _leading_eig(E)
    return jnp.log(jnp.abs(lam)) - u.logz, jnp.sign(lam)


def uniform_normalize(u: UniformMessage):
    """Scale so the per-site normalization is 1; return (u', log-norm)."""
    lg, sg = uniform_lognorm(u)
    core = u.core * sg * jnp.exp(-(lg + u.logz))
    return UniformMessage(core, jnp.zeros((), u.core.dtype), u.phys), lg


def uniform_normalize_eachmatrix(u: UniformMessage) -> UniformMessage:
    m = jnp.maximum(jnp.max(jnp.abs(u.core)), 1e-300)
    return UniformMessage(u.core / m, u.logz - jnp.log(m), u.phys)


def uniform_marginals(u: UniformMessage) -> jax.Array:
    """Single-site marginal [P] from the leading eigenvectors."""
    E = u.core.sum(axis=2)
    _, l, r = _leading_eig(E)
    p = jnp.einsum("m,mnp,n->p", l, u.core, r)
    return p / jnp.sum(p)


def uniform_twovar_marginals(u: UniformMessage, maxdist: int) -> jax.Array:
    """p_delta(x, y) for time separations delta = 1..maxdist, [maxdist, P, P]."""
    E = u.core.sum(axis=2)
    lam, l, r = _leading_eig(E)
    En = E / lam

    def step(M, _):
        # p[x, y] = l A[x] M A[y] r
        p = jnp.einsum("m,mnx,nk,kjy,j->xy", l, u.core, M, u.core, r)
        return En @ M, p / jnp.sum(p)

    _, ps = jax.lax.scan(step, jnp.eye(u.D, dtype=u.core.dtype), None,
                         length=maxdist)
    return ps


def uniform_dot(a: UniformMessage, b: UniformMessage) -> jax.Array:
    """Cosine overlap per site: lambda(mixed) / sqrt(lambda(aa) lambda(bb)).
    Equals 1 iff the represented functions coincide (used by the
    ``CB_BPVUMPS`` message-convergence check, ``stationary.jl:289``)."""
    def lam2(x, y):
        E = jnp.einsum("mnp,klp->mknl", x, y).reshape(
            x.shape[0] * y.shape[0], x.shape[1] * y.shape[1])
        lam, _, _ = _leading_eig(E)
        return lam

    mixed = lam2(a.core, b.core)
    return mixed / jnp.sqrt(jnp.abs(lam2(a.core, a.core) *
                                    lam2(b.core, b.core)))


def truncate_vumps(u: UniformMessage, d: int, iters: int = 200) -> UniformMessage:
    """Canonical-gauge bond truncation to ``d`` (Vidal/Orus scheme):
    Gram fixed points -> Cholesky -> SVD -> oblique projectors."""
    D = u.D
    if D <= d:
        return u
    eps = 1e-12
    rho_l = _gram_fixed_point(u.core, "left", iters)
    rho_r = _gram_fixed_point(u.core, "right", iters)
    I = jnp.eye(D, dtype=u.core.dtype)
    L = jnp.linalg.cholesky(rho_l + eps * I).T     # rho_l = L^T L
    R = jnp.linalg.cholesky(rho_r + eps * I)       # rho_r = R R^T
    U, S, Vt = jnp.linalg.svd(L @ R)
    Sd = S[:d]
    inv_sqrt = 1.0 / jnp.sqrt(jnp.maximum(Sd, eps))
    P_right = inv_sqrt[:, None] * (U[:, :d].T @ L)          # [d, D]
    P_left = (R @ Vt[:d].T) * inv_sqrt[None, :]             # [D, d]
    core = jnp.einsum("am,mnp,nb->abp", P_right, u.core, P_left)
    return UniformMessage(core, u.logz, u.phys)


def truncate_vumps_variational(u: UniformMessage, d: int, iters: int = 100,
                               refine: int = 8) -> UniformMessage:
    """Variational bond truncation of a uniform MPS (reference ``TruncVUMPS``
    semantics, ``stationary.jl:258`` / TensorTrains.jl VUMPS).

    Maximizes the per-site overlap ``lam_mix / sqrt(lam_BB * lam_AA)`` over
    bond-``d`` uniform cores B by alternating-least-squares on the
    stationarity condition of the leading mixed-transfer eigenvalue:

        l_B B r_B  ∝  L_mix A R_mix

    where (L_mix, R_mix) are the leading left/right eigenvectors of the mixed
    transfer ``T[(a,m),(b,n)] = sum_p B[a,b,p] A[m,n,p]`` and (l_B, r_B) the
    Gram fixed points of B itself.  Initialized from the canonical-gauge SVD
    crop (:func:`truncate_vumps`), which it can only improve (monotone in
    practice; the gate in ``tests/test_stationary.py`` asserts it)."""
    D = u.D
    if D <= d:
        return u
    A = u.core
    P = A.shape[2]
    dtype = A.dtype
    B0 = truncate_vumps(u, d, iters).core
    eps = 1e-12
    I = jnp.eye(d, dtype=dtype)

    def step(B, _):
        T = jnp.einsum("abp,mnp->ambn", B, A).reshape(d * D, d * D)
        _, lm, rm = _leading_eig(T, iters)
        L = lm.reshape(d, D)
        R = rm.reshape(d, D)
        G = jnp.einsum("am,mnp,bn->abp", L, A, R)
        lB = _gram_fixed_point(B, "left", iters)
        rB = _gram_fixed_point(B, "right", iters)
        # solve l_B X r_B = G (PSD: two Cholesky solves)
        cl = jax.scipy.linalg.cho_factor(lB + eps * I)
        cr = jax.scipy.linalg.cho_factor(rB + eps * I)
        X = jax.scipy.linalg.cho_solve(cl, G.reshape(d, d * P))
        X = X.reshape(d, d, P)
        X = jax.scipy.linalg.cho_solve(
            cr, X.transpose(1, 0, 2).reshape(d, d * P)
        ).reshape(d, d, P).transpose(1, 0, 2)
        m = jnp.maximum(jnp.max(jnp.abs(X)), 1e-300)
        return X / m, None

    B, _ = jax.lax.scan(step, B0, None, length=refine)
    # keep the refinement only where it genuinely helps: ALS on a defective
    # environment can stall; fall back to the crop on non-finite output or
    # a worse overlap
    cand = UniformMessage(B, u.logz, u.phys)
    crop = UniformMessage(B0, u.logz, u.phys)
    ov_cand = uniform_dot(cand, u)
    ov_crop = uniform_dot(crop, u)
    ok = jnp.all(jnp.isfinite(B)) & (jnp.abs(1.0 - ov_cand)
                                     <= jnp.abs(1.0 - ov_crop))
    core = jnp.where(ok, B, B0)
    return UniformMessage(core, u.logz, u.phys)


def _truncate(u: UniformMessage, d: int, trunc: "TruncVUMPS") -> UniformMessage:
    """Dispatch: variational fit when ``trunc.refine > 0``, else the crop."""
    if trunc.refine > 0:
        return truncate_vumps_variational(u, d, trunc.power_iters,
                                          trunc.refine)
    return truncate_vumps(u, d, trunc.power_iters)


# ---------------------------------------------------------------------------
# BP pieces (mirror stationary.jl recursive path)
# ---------------------------------------------------------------------------

def _lift(mu: UniformMessage, pxy_k, psi_k, Y, q) -> UniformMessage:
    """B_k[m,n,y,xi] = sum_xk Pxy[y,xk,xi] psi[xi,xk] mu[m,n,xk,xi]
    (``stationary.jl:138-144``)."""
    A = mu.core.reshape(mu.D, mu.D, q, q)
    B = jnp.einsum("yci,ic,mnci->mnyi", pxy_k, psi_k, A)
    return UniformMessage(B.reshape(mu.D, mu.D, Y * q), mu.logz, (Y, q))


def _merge_inf(u1: UniformMessage, u2: UniformMessage, pyy, Y, q) -> UniformMessage:
    """Kron merge, *no* truncation (``stationary.jl:147-161``)."""
    D1, D2 = u1.D, u2.D
    a = u1.core.reshape(D1, D1, Y, q)
    b = u2.core.reshape(D2, D2, Y, q)
    tmp = jnp.einsum("yabx,mnax->mnybx", pyy, a)
    M = jnp.einsum("mnybx,uvbx->munvyx", tmp, b)
    out = UniformMessage(M.reshape(D1 * D2, D1 * D2, Y * q),
                         u1.logz + u2.logz, (Y, q))
    return uniform_normalize_eachmatrix(out)


def _f_bp_partial_inf(C: UniformMessage, Wtab, phi_i, qj, q, Y) -> jax.Array:
    """B[m,n,xi,xj,xp] (``_f_bp_partial`` stationary, ``stationary.jl:122-132``)."""
    A = C.core.reshape(C.D, C.D, Y, q)
    return jnp.einsum("pijy,mnyi,i->mnijp", Wtab, A, phi_i)


def _mpem2_inf(B: jax.Array, logz, qj) -> UniformMessage:
    """Single-SVD rotation of the 5-leg uniform transfer into a 4-leg message
    (``mpem2(::InfiniteUniformMPEM3)``, ``stationary.jl:30-41``)."""
    Db = B.shape[0]
    qi = B.shape[2]
    m = jnp.max(jnp.abs(B))
    m = jnp.where(jnp.isfinite(m) & (m > 0), m, 1.0)
    B = B / m
    logz = logz - jnp.log(m)
    M = B.transpose(2, 3, 0, 1, 4).reshape(qi * qj * Db, Db * qi)
    U, S, Vt = jnp.linalg.svd(M, full_matrices=False)
    k = S.shape[0]                       # = min(qi*qj*Db, qi*Db) = qi*Db
    C = U.reshape(qi, qj, Db, k)         # [xi, xj, m, k]
    V3 = Vt.reshape(k, Db, qi)           # [k, n, xi']
    D = jnp.einsum("m,mli,ijln->mnij", S, V3, C)   # [k, k, qi, qj]
    return UniformMessage(D.reshape(k, k, qi * qj), logz, (qi, qj))


@dataclasses.dataclass
class MPBPStationary:
    """Stationary BP state: per-edge uniform messages (host lists)."""
    graph: Graph
    tables: RecursiveFactorTables
    phi: np.ndarray               # [N, q]
    psi: np.ndarray               # [E, q, q]
    msgs: list                    # [E] UniformMessage (qk, qi)
    beliefs: list                 # [N] UniformMessage (q,)
    f: np.ndarray                 # [N]

    @property
    def q(self):
        return self.phi.shape[1]


def mpbp_stationary(graph: Graph, tables: RecursiveFactorTables, D: int = 1,
                    phi=None, psi=None, dtype=jnp.float64) -> MPBPStationary:
    """Reference ``mpbp_stationary`` (``stationary.jl:186-197``)."""
    q = tables.q
    phi = np.ones((graph.N, q)) if phi is None else np.asarray(phi, float)
    psi = np.ones((graph.E, q, q)) if psi is None else np.asarray(psi, float)
    msgs = []
    for e in range(graph.E):
        m, _ = uniform_normalize(flat_uniform(D, (q, q), dtype))
        msgs.append(m)
    bels = [flat_uniform(D, (q,), dtype) for _ in range(graph.N)]
    return MPBPStationary(graph, tables, phi, psi, msgs, bels,
                          np.zeros(graph.N))


def mpbp_stationary_infinite_graph(k: int, tables, phi=None, psi=None,
                                   D: int = 1) -> MPBPStationary:
    from .infinite import infinite_regular_graph
    return mpbp_stationary(infinite_regular_graph(k), tables, D=D, phi=phi,
                           psi=psi)


def mpbp_stationary_infinite_bipartite_graph(k, tables, phi=None, psi=None,
                                             D: int = 1) -> MPBPStationary:
    from .infinite import infinite_bipartite_graph
    return mpbp_stationary(infinite_bipartite_graph(*k), tables, D=D, phi=phi,
                           psi=psi)


from functools import partial


@partial(jax.jit, static_argnames=("d", "q", "Y", "trunc"))
def _node_update_jit(msgs_in, psi_out, Py_i, Pyp_i, Pxy_i, Py0_i, Pyy_i,
                     phi_i, d: int, q: int, Y: int, trunc: "TruncVUMPS"):
    """Pure jitted node update: compiled once per distinct degree.

    msgs_in: tuple of d UniformMessages; psi_out: [d, q, q].
    Returns (tuple of d out messages, belief, f_i)."""
    dtype = phi_i.dtype

    def pyy_at(d1):
        return Pyy_i[min(d1, Pyy_i.shape[0] - 1)]

    B = [_lift(msgs_in[s], Pxy_i[s], psi_out[s], Y, q) for s in range(d)]

    init = UniformMessage(
        jnp.zeros((1, 1, Y * q), dtype).at[0, 0, :].set(Py0_i.reshape(-1)),
        jnp.zeros((), dtype), (Y, q))

    # Cavity-fold bond cap: the reference leaves the stationary fold
    # uncompressed (stationary.jl:157), which is exponential in the degree;
    # we re-truncate in canonical gauge once the bond exceeds 2*d_target,
    # keeping cost polynomial while staying within truncation error.
    cap = 2 * trunc.d

    def fold(a, b, pyy_t):
        out = _merge_inf(a, b, pyy_t, Y, q)
        if out.D > cap:
            out = _truncate(out, cap, trunc)
        return out

    # prefix / suffix folds
    L = [init]
    for s in range(d):
        L.append(fold(L[-1], B[s], pyy_at(s)))
    R = [None] * (d + 1)
    R[d] = init
    for s in range(d - 1, -1, -1):
        R[s] = fold(B[s], R[s + 1], pyy_at(1))
    full = L[d]

    outs = []
    logzs = []
    for s in range(d):
        if d == 1:
            C = init
        elif s == 0:
            C = R[1]
        elif s == d - 1:
            C = L[d - 1]
        else:
            C = fold(L[s], R[s + 1], pyy_at(s))
        B5 = _f_bp_partial_inf(C, Pyp_i[s], phi_i, q, q, Y)
        mu = _mpem2_inf(B5, C.logz, q)
        mu = _truncate(mu, trunc.d, trunc)
        mu = uniform_normalize_eachmatrix(mu)
        mu, logz_k = uniform_normalize(mu)
        outs.append(mu)
        logzs.append(logz_k)

    Wb = Py_i[:, :, None, :]                         # [q, q, 1, Y]
    B5 = _f_bp_partial_inf(full, Wb, phi_i, 1, q, Y)
    bel = _mpem2_inf(B5, full.logz, 1)
    bel = _truncate(bel, trunc.d, trunc)
    bel = UniformMessage(bel.core.reshape(bel.D, bel.D, q, 1).sum(axis=3),
                         bel.logz, (q,))
    bel, logz_i = uniform_normalize(bel)
    f_i = (d / 2.0 - 1.0) * logz_i - 0.5 * sum(logzs)
    return tuple(outs), bel, f_i


def _dense_pyy_from_off(off: int, Y: int, q: int) -> np.ndarray:
    """Densify the banded sum-type merge ``prob_yy(y, y1, y2) = (y ==
    y1 + y2 - off)`` (``glauber_bp.jl:44,80,170``) for the stationary path,
    whose graphs are small enough that the O(Y^3) table is immaterial."""
    y = np.arange(Y)
    p = (y[:, None, None] == y[None, :, None] + y[None, None, :] - off)
    return np.broadcast_to(p.astype(float)[None, :, :, :, None],
                           (1, Y, Y, Y, q)).copy()


def _stationary_node_update(bp: MPBPStationary, i: int, trunc: TruncVUMPS):
    """onebpiter! for the stationary mode (same structure as the finite-T
    node update; single cores, no compression in the cavity fold)."""
    g = bp.graph
    tb = bp.tables
    q = bp.q
    Y = tb.Y
    d = int(g.degree[i])
    e_ins = [int(g.in_edges[i, s]) for s in range(d)]
    e_outs = [int(g.rev_edge[e]) for e in e_ins]
    msgs_in = tuple(bp.msgs[e] for e in e_ins)
    psi_out = jnp.asarray(np.stack([bp.psi[e] for e in e_outs])) if d else \
        jnp.zeros((0, q, q))
    if tb.yy_off is not None:
        Pyy_i = jnp.asarray(_dense_pyy_from_off(tb.yy_off, Y, q))
    else:
        Pyy_i = tb.Pyy[i % tb.Pyy.shape[0]]
    outs, bel, f_i = _node_update_jit(
        msgs_in, psi_out,
        tb.Py[i % tb.Py.shape[0]], tb.Pyp[i % tb.Pyp.shape[0]],
        tb.Pxy[i % tb.Pxy.shape[0]], tb.Py0[i % tb.Py0.shape[0]],
        Pyy_i,
        jnp.asarray(bp.phi[i]), d, q, Y, trunc)
    for s, e in enumerate(e_outs):
        bp.msgs[e] = outs[s]
    bp.beliefs[i] = bel
    bp.f[i] = float(f_i)


def iterate_stationary(bp: MPBPStationary, maxiter: int = 50,
                       trunc: TruncVUMPS | None = None, tol: float = 1e-10):
    """Sweeps with marginal-Delta and message-overlap convergence
    (``CB_BPVUMPS``, ``stationary.jl:260-295``)."""
    trunc = TruncVUMPS(4) if trunc is None else trunc
    dot_jit = jax.jit(uniform_dot)
    m_old = beliefs_stationary(bp)
    deltas, overlaps = [], []
    for it in range(maxiter):
        old_msgs = list(bp.msgs)
        for i in range(bp.graph.N):
            _stationary_node_update(bp, i, trunc)
        m_new = beliefs_stationary(bp)
        delta = float(np.max(np.abs(m_new - m_old)))
        eps = max(float(jnp.abs(1.0 - dot_jit(a, b)))
                  if a.D == b.D else 1.0
                  for a, b in zip(bp.msgs, old_msgs))
        deltas.append(delta)
        overlaps.append(eps)
        if delta < tol:
            return bp, it + 1, deltas, overlaps
        m_old = m_new
    return bp, maxiter, deltas, overlaps


_marginals_jit = jax.jit(uniform_marginals)


def beliefs_stationary(bp: MPBPStationary) -> np.ndarray:
    return np.stack([np.asarray(_marginals_jit(b)) for b in bp.beliefs])


def bethe_free_energy_stationary(bp: MPBPStationary) -> float:
    """Free energy density per time step (``bethe_free_energy``)."""
    return float(np.sum(bp.f))


def pair_beliefs_stationary(bp: MPBPStationary):
    """Per-edge stationary pair marginals [E, q, q]
    (``pair_belief`` stationary, ``stationary.jl:108-117``)."""
    g = bp.graph
    q = bp.q
    out = np.zeros((g.E, q, q))
    for e in range(g.E):
        a = bp.msgs[e]
        b = bp.msgs[int(g.rev_edge[e])]
        A = a.core.reshape(a.D, a.D, q, q)
        Bc = b.core.reshape(b.D, b.D, q, q)
        M = jnp.einsum("abij,cdji,ij->acbdij", A, Bc,
                       jnp.asarray(bp.psi[e]))
        u = UniformMessage(M.reshape(a.D * b.D, a.D * b.D, q * q),
                           a.logz + b.logz, (q, q))
        out[e] = np.asarray(uniform_marginals(u)).reshape(q, q)
    return out
