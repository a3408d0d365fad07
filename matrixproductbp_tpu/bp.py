"""MPBP state and the node-batched BP sweep — the TPU-native L2 scheduler.

Redesign of the reference scheduler (``/root/reference/src/mpbp.jl``,
``recursive_bp_factor.jl:104-179``) for XLA:

* State is struct-of-arrays: all edge messages live in one padded tensor
  ``msg_cores[E, T1, D, D, q*q]`` (plus ``msg_logz[E]``); beliefs likewise.
  This replaces the spinlock ``AtomicVector`` store (``atomic_vector.jl``) —
  under a bulk-synchronous jitted sweep there is nothing to lock.
* One sweep updates *every* node simultaneously (Jacobi schedule) via ``vmap``
  over nodes; the reference's racy asynchronous ``Threads.@threads`` sweep
  (``mpbp.jl:190``) is replaced by the idiomatic-TPU synchronous schedule
  (use ``damp`` on loopy graphs if oscillations appear).
* The cavity all-but-one products (reference ``CavityTools.cavity`` at
  ``recursive_bp_factor.jl:140``) become prefix/suffix folds of the
  associative merge ``op`` (``recursive_bp_factor.jl:117-131``), with the
  endpoint folds shortcut through cheap y-embeddings (no bond growth).

Degree raggedness is handled by padding every node to ``dmax`` slots whose
lifted message is the identity element of ``op`` (the ``prob_y0`` one-hot),
which is exact.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .graph import Graph
from .factors import RecursiveFactorTables
from .ops.tensortrain import (
    TensorTrain, compress, normalize, normalize_eachmatrix, marginals,
    twovar_marginals, tt_sum, flat_tt, lognorm, _safe_scale,
)
from .ops.mpem import mpem3_to_mpem2, mpem3_to_mpem2_periodic
from .ops.randomized import merge_rounded
from .ops.sumy import y_expand
from .ops.stta import merge_stta, mpem3_stta
from .ops.truncation import SVDTrunc, TruncThresh, default_truncator

__all__ = ["MPBP", "mpbp", "periodic_mpbp", "bp_sweep", "bp_sweep_chunked",
           "iterate", "beliefs",
           "beliefs_tu", "pair_beliefs", "pair_beliefs_as_tt",
           "pair_beliefs_as_mpem", "pair_lognorms", "belief_lognorms",
           "bethe_free_energy_pair", "bethe_free_energy", "means",
           "autocorrelations", "autocovariances", "pair_correlations",
           "alternate_marginals", "alternate_correlations", "logprob",
           "expectation", "reset", "reset_messages", "reset_beliefs",
           "reset_observations", "is_periodic", "is_free_dynamics", "getT",
           "getN", "nstates", "CB_BP"]


class GraphArrays(NamedTuple):
    """Device-side copies of the Graph index arrays."""
    in_edges: jax.Array   # i[N, K]
    out_edges: jax.Array  # i[N, K]
    in_mask: jax.Array    # bool[N, K]
    degree: jax.Array     # i[N]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MPBP:
    """The full BP state (a pytree; ``graph`` rides along as static aux).

    Mirrors the reference ``MPBP`` struct fields (``mpbp.jl:1-33``):
    ``w -> tables``, ``phi``, ``psi``, ``mu -> msg_*``, ``b -> bel_*``, ``f``.
    """

    tables: RecursiveFactorTables
    phi: jax.Array        # [N, T1, q]
    psi: jax.Array        # [E, T1, q, q]  (leg order: x_src, x_dst)
    msg_cores: jax.Array  # [E, T1, D, D, q*q]  phys flat (x_src, x_dst)
    msg_logz: jax.Array   # [E]
    bel_cores: jax.Array  # [N, T1, D, D, q]
    bel_logz: jax.Array   # [N]
    f: jax.Array          # [N]
    garrays: GraphArrays
    graph: Graph = dataclasses.field(metadata=dict(static=True))
    periodic: bool = dataclasses.field(default=False,
                                       metadata=dict(static=True))
    #: per-node state counts for heterogeneous-q models (reference ``q``
    #: vector, ``mpbp.jl:60-70``); None = homogeneous (``tables.q`` for all).
    #: States ``x >= qs[i]`` are padding with zero probability (masked
    #: through ``phi``), which is exact — see :func:`mpbp`.
    qs: tuple | None = dataclasses.field(default=None,
                                         metadata=dict(static=True))

    def tree_flatten(self):
        return ((self.tables, self.phi, self.psi, self.msg_cores, self.msg_logz,
                 self.bel_cores, self.bel_logz, self.f, self.garrays),
                (self.graph, self.periodic, self.qs))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # reference getT / getN / nstates (mpbp.jl:35-37)
    @property
    def T(self) -> int:
        return self.phi.shape[1] - 1

    @property
    def N(self) -> int:
        return self.graph.N

    @property
    def q(self) -> int:
        return self.tables.q

    @property
    def D(self) -> int:
        return self.msg_cores.shape[2]


def mpbp(graph: Graph, tables: RecursiveFactorTables, T: int, D: int,
         phi=None, psi=None, dtype=jnp.float64, periodic: bool = False,
         qs=None) -> MPBP:
    """Construct a flat-initialised state (reference ``mpbp`` at
    ``mpbp.jl:60-70``; ``periodic_mpbp`` at ``mpbp.jl:399-409``).

    ``qs``: optional per-node state counts (the reference's ``q`` vector,
    ``mpbp.jl:60``) for heterogeneous-q models.  Tables must be built padded
    to ``max(qs)`` (specs returning 0 for own-states ``>= q_i``); the
    constructor zeroes ``phi[i, :, x]`` for ``x >= qs[i]``, which removes the
    padded states exactly — every trajectory visiting one carries zero
    reweighting at every time step."""
    N, E, q = graph.N, graph.E, tables.q
    T1 = T + 1
    if phi is None:
        phi = jnp.ones((N, T1, q), dtype)
    else:
        phi = jnp.asarray(phi, dtype)
    if qs is not None:
        qs = tuple(int(x) for x in qs)
        assert len(qs) == N and max(qs) <= q
        qmask = np.arange(q)[None, :] < np.asarray(qs)[:, None]   # [N, q]
        phi = phi * jnp.asarray(qmask[:, None, :], dtype)
    if psi is None:
        psi = jnp.ones((E, T1, q, q), dtype)
    else:
        psi = jnp.asarray(psi, dtype)
        _check_psi_symmetry(graph, psi)
    msg = flat_tt(T1, D, (q, q), dtype, periodic=periodic)
    m, _ = normalize(msg)
    bel = flat_tt(T1, D, (q,), dtype, periodic=periodic)
    ga = GraphArrays(
        jnp.asarray(graph.in_edges), jnp.asarray(graph.out_edges),
        jnp.asarray(graph.in_mask), jnp.asarray(graph.degree),
    )
    return MPBP(
        tables.astype(dtype), phi, psi,
        jnp.broadcast_to(m.cores, (E,) + m.cores.shape).copy(),
        jnp.zeros((E,), dtype),
        jnp.broadcast_to(bel.cores, (N,) + bel.cores.shape).copy(),
        jnp.zeros((N,), dtype),
        jnp.zeros((N,), dtype), ga, graph, periodic, qs,
    )


def _check_psi_symmetry(graph: Graph, psi):
    """psi_ij^t must equal transpose(psi_ji^t) (reference ``check_ψs``,
    ``mpbp.jl:40-58``)."""
    p = np.asarray(psi)
    pt = p[np.asarray(graph.rev_edge)].transpose(0, 1, 3, 2)
    if not np.allclose(p, pt):
        raise ValueError("psi on edge (i,j) must be the transpose of (j,i)")


# ---------------------------------------------------------------------------
# the sweep
# ---------------------------------------------------------------------------

def _merge(Lc, Llz, Rc, Rlz, pyy, trunc: SVDTrunc, Dout: int, Y: int, q: int,
           periodic: bool = False, method: str = "qr", key=None,
           yy_off: int | None = None):
    """op: combine two cavity trains (phys (Y, q)) — Hadamard on x_i,
    ``prob_yy`` contraction on y, Kronecker on bonds, then truncate.

    Mirrors ``op`` in ``compute_prob_ys`` (``recursive_bp_factor.jl:117-131``).
    Lc: [T1, DL, DL, Y*q], Rc: [T1, DR, DR, Y*q] -> [T1, Dout, Dout, Y*q].
    ``yy_off`` selects the banded sum-type y-merge (``ops/sumy.py``): pyy is
    then a placeholder and is never read.
    """
    if method == "randomized" and not periodic:
        return merge_rounded(Lc, Llz, Rc, Rlz, pyy, trunc, Dout, Y, q, key,
                             yy_off=yy_off)
    if method == "sketch" and not periodic:
        return merge_stta(Lc, Llz, Rc, Rlz, pyy, Dout, Y, q, key,
                          yy_off=yy_off)
    T1, DL = Lc.shape[0], Lc.shape[1]
    DR = Rc.shape[1]
    L = Lc.reshape(T1, DL, DL, Y, q)
    R = Rc.reshape(T1, DR, DR, Y, q)
    if yy_off is not None:
        # banded merge: tmp[t,m,n,y,b,x] = L[t,m,n,y+off-b,x]
        tmp = y_expand(L, yy_off, axis=3, mode="diff")
    elif pyy.ndim == 5:  # time-varying tables: pyy [T1, Y, Y, Y, q]
        tmp = jnp.einsum("tyabx,tmnax->tmnybx", pyy, L)
    else:
        tmp = jnp.einsum("yabx,tmnax->tmnybx", pyy, L)   # [T1,DL,DL,Y,Y,q]
    M = jnp.einsum("tmnybx,tuvbx->tmunvyx", tmp, R)      # [T1,DL,DR,DL,DR,Y,q]
    cores = M.reshape(T1, DL * DR, DL * DR, Y * q)
    tt = TensorTrain(cores, Llz + Rlz, (Y, q), periodic)
    tt = compress(tt, trunc, Dout=Dout)
    tt = normalize_eachmatrix(tt)
    return tt.cores, tt.logz


def _embed_first(Bc, Blz, pyy0, py0, yy_off: int | None = None):
    """Shortcut op(init, B): pure y-relabeling, no bond growth.
    out[y, x] = sum_{a,b} pyy0[y, a, b, x] * py0[a, x] * B[b, x]."""
    T1, Dm = Bc.shape[0], Bc.shape[1]
    Y, q = py0.shape[-2], py0.shape[-1]
    B = Bc.reshape(T1, Dm, Dm, Y, q)
    if yy_off is not None:
        # W[y, b, x] = py0[y + off - b, x]
        W = y_expand(py0, yy_off, axis=py0.ndim - 2, mode="diff")
        out = (jnp.einsum("tybx,tmnbx->tmnyx", W, B) if py0.ndim == 3
               else jnp.einsum("ybx,tmnbx->tmnyx", W, B))
    elif pyy0.ndim == 5:  # time-varying: pyy0 [T1,Y,Y,Y,q], py0 [T1,Y,q]
        W = jnp.einsum("tyabx,tax->tybx", pyy0, py0)
        out = jnp.einsum("tybx,tmnbx->tmnyx", W, B)
    else:
        W = jnp.einsum("yabx,ax->ybx", pyy0, py0)        # [Y, Y, q]
        out = jnp.einsum("ybx,tmnbx->tmnyx", W, B)
    return out.reshape(T1, Dm, Dm, Y * q), Blz


def _embed_second(Bc, Blz, pyy1, py0, yy_off: int | None = None):
    """Shortcut op(B, init): out[y,x] = sum_{a,b} pyy1[y,a,b,x] B[a,x] py0[b,x]."""
    T1, Dm = Bc.shape[0], Bc.shape[1]
    Y, q = py0.shape[-2], py0.shape[-1]
    B = Bc.reshape(T1, Dm, Dm, Y, q)
    if yy_off is not None:
        # W[y, a, x] = py0[y + off - a, x] (same banded slab as op(init, B))
        W = y_expand(py0, yy_off, axis=py0.ndim - 2, mode="diff")
        out = (jnp.einsum("tyax,tmnax->tmnyx", W, B) if py0.ndim == 3
               else jnp.einsum("yax,tmnax->tmnyx", W, B))
    elif pyy1.ndim == 5:
        W = jnp.einsum("tyabx,tbx->tyax", pyy1, py0)
        out = jnp.einsum("tyax,tmnax->tmnyx", W, B)
    else:
        W = jnp.einsum("yabx,bx->yax", pyy1, py0)
        out = jnp.einsum("yax,tmnax->tmnyx", W, B)
    return out.reshape(T1, Dm, Dm, Y * q), Blz


def _f_bp_partial(Cc, Clz, Wtab, phi, qj: int, periodic: bool = False):
    """Contract a cavity train with the (pre-built) transition table and the
    node reweighting into an MPEM3 stack (``_f_bp_partial``,
    ``recursive_bp_factor.jl:73-87``; periodic variant ``:89-101`` applies the
    transition at every time step).

    Cc: [T1, Dc, Dc, Y*q];  Wtab: [q(xp), q(xi), qj, Y] (or [T1, ...] for
    time-varying factors, reference ``w[i][t]``)  ->
    B3: [T1, Dc, Dc, q, qj, q(xp)].
    Open trains: the last step has no transition factor (uniform in xj, xp).
    """
    T1, Dc = Cc.shape[0], Cc.shape[1]
    q = Wtab.shape[-4]
    Y = Wtab.shape[-1]
    C = Cc.reshape(T1, Dc, Dc, Y, q)
    if Wtab.ndim == 5:
        if periodic:
            B3 = jnp.einsum("tpijy,tmnyi,ti->tmnijp", Wtab, C, phi)
            return B3, Clz
        main = jnp.einsum("tpijy,tmnyi,ti->tmnijp", Wtab[:-1], C[:-1],
                          phi[:-1])
    elif periodic:
        B3 = jnp.einsum("pijy,tmnyi,ti->tmnijp", Wtab, C, phi)
        return B3, Clz
    else:
        main = jnp.einsum("pijy,tmnyi,ti->tmnijp", Wtab, C[:-1], phi[:-1])
    lastC = jnp.einsum("mnyi,i->mni", C[-1], phi[-1])    # sum over y
    last = jnp.broadcast_to(lastC[:, :, :, None, None],
                            (Dc, Dc, q, qj, q))
    B3 = jnp.concatenate([main, last[None]], axis=0)
    return B3, Clz


def _node_update(msgs_in_c, msgs_in_lz, msgs_out_old_c, msgs_out_old_lz,
                 psi_out, mask, Py_i, Pyp_i, Pxy_i, Py0_i, phi_i, deg_i,
                 pyy_stack, trunc: SVDTrunc, trunc_cav: SVDTrunc, Dm: int,
                 Dc: int, damp: float, periodic: bool = False,
                 method: str = "qr", key=None, yy_off: int | None = None,
                 direct_k3: bool = True):
    """Update all outgoing messages + the belief of one node.

    Mirrors ``onebpiter!`` for RecursiveBPFactor
    (``recursive_bp_factor.jl:146-165``).  Vmapped over nodes by the caller.

    msgs_in_c: [K, T1, Dm, Dm, q*q]; psi_out: [K, T1, q, q]; mask: bool[K].
    Returns (out_cores [K,T1,Dm,Dm,q*q], out_logz [K], bel_cores, bel_logz, f).
    """
    K, T1 = msgs_in_c.shape[0], msgs_in_c.shape[1]
    q = phi_i.shape[1]
    Y = Py0_i.shape[-2]
    dtype = msgs_in_c.dtype

    # ---- lift each incoming message to y-space (recursive_bp_factor.jl:108-115)
    A = msgs_in_c.reshape(K, T1, Dm, Dm, q, q)           # legs (x_k, x_i)
    # B_k[m,n,y,xi] = sum_xk Pxy[k,y,xk,xi] psi_out[k,t,xi,xk] A[k,t,m,n,xk,xi]
    if Pxy_i.ndim == 5:  # time-varying tables: Pxy_i [K, T1, Y, q, q]
        B = jnp.einsum("ktyci,ktic,ktmnci->ktmnyi", Pxy_i, psi_out, A)
    else:
        B = jnp.einsum("kyci,ktic,ktmnci->ktmnyi", Pxy_i, psi_out, A)
    # padded slots -> identity element (prob_y0 one-hot, bond (0,0))
    ident = jnp.zeros((T1, Dm, Dm, Y, q), dtype)
    ident = ident.at[:, 0, 0].set(jnp.broadcast_to(Py0_i, (T1, Y, q)))
    B = jnp.where(mask[:, None, None, None, None, None], B, ident[None])
    B = B.reshape(K, T1, Dm, Dm, Y * q)
    Blz = jnp.where(mask, msgs_in_lz, 0.0)

    pyy = pyy_stack
    nYY = pyy.shape[0]

    def pyy_at(d1):
        return pyy[min(d1, nYY - 1)]

    def pad_dc(c):
        """Embed a Dm-bond train into the Dc-bond capacity (zero-pad: exact)."""
        from .ops.tensortrain import _fit_axis
        return _fit_axis(_fit_axis(c, 1, Dc), 2, Dc)

    if K == 3 and direct_k3:
        # ---- direct all-pairs cavity: 2 sequential merge LEVELS instead of
        # 4.  Measured on TPU, per-merge wall time is dominated by the
        # latency of the dependent per-timestep op chain and is nearly
        # batch-size independent (PERF.md), so batching the three pair
        # merges into one vmapped level halves the sweep's critical path.
        # Exact: op is associative with the prob_y0 one-hot as identity, and
        # slot order (hence the d1 index of prob_yy) is preserved.
        # level 1: C0 = op(B1, B2) and C2 = op(B0, B1)   (batch 2)
        # level 2: C1 = op(B0, B2) and full = op(C2, B2)  (batch 2)
        # (balanced 2+2 rather than 3+1 keeps the peak working set lower)
        mergev = jax.vmap(
            lambda lc, llz, rc, rlz, pk: _merge(
                lc, llz, rc, rlz, pk, trunc_cav, Dc, Y, q, periodic,
                method, key, yy_off))
        P1c, P1lz = mergev(
            jnp.stack([B[1], B[0]]), jnp.stack([Blz[1], Blz[0]]),
            jnp.stack([B[2], B[1]]), jnp.stack([Blz[2], Blz[1]]),
            jnp.stack([pyy_at(1)] * 2))
        from .ops.tensortrain import _fit_axis as _fx
        B0d = _fx(_fx(B[0], 1, Dc), 2, Dc)
        P2c, P2lz = mergev(
            jnp.stack([B0d, P1c[1]]), jnp.stack([Blz[0], P1lz[1]]),
            jnp.stack([_fx(_fx(B[2], 1, Dc), 2, Dc), _fx(_fx(B[2], 1, Dc),
                                                         2, Dc)]),
            jnp.stack([Blz[2], Blz[2]]),
            jnp.stack([pyy_at(1), pyy_at(2)]))
        Cs_c = jnp.stack([P1c[0], P2c[0], P1c[1]])
        Cs_lz = jnp.stack([P1lz[0], P2lz[0], P1lz[1]])
        full_c, full_lz = P2c[1], P2lz[1]
    else:
        # ---- prefix folds L_k = fold(B_0..B_{k-1}) (lax.scan over slots) --
        L1c, L1lz = _embed_first(B[0], Blz[0], pyy_at(0), Py0_i, yy_off)
        L1c = pad_dc(L1c)

        def pstep(carry, xs):
            Lc, Llz = carry
            Bk, Bklz, pyy_k = xs
            out = _merge(Lc, Llz, Bk, Bklz, pyy_k, trunc_cav, Dc, Y, q,
                         periodic, method, key, yy_off)
            return out, out

        if K > 1:
            pyy_pref = jnp.stack([pyy_at(k) for k in range(1, K)])
            (full_c, full_lz), (Lst_c, Lst_lz) = jax.lax.scan(
                pstep, (L1c, L1lz), (B[1:], Blz[1:], pyy_pref))
            # Lst[j] = L_{j+2}
        else:
            full_c, full_lz = L1c, L1lz

        # ---- suffix folds R_k = fold(B_k..B_{K-1}) (reverse scan) ---------
        if K > 1:
            RKm1c, RKm1lz = _embed_second(B[K - 1], Blz[K - 1], pyy_at(1),
                                          Py0_i, yy_off)
            RKm1c = pad_dc(RKm1c)

            def sstep(carry, xs):
                Rc, Rlz = carry
                Bk, Bklz = xs
                out = _merge(Bk, Bklz, Rc, Rlz, pyy_at(1), trunc_cav, Dc, Y,
                             q, periodic, method, key, yy_off)
                return out, out

            (_, _), (Rst_c, Rst_lz) = jax.lax.scan(
                sstep, (RKm1c, RKm1lz), (B[1:K - 1], Blz[1:K - 1]),
                reverse=True)
            # Rst[j] = R_{j+1} for j = 0..K-3 (i.e. R_1..R_{K-2})

        # ---- cavity C_k = op(L_k, R_{k+1}), vmapped over interior slots ---
        if K == 1:
            # all-but-one of a single slot = the bare init element
            Cs_c = pad_dc(ident.reshape(T1, Dm, Dm, Y * q))[None]
            Cs_lz = jnp.zeros((1,), dtype)
        elif K == 2:
            Cs_c = jnp.stack([RKm1c, L1c])
            Cs_lz = jnp.stack([RKm1lz, L1lz])
        else:
            # L_k for k = 1..K-2 paired with R_{k+1} for k = 1..K-2
            Lcav_c = jnp.concatenate([L1c[None], Lst_c[:K - 3]], axis=0)
            Lcav_lz = jnp.concatenate([L1lz[None], Lst_lz[:K - 3]], axis=0)
            Rcav_c = jnp.concatenate([Rst_c[1:], RKm1c[None]], axis=0)
            Rcav_lz = jnp.concatenate([Rst_lz[1:], RKm1lz[None]], axis=0)
            pyy_cav = jnp.stack([pyy_at(k) for k in range(1, K - 1)])
            Cmid_c, Cmid_lz = jax.vmap(
                lambda lc, llz, rc, rlz, pk: _merge(
                    lc, llz, rc, rlz, pk, trunc_cav, Dc, Y, q, periodic,
                    method, key, yy_off)
            )(Lcav_c, Lcav_lz, Rcav_c, Rcav_lz, pyy_cav)
            Cs_c = jnp.concatenate(
                [Rst_c[0][None], Cmid_c, Lst_c[K - 3][None]], axis=0)
            Cs_lz = jnp.concatenate(
                [Rst_lz[0][None], Cmid_lz, Lst_lz[K - 3][None]], axis=0)

    # ---- outgoing messages (f_bp_partial_ij -> mpem2 -> compress ->
    #      normalize -> damping), vmapped over slots
    #      (recursive_bp_factor.jl:154-158, 168-179) ------------------------
    def one_out(Cc, Clz, Pyp_k, old_c, old_lz):
        B3, B3lz = _f_bp_partial(Cc, Clz, Pyp_k, phi_i, q, periodic)
        if method == "sketch" and not periodic:
            mu = mpem3_stta(B3, B3lz, Dm, key)
        else:
            mu = (mpem3_to_mpem2_periodic(B3, B3lz) if periodic
                  else mpem3_to_mpem2(B3, B3lz))
            mu = compress(mu, trunc, Dout=Dm, assume="left")
        mu = normalize_eachmatrix(mu)
        mu, logz_k = normalize(mu)
        if damp > 0.0:
            old = TensorTrain(old_c, old_lz, (q, q), periodic)
            mixed = tt_sum(mu, old, damp / (1.0 - damp))
            mixed = compress(mixed, trunc, Dout=Dm)
            mixed, _ = normalize(mixed)
            mu = mixed
        return mu.cores, mu.logz, logz_k

    out_cores, out_lz, logz_ks = jax.vmap(one_out)(
        Cs_c, Cs_lz, Pyp_i, msgs_out_old_c, msgs_out_old_lz)
    sum_logz = jnp.sum(jnp.where(mask, logz_ks, 0.0))

    # ---- belief: f_bp_partial_i on the full fold --------------------------
    Wb = Py_i[..., None, :]                              # [(T1,) q, q, 1, Y]
    B3b, B3blz = _f_bp_partial(full_c, full_lz, Wb, phi_i, 1, periodic)
    B3b = B3b.reshape(T1, B3b.shape[1], B3b.shape[2], q, 1, q)
    if method == "sketch" and not periodic:
        bel2 = mpem3_stta(B3b, B3blz, Dm, key)
    else:
        bel2 = (mpem3_to_mpem2_periodic(B3b, B3blz) if periodic
                else mpem3_to_mpem2(B3b, B3blz))
        bel2 = compress(bel2, trunc, Dout=Dm, assume="left")
    # marginalize MPEM2 -> MPEM1 (sum the dummy x_j leg, mpems.jl:27)
    bel1 = TensorTrain(
        bel2.cores.reshape(T1, Dm, Dm, q, 1).sum(axis=4), bel2.logz, (q,),
        periodic)
    bel1, logz_i = normalize(bel1)

    d_i = deg_i.astype(dtype)
    f_i = (d_i / 2.0 - 1.0) * logz_i - 0.5 * sum_logz
    return out_cores, out_lz, bel1.cores, bel1.logz, f_i


def _bucket_update_batched(msgs_in_c, msgs_in_lz, msgs_out_old_c,
                           msgs_out_old_lz, psi_out, mask, Py_b, Pyp_b, Pxy_b,
                           Py0_b, phi_b, deg_b, pyy_b, trunc: SVDTrunc,
                           Dm: int, Dc: int, damp: float, key,
                           yy_off: int | None, stagger: int | None = None):
    """Whole-bucket sketch update: the same math as :func:`_node_update`
    (``method='sketch'``, open trains, time-constant tables) with the node
    axis threaded *through* the merges instead of vmapped around them, so the
    STTA scans run explicitly batched + software-pipelined
    (``ops/stta.merge_stta_batched``; motivation in ``ops/pipeline.py``).

    msgs_in_c: [Nb, K, T1, Dm, Dm, q*q]; tables are bucket-cropped with node
    axis either 1 (homogeneous, broadcast) or Nb; ``pyy_b[0]`` must be shared
    across nodes (per-node dense prob_yy falls back to :func:`_node_update`).
    Returns (out_cores [Nb,K,...], out_logz [Nb,K], bel_cores, bel_logz, f).
    """
    from .ops.stta import merge_stta_batched, mpem3_stta_batched, \
        mpem3_stta_batched_tm
    from .ops import fused_stta

    Nb, K, T1 = msgs_in_c.shape[0], msgs_in_c.shape[1], msgs_in_c.shape[2]
    q = phi_b.shape[-1]
    Y = Py0_b.shape[-2]
    dtype = msgs_in_c.dtype
    YP = Y * q

    def bc(tbl):
        """Broadcast a node-axis-1 table to Nb (tables are tiny)."""
        return jnp.broadcast_to(tbl, (Nb,) + tbl.shape[1:])

    Py_b, Pyp_b, Pxy_b, Py0_b = map(bc, (Py_b, Pyp_b, Pxy_b, Py0_b))
    pyy0 = pyy_b[0]                         # [K', Y, Y, Y, q] shared
    nYY = pyy0.shape[0]

    def pyy_at(d1):
        return pyy0[min(d1, nYY - 1)]

    # ---- lift incoming messages to y-space (recursive_bp_factor.jl:108-115)
    A = msgs_in_c.reshape(Nb, K, T1, Dm, Dm, q, q)
    B = jnp.einsum("zkyci,zktic,zktmnci->zktmnyi", Pxy_b, psi_out, A)
    ident = jnp.zeros((Nb, T1, Dm, Dm, Y, q), dtype)
    ident = ident.at[:, :, 0, 0].set(
        jnp.broadcast_to(Py0_b[:, None], (Nb, T1, Y, q)))
    B = jnp.where(mask[:, :, None, None, None, None, None], B, ident[:, None])
    B = B.reshape(Nb, K, T1, Dm, Dm, YP)
    Blz = jnp.where(mask, msgs_in_lz, 0.0)

    def mrg(lc, llz, rc, rlz, pk):
        # Pallas fused scans on TPU (ops/fused_stta.py); XLA scans otherwise
        if fused_stta.fused_supported(lc.shape[2], rc.shape[2], Y, q, Dc,
                                      lc.dtype):
            return fused_stta.merge_stta_fused(
                lc, llz, rc, rlz, pk, Dc, Y, q, key, yy_off=yy_off,
                interpret=fused_stta._FORCE_INTERPRET)
        return merge_stta_batched(lc, llz, rc, rlz, pk, Dc, Y, q, key,
                                  yy_off=yy_off, stagger=stagger)

    def pad_dc(c):
        from .ops.tensortrain import _fit_axis
        return _fit_axis(_fit_axis(c, 2, Dc), 3, Dc)

    def embed_first_b(Bc_z, Blz_z):
        """Batched _embed_first: op(init, B) — y-relabel, no bond growth."""
        Bf = Bc_z.reshape(Nb, T1, Dm, Dm, Y, q)
        if yy_off is not None:
            W = y_expand(Py0_b, yy_off, axis=1, mode="diff")   # [z, Y, b, q]
            out = jnp.einsum("zybx,ztmnbx->ztmnyx", W, Bf)
        else:
            W = jnp.einsum("zyabx,zax->zybx", bc(pyy_at(0)[None]), Py0_b)
            out = jnp.einsum("zybx,ztmnbx->ztmnyx", W, Bf)
        return out.reshape(Nb, T1, Dm, Dm, YP), Blz_z

    def embed_second_b(Bc_z, Blz_z):
        """Batched _embed_second: op(B, init)."""
        Bf = Bc_z.reshape(Nb, T1, Dm, Dm, Y, q)
        if yy_off is not None:
            W = y_expand(Py0_b, yy_off, axis=1, mode="diff")
            out = jnp.einsum("zyax,ztmnax->ztmnyx", W, Bf)
        else:
            W = jnp.einsum("zyabx,zbx->zyax", bc(pyy_at(1)[None]), Py0_b)
            out = jnp.einsum("zyax,ztmnax->ztmnyx", W, Bf)
        return out.reshape(Nb, T1, Dm, Dm, YP), Blz_z

    # ---- cavity folds -------------------------------------------------------
    if K == 1:
        full_c, full_lz = embed_first_b(B[:, 0], Blz[:, 0])
        full_c = pad_dc(full_c)
        Cs_c = pad_dc(ident.reshape(Nb, T1, Dm, Dm, YP))[:, None]
        Cs_lz = jnp.zeros((Nb, 1), dtype)
    elif K == 2:
        L1c, L1lz = embed_first_b(B[:, 0], Blz[:, 0])
        R1c, R1lz = embed_second_b(B[:, 1], Blz[:, 1])
        L1c, R1c = pad_dc(L1c), pad_dc(R1c)
        full_c, full_lz = mrg(L1c, L1lz, B[:, 1], Blz[:, 1], pyy_at(1))
        Cs_c = jnp.stack([R1c, L1c], axis=1)
        Cs_lz = jnp.stack([R1lz, L1lz], axis=1)
    elif K == 3:
        # direct all-pairs scheme (2 merge levels; see _node_update)
        P1c, P1lz = mrg(
            jnp.concatenate([B[:, 1], B[:, 0]]),
            jnp.concatenate([Blz[:, 1], Blz[:, 0]]),
            jnp.concatenate([B[:, 2], B[:, 1]]),
            jnp.concatenate([Blz[:, 2], Blz[:, 1]]), pyy_at(1))
        C0c, C2c = P1c[:Nb], P1c[Nb:]
        C0lz, C2lz = P1lz[:Nb], P1lz[Nb:]
        C1c, C1lz = mrg(B[:, 0], Blz[:, 0], B[:, 2], Blz[:, 2], pyy_at(1))
        full_c, full_lz = mrg(C2c, C2lz, B[:, 2], Blz[:, 2], pyy_at(2))
        Cs_c = jnp.stack([C0c, C1c, C2c], axis=1)
        Cs_lz = jnp.stack([C0lz, C1lz, C2lz], axis=1)
    else:
        # prefix/suffix folds, each fold step batched over the bucket
        L1c, L1lz = embed_first_b(B[:, 0], Blz[:, 0])
        L1c = pad_dc(L1c)
        Lc, Llz = L1c, L1lz
        Ls = []                                 # L_{k+2} for k = 0..K-2
        for k in range(1, K):
            Lc, Llz = mrg(Lc, Llz, B[:, k], Blz[:, k], pyy_at(k))
            Ls.append((Lc, Llz))
        full_c, full_lz = Lc, Llz
        RKc, RKlz = embed_second_b(B[:, K - 1], Blz[:, K - 1])
        RKc = pad_dc(RKc)
        Rc, Rlz = RKc, RKlz
        Rs = [(RKc, RKlz)]                      # R_{K-1}, R_{K-2}, ..., R_1
        for k in range(K - 2, 0, -1):
            Rc, Rlz = mrg(B[:, k], Blz[:, k], Rc, Rlz, pyy_at(1))
            Rs.append((Rc, Rlz))
        Rs = Rs[::-1]                           # Rs[j] = R_{j+1}
        # C_0 = R_1; C_{K-1} = L_{K-1}; interior C_k = op(L_k, R_{k+1})
        Cs = [Rs[0]]
        for k in range(1, K - 1):
            Cs.append(mrg(Ls[k - 1][0], Ls[k - 1][1],
                          Rs[k][0], Rs[k][1], pyy_at(k)))
        Cs.append(Ls[K - 2])
        Cs_c = jnp.stack([c for c, _ in Cs], axis=1)
        Cs_lz = jnp.stack([z for _, z in Cs], axis=1)

    # ---- outgoing messages: f_bp_partial -> mpem3 sketch -> normalize ------
    # B3[z,k,t,m,n,i,j,p] = sum_y Pyp[z,k,p,i,j,y] C[z,k,t,m,n,(y,i)]
    # phi[z,t,i] is built DIRECTLY time-major flat ([T1, Nb*K, cols], col
    # order (i,j,p,m,n)) as a batched dot_general over (t,z,k): the obvious
    # 3-operand einsum gets conv-lowered by XLA into a (2,128)-tiled layout
    # whose tiny trailing dims pad ~13x — a 16 GB HLO temp at the chunked-
    # sweep scale shape (N=1e4, T=50, chunk 2048; measured from the compile
    # OOM).  The 7-D B3 never materializes on this path.
    Dcc = Cs_c.shape[-3]
    T = T1 - 1
    C = Cs_c.reshape(Nb, K, T1, Dcc, Dcc, Y, q)
    eye = jnp.eye(q, dtype=dtype)
    # Mop[z,k,t,(y,c),(i,j,p)]: c is the phys leg contracted against C
    Mop = jnp.einsum("zkpijy,zti,ci->zktycijp", Pyp_b, phi_b[:, :-1], eye)
    Mop = Mop.reshape(Nb, K, T, Y * q, q * q * q)
    Mop = jnp.moveaxis(Mop, 2, 0)                   # [T, z, k, yc, ijp]
    Ctm = jnp.transpose(Cs_c[:, :, :-1], (2, 0, 1, 5, 3, 4))
    Ctm = Ctm.reshape(T, Nb, K, Y * q, Dcc * Dcc)   # [T, z, k, yc, mn]
    main_tm = jax.lax.dot_general(
        Mop, Ctm, (((3,), (3,)), ((0, 1, 2), (0, 1, 2))),
        preferred_element_type=dtype)               # [T, z, k, ijp, mn]
    main_tm = main_tm.reshape(T, Nb * K, q * q * q * Dcc * Dcc)
    lastC = jnp.einsum("zkmnyi,zi->zkimn", C[:, :, -1], phi_b[:, -1])
    last_tm = jnp.broadcast_to(
        lastC[:, :, :, None, None],
        (Nb, K, q, q, q, Dcc, Dcc)).reshape(1, Nb * K, -1)
    B3_tm = jnp.concatenate([main_tm, last_tm], axis=0)
    def mp3(b3, lz, Dout, allow_fused):
        # fused Pallas scans on TPU (ops/fused_stta.py); XLA scans otherwise
        if allow_fused and fused_stta.mpem3_fused_supported(
                b3.shape[2], b3.shape[4], b3.shape[5], Dout, b3.dtype):
            return fused_stta.mpem3_stta_fused(
                b3, lz, Dout, key, interpret=fused_stta._FORCE_INTERPRET)
        return mpem3_stta_batched(b3, lz, Dout, key, stagger=stagger)
    # message conversion: fused kernels consume the time-major FLAT layout
    # directly (mpem3_stta_fused_tm).  The round-3 fusion attempt went
    # through the 7-D B3 whose padded tiled layout cost +8 GB HBM at bench
    # scale (16.15 vs 8.09 GB by compiled.memory_analysis()); the tm entry
    # keeps the full-batch array flat (pads ~1.0x) and pays the padded
    # lanes-last copies only per 2048-instance chunk.
    import os as _os
    if (_os.environ.get("MPBP_FUSE_MSG", "1") != "0"
            and fused_stta.mpem3_fused_supported(Dcc, q, q, Dm, dtype)):
        out_c, out_lz0 = fused_stta.mpem3_stta_fused_tm(
            B3_tm, Cs_lz.reshape(Nb * K), Dcc, q, q, Dm, key,
            interpret=fused_stta._FORCE_INTERPRET)
    else:
        out_c, out_lz0 = mpem3_stta_batched_tm(
            B3_tm, Cs_lz.reshape(Nb * K), Dcc, q, q, Dm, key,
            stagger=stagger)
    # batched normalize_eachmatrix + normalize
    m = _safe_scale(jnp.max(jnp.abs(out_c), axis=(2, 3, 4)))    # [NbK, T1]
    out_c = out_c / m[:, :, None, None, None]
    out_lz0 = out_lz0 - jnp.sum(jnp.log(m), axis=1)
    mu_n, logz_ks = jax.vmap(
        lambda c, z: normalize(TensorTrain(c, z, (q, q))))(out_c, out_lz0)
    out_cores, out_lz = mu_n.cores, mu_n.logz
    if damp > 0.0:
        def damp_one(c, z, oc, oz):
            old = TensorTrain(oc, oz, (q, q))
            mixed = tt_sum(TensorTrain(c, z, (q, q)), old,
                           damp / (1.0 - damp))
            mixed = compress(mixed, trunc, Dout=Dm)
            mixed, _ = normalize(mixed)
            return mixed.cores, mixed.logz
        out_cores, out_lz = jax.vmap(damp_one)(
            out_cores, out_lz,
            msgs_out_old_c.reshape((Nb * K,) + msgs_out_old_c.shape[2:]),
            msgs_out_old_lz.reshape(Nb * K))
    out_cores = out_cores.reshape((Nb, K) + out_cores.shape[1:])
    out_lz = out_lz.reshape(Nb, K)
    logz_ks = logz_ks.reshape(Nb, K)
    sum_logz = jnp.sum(jnp.where(mask, logz_ks, 0.0), axis=1)

    # ---- belief from the full fold ------------------------------------------
    Dcf = full_c.shape[-3]
    Cf = full_c.reshape(Nb, T1, Dcf, Dcf, Y, q)
    mainb = jnp.einsum("zpiy,ztmnyi,zti->ztmnip", Py_b, Cf[:, :-1],
                       phi_b[:, :-1])
    lastb = jnp.einsum("zmnyi,zi->zmni", Cf[:, -1], phi_b[:, -1])
    lastb = jnp.broadcast_to(lastb[:, :, :, :, None], (Nb, Dcf, Dcf, q, q))
    B3b = jnp.concatenate([mainb, lastb[:, None]], axis=1)
    B3b = B3b[:, :, :, :, :, None, :]           # qj = 1 dummy leg
    bel_c, bel_lz0 = mp3(B3b, full_lz, Dm, True)
    # marginalize the dummy leg: cores are [Nb, T1, Dm, Dm, q*1]
    bel1_c = bel_c.reshape(Nb, T1, Dm, Dm, q)
    bel1, logz_i = jax.vmap(
        lambda c, z: normalize(TensorTrain(c, z, (q,))))(bel1_c, bel_lz0)

    d_i = deg_b.astype(dtype)
    f_i = (d_i / 2.0 - 1.0) * logz_i - 0.5 * sum_logz
    return out_cores, out_lz, bel1.cores, bel1.logz, f_i


#: minimum bucket size for the explicitly batched sketch path: below this the
#: sweep is latency-bound either way (PERF.md) and the vmap path compiles
#: less.  Env-overridable (MPBP_BATCH_MIN) for measurement; read at import.
import os as _os
_BATCH_MIN_NODES = int(_os.environ.get("MPBP_BATCH_MIN", "256"))


def _degree_buckets(graph: Graph):
    """Static degree buckets for the sweep: [(node_idx, K_b)] with K_b the
    slot padding of the bucket.

    Padding every node to the global dmax makes the sweep cost N*dmax instead
    of sum(d_i) — on heavy-tailed graphs (ER, stars) that is the dominant
    waste (one hub inflates *every* node).  Buckets are exact: a node only
    ever merges its own (masked) slots.  Few distinct degrees -> one bucket
    per degree; many -> power-of-two padding to bound compilation count.
    """
    degs = np.asarray(graph.degree)
    dmax = int(np.maximum(degs, 1).max())
    distinct = np.unique(np.maximum(degs, 1))
    if len(distinct) <= 4:
        bounds = [int(b) for b in distinct]
    else:
        # clamp the top power-of-two to dmax: a bound above the graph's
        # actual slot width would pad Kb past the index arrays' K columns
        # (silently cropped by slicing) and break the K-sized reshapes
        bounds = sorted({min(1 << int(np.ceil(np.log2(b))), dmax)
                         for b in distinct})
    buckets = []
    lo = 0
    for b in bounds:
        idx = np.nonzero((np.maximum(degs, 1) > lo)
                         & (np.maximum(degs, 1) <= b))[0]
        if len(idx):
            buckets.append((idx, int(b)))
        lo = b
    return buckets


@partial(jax.jit, static_argnames=("trunc", "trunc_cav", "Dcav", "damp",
                                   "method", "platform"))
def bp_sweep(bp: MPBP, trunc: SVDTrunc, trunc_cav: SVDTrunc | None = None,
             Dcav: int | None = None, damp: float = 0.0,
             method: str = "qr", platform: str | None = None) -> MPBP:
    """One synchronous (Jacobi) BP sweep over all nodes.

    Replaces the reference's threaded asynchronous loop (``iterate!``,
    ``mpbp.jl:185-198``); convergence is checked by the caller.  Nodes are
    processed in degree buckets so per-node cost tracks d_i (and the y-axis
    is cropped per bucket via ``tables.ydims``), exactly.

    ``platform`` is unused in the body but *must* be in the static cache
    key: jit's trace cache does not key on input device placement, and the
    fused-Pallas admission gates (``ops/fused_stta``) bake their decision
    into the jaxpr at trace time — a TPU trace reused for a CPU-committed
    call would lower TPU Pallas kernels for CPU and fail.
    """
    trunc_cav = trunc if trunc_cav is None else trunc_cav
    Dm = bp.D
    Dcav = Dm if Dcav is None else Dcav
    ga = bp.garrays
    N, K = ga.in_edges.shape
    q = bp.q
    tb = bp.tables
    tv = tb.time_varying
    yy_off = tb.yy_off
    Yg = tb.Y

    key = jax.random.PRNGKey(17)  # deterministic sketch seed

    new_cores, new_lz = bp.msg_cores, bp.msg_logz
    bel_c_all, bel_lz_all = bp.bel_cores, bp.bel_logz
    f_all = bp.f

    for idx, Kb in _degree_buckets(bp.graph):
        nb = jnp.asarray(idx)
        Nb = len(idx)
        if tb.ydims is not None:
            Yb = max(1, min(Yg, tb.ydims[min(Kb, len(tb.ydims) - 1)]))
            if yy_off is not None:
                Yb = max(Yb, yy_off + 1)   # the init element y0 = off
        else:
            Yb = Yg

        in_e = ga.in_edges[nb][:, :Kb]
        in_m = ga.in_mask[nb][:, :Kb]
        out_e = ga.out_edges[nb][:, :Kb]
        out_idx = jnp.minimum(out_e, bp.graph.E - 1)

        msgs_in_c = bp.msg_cores[in_e]           # [Nb, Kb, T1, Dm, Dm, qq]
        msgs_in_lz = bp.msg_logz[in_e]
        msgs_out_old_c = bp.msg_cores[out_idx]
        msgs_out_old_lz = bp.msg_logz[out_idx]
        psi_out = bp.psi[out_idx]                # [Nb, Kb, T1, q, q]

        def nsel(t):
            return t if t.shape[0] == 1 else t[nb]

        # exact per-bucket table crops (padded y entries carry zero
        # probability; a bucket only reaches y < ydims[Kb])
        Py_b = nsel(tb.Py)[..., :Yb]
        Pyp_b = nsel(tb.Pyp)[:, :Kb][..., :Yb]
        Pxy_b = nsel(tb.Pxy)[:, :Kb][..., :Yb, :, :]
        Py0_b = nsel(tb.Py0)[..., :Yb, :]
        if yy_off is None:
            Pyy_b = nsel(tb.Pyy)[:, :min(Kb, tb.Pyy.shape[1])]
            Pyy_b = Pyy_b[..., :Yb, :Yb, :Yb, :]
        else:
            Pyy_b = nsel(tb.Pyy)                 # placeholder, never read

        # the direct all-pairs cavity (2 merge levels) triples the merge
        # batch; above ~4k nodes per bucket its working set exceeds one
        # chip's HBM, so large buckets take the prefix/suffix scheme
        direct_k3 = Nb <= 4096

        # explicitly batched sketch path: the STTA scans run over the whole
        # bucket at once, fused into Pallas kernels on TPU
        # (ops/fused_stta.py).  Taken only when the fused kernels apply —
        # the pure-XLA batched fallback measures *slower* than the vmap path
        # (per-op latency is batch-independent at these sizes, PERF.md), so
        # without them large buckets keep the vmapped per-node update.  A
        # threshold of <= 1 (tests) forces the batched path regardless.
        from .ops import fused_stta
        fused_ok = fused_stta.fused_supported(
            max(Dm, Dcav), max(Dm, Dcav), Yb, q, Dcav, bp.msg_cores.dtype)
        if (method == "sketch" and not bp.periodic and not tv
                and (yy_off is not None or tb.Pyy.shape[0] == 1)
                and Nb >= _BATCH_MIN_NODES
                and (fused_ok or _BATCH_MIN_NODES <= 1)):
            out_c, out_lz, bel_c, bel_lz, f = _bucket_update_batched(
                msgs_in_c, msgs_in_lz, msgs_out_old_c, msgs_out_old_lz,
                psi_out, in_m, Py_b, Pyp_b, Pxy_b, Py0_b, bp.phi[nb],
                ga.degree[nb], Pyy_b, trunc, Dm, Dcav, damp, key, yy_off)
            flat_idx = out_e.reshape(-1)
            new_cores = new_cores.at[flat_idx].set(
                out_c.reshape((Nb * Kb,) + out_c.shape[2:]), mode="drop")
            new_lz = new_lz.at[flat_idx].set(out_lz.reshape(-1), mode="drop")
            bel_c_all = bel_c_all.at[nb].set(bel_c)
            bel_lz_all = bel_lz_all.at[nb].set(bel_lz)
            f_all = f_all.at[nb].set(f)
            continue

        def node_fn(mi_c, mi_lz, mo_c, mo_lz, ps, mk, py, pyp, pxy, py0, ph,
                    dg, pyy):
            return _node_update(mi_c, mi_lz, mo_c, mo_lz, ps, mk, py, pyp,
                                pxy, py0, ph, dg, pyy, trunc, trunc_cav,
                                Dm, Dcav, damp, bp.periodic, method, key,
                                yy_off, direct_k3)

        def prep(tbl):  # broadcast tables (size-1 leading axis) are unmapped
            return (tbl, 0) if tbl.shape[0] == Nb else (tbl[0], None)

        py, ax_py = prep(Py_b)
        pyp, ax_pyp = prep(Pyp_b)
        pxy, ax_pxy = prep(Pxy_b)
        py0, ax_py0 = prep(Py0_b)
        pyy, ax_pyy = prep(Pyy_b)
        out_c, out_lz, bel_c, bel_lz, f = jax.vmap(
            node_fn,
            in_axes=(0, 0, 0, 0, 0, 0, ax_py, ax_pyp, ax_pxy, ax_py0, 0, 0,
                     ax_pyy),
        )(
            msgs_in_c, msgs_in_lz, msgs_out_old_c, msgs_out_old_lz, psi_out,
            in_m, py, pyp, pxy, py0, bp.phi[nb], ga.degree[nb], pyy,
        )

        # scatter new messages; padded slots carry out-edge id E -> dropped
        flat_idx = out_e.reshape(-1)
        new_cores = new_cores.at[flat_idx].set(
            out_c.reshape((Nb * Kb,) + out_c.shape[2:]), mode="drop")
        new_lz = new_lz.at[flat_idx].set(out_lz.reshape(-1), mode="drop")
        bel_c_all = bel_c_all.at[nb].set(bel_c)
        bel_lz_all = bel_lz_all.at[nb].set(bel_lz)
        f_all = f_all.at[nb].set(f)

    return MPBP(bp.tables, bp.phi, bp.psi, new_cores, new_lz,
                bel_c_all, bel_lz_all, f_all, ga, bp.graph, bp.periodic,
                bp.qs)


_bp_sweep_jit = bp_sweep


def bp_sweep(bp: MPBP, trunc: SVDTrunc, trunc_cav: SVDTrunc | None = None,
             Dcav: int | None = None, damp: float = 0.0,
             method: str = "qr") -> MPBP:
    """One synchronous (Jacobi) BP sweep — see :func:`_bp_sweep_jit`.

    This un-jitted shim records the platform the data actually lives on
    before tracing: the fused-Pallas admission gates (``ops/fused_stta``)
    run at trace time, where ``jax.default_backend()`` is "tpu" even for a
    CPU-committed lowering (e.g. the bench's host-CPU baseline phase).

    Limitation: when this shim is itself called under an outer ``jit`` or
    ``scan``, ``bp.msg_cores`` is a tracer and the platform cannot be read;
    the gates then fall back to ``jax.default_backend()``.  Call the shim
    from op-by-op code (or pin the default backend) when sweeping non-default
    devices from inside a transform.
    """
    from .ops import fused_stta
    fused_stta.set_active_platform(bp.msg_cores)
    return _bp_sweep_jit(bp, trunc, trunc_cav=trunc_cav, Dcav=Dcav,
                         damp=damp, method=method,
                         platform=fused_stta._active_platform())


#: the raw traceable sweep body (pre-jit): probes and outer-jit users scan
#: over ``bp_sweep.__wrapped__`` directly (scripts/probe_latency.py)
bp_sweep.__wrapped__ = _bp_sweep_jit.__wrapped__


@jax.jit
def _chunk_gather(msg_cores, msg_logz, psi, in_e, out_idx):
    """Per-chunk gather, jitted SEPARATELY from the compute.

    Keeping the gather in the compute executable lets XLA layout assignment
    propagate the fused kernels' batch-to-lanes layout through it onto the
    full message array: at the N=5e4/T=50/D=10 scale shape that plans a
    relayout copy of `f32[150000,51,10,10,4]` into a (8,128)-tiled T1-minor
    layout — T1 padded 51->128, 49 GB — and aborts compilation.  Across an
    executable boundary arrays stay in default layout, so any relayout copy
    the compute wants is confined to the chunk-sized gathered operands.
    """
    return (msg_cores[in_e], msg_logz[in_e], msg_cores[out_idx],
            msg_logz[out_idx], psi[out_idx])


def _chunk_update_body(msgs_in_c, msgs_in_lz, msgs_out_old_c, msgs_out_old_lz,
                       psi_out, in_m, deg, phi_b,
                       Py_b, Pyp_b, Pxy_b, Py0_b, Pyy_b, key, *, trunc,
                       trunc_cav, Dm, Dcav, damp, method, yy_off, use_batched,
                       periodic):
    """One node-chunk of a sweep: the traceable body shared by
    :func:`_chunk_update` (single chip) and the halo sweep's per-device
    bucketed update (``parallel/halo.py``)."""
    if use_batched:
        return _bucket_update_batched(
            msgs_in_c, msgs_in_lz, msgs_out_old_c, msgs_out_old_lz, psi_out,
            in_m, Py_b, Pyp_b, Pxy_b, Py0_b, phi_b, deg, Pyy_b, trunc, Dm,
            Dcav, damp, key, yy_off)

    Nb = msgs_in_c.shape[0]

    def node_fn(mi_c, mi_lz, mo_c, mo_lz, ps, mk, py, pyp, pxy, py0, ph, dg,
                pyy):
        return _node_update(mi_c, mi_lz, mo_c, mo_lz, ps, mk, py, pyp, pxy,
                            py0, ph, dg, pyy, trunc, trunc_cav, Dm, Dcav,
                            damp, periodic, method, key, yy_off, True)

    def prep(tbl):
        return (tbl, 0) if tbl.shape[0] == Nb else (tbl[0], None)

    py, ax_py = prep(Py_b)
    pyp, ax_pyp = prep(Pyp_b)
    pxy, ax_pxy = prep(Pxy_b)
    py0, ax_py0 = prep(Py0_b)
    pyy, ax_pyy = prep(Pyy_b)
    return jax.vmap(
        node_fn,
        in_axes=(0, 0, 0, 0, 0, 0, ax_py, ax_pyp, ax_pxy, ax_py0, 0, 0,
                 ax_pyy),
    )(msgs_in_c, msgs_in_lz, msgs_out_old_c, msgs_out_old_lz, psi_out, in_m,
      py, pyp, pxy, py0, phi_b, deg, pyy)


@partial(jax.jit, static_argnames=("trunc", "trunc_cav", "Dm", "Dcav",
                                   "damp", "method", "yy_off", "use_batched",
                                   "periodic", "platform"))
def _chunk_update(msgs_in_c, msgs_in_lz, msgs_out_old_c, msgs_out_old_lz,
                  psi_out, in_m, deg, phi_b,
                  Py_b, Pyp_b, Pxy_b, Py0_b, Pyy_b, key, *, trunc, trunc_cav,
                  Dm, Dcav, damp, method, yy_off, use_batched, periodic,
                  platform=None):
    """One node-chunk of a sweep (jitted once per chunk/bucket shape).

    Operates on pre-gathered chunk arrays (see :func:`_chunk_gather` for why
    the gather must not live in this executable).
    """
    return _chunk_update_body(
        msgs_in_c, msgs_in_lz, msgs_out_old_c, msgs_out_old_lz, psi_out,
        in_m, deg, phi_b, Py_b, Pyp_b, Pxy_b, Py0_b, Pyy_b, key, trunc=trunc,
        trunc_cav=trunc_cav, Dm=Dm, Dcav=Dcav, damp=damp, method=method,
        yy_off=yy_off, use_batched=use_batched, periodic=periodic)


@partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(buf, idx, vals):
    """buf.at[idx].set(vals) with drop semantics, donating buf (no copy)."""
    return buf.at[idx].set(vals, mode="drop")


def bp_sweep_chunked(bp: MPBP, trunc: SVDTrunc,
                     trunc_cav: SVDTrunc | None = None,
                     Dcav: int | None = None, damp: float = 0.0,
                     method: str = "sketch", chunk: int = 1024,
                     schedule: str = "jacobi",
                     rng: np.random.Generator | None = None) -> MPBP:
    """Memory-bounded Jacobi sweep for large graphs.

    :func:`bp_sweep` is one jit whose peak HBM temp grows with N*T1*D^2 —
    ~8 GB already at the N=4096/T=15/D=10 bench shape (measured) — so graphs
    beyond ~10^4 nodes cannot sweep on a 16 GB chip.  This variant processes
    each degree bucket in fixed-size node ``chunk``s, each a separately
    jitted update (compiled once per bucket shape, cached across chunks and
    sweeps), and scatters results with donated buffers.  Peak temp is
    O(chunk * K * T1 * D^2) regardless of N; the full message/belief arrays
    are the only O(N) residents.  Identical math to :func:`bp_sweep`
    (Jacobi: every chunk reads the pre-sweep messages).

    This is the single-chip leg of the BASELINE scale target (SIS ER
    N=10^5, T=50); the multi-chip halo path (``parallel/halo.py``) shards
    the same chunked sweep across devices.

    ``schedule='seidel'`` makes each chunk read the messages already updated
    by earlier chunks of the SAME sweep (Gauss–Seidel — the reference's
    live-update asynchronous semantics, ``mpbp.jl:190-195``); pass ``rng``
    to shuffle the node order within each degree bucket per sweep (the
    reference reshuffles every sweep, ``mpbp.jl:195``).  Seidel information
    flow helps convergence on loopy graphs where Jacobi oscillates.
    """
    if schedule not in ("jacobi", "seidel"):
        raise ValueError(f"unknown schedule {schedule!r}")
    trunc_cav = trunc if trunc_cav is None else trunc_cav
    Dm = bp.D
    Dcav = Dm if Dcav is None else Dcav
    g = bp.graph
    N, E = g.N, g.E
    q = bp.q
    tb = bp.tables
    tv = tb.time_varying
    yy_off = tb.yy_off
    Yg = tb.Y
    key = jax.random.PRNGKey(17)
    from .ops import fused_stta
    fused_stta.set_active_platform(bp.msg_cores)

    out_edges_h = g.out_edges                  # host; property is O(E)
    # fresh copies: _scatter_rows DONATES its buffer, and the pre-sweep
    # arrays must stay intact — chunks keep reading them (Jacobi), and the
    # caller's ``bp`` still references them
    new_cores, new_lz = jnp.copy(bp.msg_cores), jnp.copy(bp.msg_logz)
    bel_c_all = jnp.copy(bp.bel_cores)
    bel_lz_all = jnp.copy(bp.bel_logz)
    f_all = jnp.copy(bp.f)

    for idx, Kb in _degree_buckets(g):
        if rng is not None:
            idx = rng.permutation(idx)
        if tb.ydims is not None:
            Yb = max(1, min(Yg, tb.ydims[min(Kb, len(tb.ydims) - 1)]))
            if yy_off is not None:
                Yb = max(Yb, yy_off + 1)
        else:
            Yb = Yg

        def nsel(t, nb):
            return t if t.shape[0] == 1 else t[nb]

        fused_ok = fused_stta.fused_supported(
            max(Dm, Dcav), max(Dm, Dcav), Yb, q, Dcav, bp.msg_cores.dtype)
        use_batched = bool(
            method == "sketch" and not bp.periodic and not tv
            and (yy_off is not None or tb.Pyy.shape[0] == 1)
            and min(len(idx), chunk) >= _BATCH_MIN_NODES
            and (fused_ok or _BATCH_MIN_NODES <= 1))

        for lo in range(0, len(idx), chunk):
            ids = idx[lo:lo + chunk]
            nb_real = len(ids)
            pad = chunk - nb_real if len(idx) > chunk else 0
            # padded rows gather node 0 (harmless) and scatter to dropped
            # indices (edge E / node N)
            ids_g = np.concatenate([ids, np.zeros(pad, ids.dtype)])
            in_e = jnp.asarray(g.in_edges[ids_g][:, :Kb])
            in_m = jnp.asarray(g.in_mask[ids_g][:, :Kb])
            out_e = out_edges_h[ids_g][:, :Kb].copy()
            if pad:
                out_e[nb_real:] = E
            out_idx = jnp.asarray(np.minimum(out_e, E - 1))
            nb_j = jnp.asarray(ids_g)
            deg = jnp.asarray(g.degree[ids_g])

            Py_b = nsel(tb.Py, nb_j)[..., :Yb]
            Pyp_b = nsel(tb.Pyp, nb_j)[:, :Kb][..., :Yb]
            Pxy_b = nsel(tb.Pxy, nb_j)[:, :Kb][..., :Yb, :, :]
            Py0_b = nsel(tb.Py0, nb_j)[..., :Yb, :]
            if yy_off is None:
                Pyy_b = nsel(tb.Pyy, nb_j)[:, :min(Kb, tb.Pyy.shape[1])]
                Pyy_b = Pyy_b[..., :Yb, :Yb, :Yb, :]
            else:
                Pyy_b = nsel(tb.Pyy, nb_j)

            if schedule == "seidel":
                # live messages: chunks see earlier chunks' updates
                g_in_c, g_in_lz, g_out_c, g_out_lz, g_psi = _chunk_gather(
                    new_cores, new_lz, bp.psi, in_e, out_idx)
            else:
                g_in_c, g_in_lz, g_out_c, g_out_lz, g_psi = _chunk_gather(
                    bp.msg_cores, bp.msg_logz, bp.psi, in_e, out_idx)
            out_c, out_lz, bel_c, bel_lz, f = _chunk_update(
                g_in_c, g_in_lz, g_out_c, g_out_lz, g_psi, in_m, deg,
                bp.phi[nb_j], Py_b, Pyp_b, Pxy_b, Py0_b, Pyy_b, key,
                trunc=trunc, trunc_cav=trunc_cav, Dm=Dm, Dcav=Dcav,
                damp=damp, method=method, yy_off=yy_off,
                use_batched=use_batched, periodic=bp.periodic,
                platform=fused_stta._active_platform())

            flat_idx = jnp.asarray(out_e.reshape(-1))
            Kc = out_c.shape[1]
            new_cores = _scatter_rows(
                new_cores, flat_idx,
                out_c.reshape((out_c.shape[0] * Kc,) + out_c.shape[2:]))
            new_lz = _scatter_rows(new_lz, flat_idx, out_lz.reshape(-1))
            bel_idx = jnp.asarray(
                np.concatenate([ids, np.full(pad, N, ids.dtype)]))
            bel_c_all = _scatter_rows(bel_c_all, bel_idx, bel_c)
            bel_lz_all = _scatter_rows(bel_lz_all, bel_idx, bel_lz)
            f_all = _scatter_rows(f_all, bel_idx, f)

    return MPBP(bp.tables, bp.phi, bp.psi, new_cores, new_lz,
                bel_c_all, bel_lz_all, f_all, bp.garrays, bp.graph,
                bp.periodic, bp.qs)


# ---------------------------------------------------------------------------
# driver & observables
# ---------------------------------------------------------------------------

class CB_BP:
    """Per-sweep observability callback (reference ``CB_BP``,
    ``mpbp.jl:157-183``): records the marginal-mean trajectory and the
    convergence Δ history.  Pass as ``callback=`` to :func:`iterate`; the Δ
    computed by ``iterate`` (marginals *and* free-energy ledger) is recorded.

    >>> cb = CB_BP()
    >>> bp, n, _ = iterate(bp, maxiter=20, callback=cb)
    >>> cb.Delta   # [n] convergence history
    >>> cb.m       # list of [N, T1] mean trajectories, one per sweep
    """

    def __init__(self, values: jax.Array | None = None):
        self.values = values
        self.m: list = []
        self.Delta: list = []

    def __call__(self, bp: MPBP, it: int, delta: float) -> float:
        self.m.append(np.asarray(means(bp, self.values)))
        self.Delta.append(delta)
        return delta


def iterate(bp: MPBP, maxiter: int = 5, trunc: SVDTrunc | None = None,
            tol: float = 1e-10, damp: float = 0.0,
            trunc_cav: SVDTrunc | None = None, Dcav: int | None = None,
            callback=None, method: str = "qr", chunk: int | None = None,
            polish: int = 0, schedule: str = "jacobi", shuffle: bool = False,
            seed: int = 0):
    """Run sweeps until the marginals stop moving (reference ``iterate!``).

    ``chunk``: process nodes in chunks of this size per sweep
    (:func:`bp_sweep_chunked`) — required for graphs whose whole-sweep
    working set exceeds device memory (N over ~10^4 on one chip).

    ``schedule='seidel'`` + ``shuffle=True`` reproduce the reference's
    asynchronous semantics (``mpbp.jl:190-195``: node order reshuffled each
    sweep, messages updated live): chunks within a sweep see earlier chunks'
    fresh messages, which breaks the period-2 oscillations Jacobi BP can
    enter on loopy graphs (frustrated cycles).  Both options route through
    :func:`bp_sweep_chunked` (``chunk`` defaults to 1024 when unset).

    ``polish``: after convergence (or ``maxiter``), run this many extra
    deterministic sweeps (``method='qr'``) under full-f32 matmul precision.
    On TPU the fast path's f32 matmuls run at the default (bf16-pass)
    precision, which leaves ~1e-3-level noise in the converged beliefs; the
    polish sweeps remove both the sketch randomization and the matmul
    rounding at a once-per-run cost, turning the fast-path answer into a
    deterministic one.

    Returns (bp, n_iters, deltas)."""
    trunc = default_truncator() if trunc is None else trunc
    if schedule not in ("jacobi", "seidel"):
        raise ValueError(f"unknown schedule {schedule!r}")
    rng = np.random.default_rng(seed) if shuffle else None
    if (schedule == "seidel" or shuffle) and chunk is None:
        chunk = 1024
    m_old = beliefs(bp)
    f_old = bp.f
    deltas = []
    n_done = maxiter
    for it in range(maxiter):
        if chunk is not None:
            bp = bp_sweep_chunked(bp, trunc, trunc_cav, Dcav, damp, method,
                                  chunk, schedule=schedule, rng=rng)
        else:
            bp = bp_sweep(bp, trunc, trunc_cav, Dcav, damp, method)
        m_new = beliefs(bp)
        # convergence on marginals AND free-energy contributions: under hard
        # observations beliefs can freeze a sweep before the f ledger settles
        delta = float(jnp.maximum(jnp.max(jnp.abs(m_new - m_old)),
                                  jnp.max(jnp.abs(bp.f - f_old))))
        deltas.append(delta)
        if callback is not None:
            callback(bp, it, delta)
        if delta < tol:
            n_done = it + 1
            break
        m_old, f_old = m_new, bp.f
    for _ in range(polish):
        with jax.default_matmul_precision("float32"):
            if chunk is not None:
                bp = bp_sweep_chunked(bp, trunc, trunc_cav, Dcav, 0.0, "qr",
                                      chunk)
            else:
                bp = bp_sweep(bp, trunc, trunc_cav, Dcav, 0.0, "qr")
    return bp, n_done, deltas


def beliefs(bp: MPBP) -> jax.Array:
    """Single-site time marginals [N, T1, q] (reference ``beliefs``)."""
    return jax.vmap(
        lambda c, z: marginals(TensorTrain(c, z, (bp.q,), bp.periodic)))(
        bp.bel_cores, bp.bel_logz)


def beliefs_tu(bp: MPBP, maxdist: int | None = None) -> jax.Array:
    """Two-time marginals [N, T1, T1, q, q] (reference ``beliefs_tu``)."""
    return jax.vmap(
        lambda c, z: twovar_marginals(TensorTrain(c, z, (bp.q,), bp.periodic),
                                      maxdist)
    )(bp.bel_cores, bp.bel_logz)


def means(bp: MPBP, values: jax.Array | None = None) -> jax.Array:
    """<f(x_i^t)> with f given as a value table [q] (default 0..q-1)."""
    v = jnp.arange(bp.q, dtype=bp.phi.dtype) if values is None else values
    return jnp.einsum("ntq,q->nt", beliefs(bp), v)


def autocorrelations(bp: MPBP, values: jax.Array | None = None,
                     maxdist: int | None = None) -> jax.Array:
    """<f(x_i^t) f(x_i^u)> for t < u, [N, T1, T1] (reference
    ``autocorrelations``, ``mpbp.jl:245-255``)."""
    v = jnp.arange(bp.q, dtype=bp.phi.dtype) if values is None else values
    tu = beliefs_tu(bp, maxdist)
    return jnp.einsum("ntupq,p,q->ntu", tu, v, v)


def autocovariances(bp: MPBP, values: jax.Array | None = None,
                    maxdist: int | None = None) -> jax.Array:
    """Autocorrelations minus the product of means (``mpbp.jl:288-296``)."""
    r = autocorrelations(bp, values, maxdist)
    m = means(bp, values)
    c = r - m[:, :, None] * m[:, None, :]
    # only entries t < u are meaningful; zero the rest like `r` does
    T1 = m.shape[1]
    mask = jnp.triu(jnp.ones((T1, T1), bool), k=1)
    return c * mask[None]


def pair_beliefs(bp: MPBP):
    """Per-directed-edge pair marginals [E, T1, q, q] and per-node logz
    contributions (reference ``pair_beliefs``/``_pair_beliefs!``,
    ``mpbp.jl:200-235``)."""
    q = bp.q
    rev = jnp.asarray(bp.graph.rev_edge)
    mu_ij_c, mu_ij_z = bp.msg_cores, bp.msg_logz
    mu_ji_c, mu_ji_z = bp.msg_cores[rev], bp.msg_logz[rev]

    def one(cij, zij, cji, zji, psi_e):
        A = cij.reshape(cij.shape[0], bp.D, bp.D, q, q)
        Bt = cji.reshape(cij.shape[0], bp.D, bp.D, q, q)
        # b[t][(a,c),(b,d), xi, xj] = A[a,b,xi,xj] B[c,d,xj,xi] psi[xi,xj]
        M = jnp.einsum("tabij,tcdji,tij->tacbdij", A, Bt, psi_e)
        T1 = M.shape[0]
        cores = M.reshape(T1, bp.D * bp.D, bp.D * bp.D, q * q)
        tt = TensorTrain(cores, zij + zji, (q, q), bp.periodic)
        lg, _ = lognorm(tt)
        marg = marginals(tt).reshape(T1, q, q)
        return marg, lg

    marg, lg = jax.vmap(one)(mu_ij_c, mu_ij_z, mu_ji_c, mu_ji_z, bp.psi)
    # node logz: sum over incident edges (1/d_j - 1/2) log z_ij  (mpbp.jl:230)
    dst = jnp.asarray(bp.graph.edge_dst)
    deg = bp.garrays.degree.astype(marg.dtype)
    if bp.graph.infinite:
        # infinite-graph specialization: one stored edge stands for all k
        # incidences, weight 1/(k-1) - 1/2 (infinite_graph.jl:38-44,107-115)
        w = 1.0 / jnp.maximum(deg[dst] - 1, 1) - 0.5
    else:
        w = 1.0 / jnp.maximum(deg[dst], 1) - 0.5
    logz_nodes = jnp.zeros((bp.N,), marg.dtype).at[dst].add(w * lg)
    return marg, logz_nodes


def pair_lognorms(bp: MPBP) -> jax.Array:
    """log normalization of every directed-edge pair belief,
    log ẑ_ij = log sum_{x_i, x_j} mu_ij mu_ji psi_ij   [E].

    The per-edge quantity whose (1/d_j - 1/2)-weighted node assembly
    ``pair_beliefs`` returns (``mpbp.jl:218-235``)."""
    q = bp.q
    rev = jnp.asarray(bp.graph.rev_edge)

    def one(cij, zij, cji, zji, psi_e):
        A = cij.reshape(cij.shape[0], bp.D, bp.D, q, q)
        Bt = cji.reshape(cij.shape[0], bp.D, bp.D, q, q)
        M = jnp.einsum("tabij,tcdji,tij->tacbdij", A, Bt, psi_e)
        cores = M.reshape(M.shape[0], bp.D * bp.D, bp.D * bp.D, q * q)
        lg, _ = lognorm(TensorTrain(cores, zij + zji, (q, q), bp.periodic))
        return lg

    return jax.vmap(one)(bp.msg_cores, bp.msg_logz, bp.msg_cores[rev],
                         bp.msg_logz[rev], bp.psi)


@partial(jax.jit, static_argnames=("trunc", "Dcav", "method"))
def belief_lognorms(bp: MPBP, trunc: SVDTrunc | None = None,
                    Dcav: int | None = None, method: str = "qr") -> jax.Array:
    """log ẑ_i: normalization of each node's belief *rebuilt from the stored
    (normalized) messages* — the reference's
    ``logzᵢ = log(normalization(bp.b[i]))`` (``mpbp.jl:135``) recomputed
    without mutating state.  [N]."""
    trunc = TruncThresh(0.0) if trunc is None else trunc
    Dm = bp.D
    Dc = Dm if Dcav is None else Dcav
    ga = bp.garrays
    N, K = ga.in_edges.shape
    q = bp.q
    out_idx = jnp.minimum(ga.out_edges, bp.graph.E - 1)
    psi_out = bp.psi[out_idx]
    key = jax.random.PRNGKey(17)

    def node_fn(mi_c, mi_lz, ps, mk, py, pxy, py0, ph, pyy):
        T1 = mi_c.shape[1]
        Y = py0.shape[-2]
        dtype = mi_c.dtype
        A = mi_c.reshape(K, T1, Dm, Dm, q, q)
        if pxy.ndim == 5:
            B = jnp.einsum("ktyci,ktic,ktmnci->ktmnyi", pxy, ps, A)
        else:
            B = jnp.einsum("kyci,ktic,ktmnci->ktmnyi", pxy, ps, A)
        ident = jnp.zeros((T1, Dm, Dm, Y, q), dtype)
        ident = ident.at[:, 0, 0].set(jnp.broadcast_to(py0, (T1, Y, q)))
        B = jnp.where(mk[:, None, None, None, None, None], B, ident[None])
        B = B.reshape(K, T1, Dm, Dm, Y * q)
        Blz = jnp.where(mk, mi_lz, 0.0)

        nYY = pyy.shape[0]
        yy_off = bp.tables.yy_off
        Lc, Llz = _embed_first(B[0], Blz[0], pyy[0], py0, yy_off)
        from .ops.tensortrain import _fit_axis
        Lc = _fit_axis(_fit_axis(Lc, 1, Dc), 2, Dc)

        def pstep(carry, xs):
            Lc, Llz = carry
            Bk, Bklz, pyy_k = xs
            out = _merge(Lc, Llz, Bk, Bklz, pyy_k, trunc, Dc, Y, q,
                         bp.periodic, method, key, yy_off)
            return out, None

        if K > 1:
            pyy_pref = jnp.stack(
                [pyy[min(k, nYY - 1)] for k in range(1, K)])
            (Lc, Llz), _ = jax.lax.scan(pstep, (Lc, Llz),
                                        (B[1:], Blz[1:], pyy_pref))

        Wb = py[..., None, :]
        B3b, B3blz = _f_bp_partial(Lc, Llz, Wb, ph, 1, bp.periodic)
        B3b = B3b.reshape(T1, B3b.shape[1], B3b.shape[2], q, 1, q)
        bel2 = (mpem3_to_mpem2_periodic(B3b, B3blz) if bp.periodic
                else mpem3_to_mpem2(B3b, B3blz))
        lg, _ = lognorm(bel2)
        return lg

    tb = bp.tables

    def prep(tbl):
        return (tbl, 0) if tbl.shape[0] == N else (tbl[0], None)

    py, ax_py = prep(tb.Py)
    pxy, ax_pxy = prep(tb.Pxy)
    py0, ax_py0 = prep(tb.Py0)
    pyy, ax_pyy = prep(tb.Pyy)
    return jax.vmap(
        node_fn, in_axes=(0, 0, 0, 0, ax_py, ax_pxy, ax_py0, 0, ax_pyy)
    )(bp.msg_cores[ga.in_edges], bp.msg_logz[ga.in_edges], psi_out,
      ga.in_mask, py, pxy, py0, bp.phi, pyy)


def bethe_free_energy_pair(bp: MPBP, trunc: SVDTrunc | None = None,
                           Dcav: int | None = None) -> jax.Array:
    """Bethe free energy assembled through the *pair route*:

        F = sum_i [ -log ẑ_i + 1/2 sum_{j in ∂i} log ẑ_ij ]

    with ẑ_i the belief normalizations (:func:`belief_lognorms`) and ẑ_ij the
    pair normalizations (:func:`pair_lognorms`).  At a BP fixed point this is
    the textbook Bethe identity and equals :func:`bethe_free_energy` (whose
    ledger accumulates ``f_i = (d_i/2-1) log ẑ_i - 1/2 Σ_j log z_{i→j}``
    during the sweep, ``mpbp.jl:136``; the two agree because
    ``ẑ_ij = ẑ_i / z_{i→j}`` at the fixed point).

    Works on finite and symmetry-collapsed infinite graphs alike: the
    half-sum over incident edges rides the ``in_edges`` aliasing, so on an
    infinite k-regular graph the single stored edge is counted k times
    (matching the per-node free energy ``infinite_graph.jl:38-44``).
    """
    lz_i = belief_lognorms(bp, trunc=trunc, Dcav=Dcav)
    lz_e = pair_lognorms(bp)                           # [E]
    ga = bp.garrays
    lz_pad = jnp.concatenate([lz_e, jnp.zeros((1,), lz_e.dtype)])
    half = 0.5 * jnp.sum(
        jnp.where(ga.in_mask, lz_pad[ga.in_edges], 0.0), axis=1)
    return jnp.sum(-lz_i + half)


def pair_beliefs_as_tt(bp: MPBP):
    """Pair beliefs in tensor-train form: batched cores
    [E, T1, D*D, D*D, q*q] + logz (reference ``pair_beliefs_as_mpem``,
    ``mpbp.jl:208-216``)."""
    q = bp.q
    rev = jnp.asarray(bp.graph.rev_edge)

    def one(cij, zij, cji, zji, psi_e):
        T1 = cij.shape[0]
        A = cij.reshape(T1, bp.D, bp.D, q, q)
        Bt = cji.reshape(T1, bp.D, bp.D, q, q)
        M = jnp.einsum("tabij,tcdji,tij->tacbdij", A, Bt, psi_e)
        return M.reshape(T1, bp.D * bp.D, bp.D * bp.D, q * q), zij + zji

    return jax.vmap(one)(bp.msg_cores, bp.msg_logz, bp.msg_cores[rev],
                         bp.msg_logz[rev], bp.psi)


#: reference name for :func:`pair_beliefs_as_tt` (``mpbp.jl:208-216``)
pair_beliefs_as_mpem = pair_beliefs_as_tt


def pair_correlations(bp: MPBP, values: jax.Array | None = None) -> jax.Array:
    v = jnp.arange(bp.q, dtype=bp.phi.dtype) if values is None else values
    pb, _ = pair_beliefs(bp)
    return jnp.einsum("etpq,p,q->et", pb, v, v)


def alternate_marginals(bp: MPBP) -> jax.Array:
    """p(x_i^t, x_j^{t+1}) per directed edge, [E, T, q, q] (reference
    ``alternate_marginals``, ``mpbp.jl:270-280``)."""
    q = bp.q
    rev = jnp.asarray(bp.graph.rev_edge)

    def one(cij, zij, cji, zji, psi_e):
        T1 = cij.shape[0]
        A = cij.reshape(T1, bp.D, bp.D, q, q)
        Bt = cji.reshape(T1, bp.D, bp.D, q, q)
        M = jnp.einsum("tabij,tcdji,tij->tacbdij", A, Bt, psi_e)
        cores = M.reshape(T1, bp.D * bp.D, bp.D * bp.D, q * q)
        tt = TensorTrain(cores, zij + zji, (q, q), bp.periodic)
        tv = twovar_marginals(tt, maxdist=1)  # [T1, T1, q*q, q*q]
        tv = tv.reshape(T1, T1, q, q, q, q)
        # p(x_i^t, x_j^{t+1}) = sum_{x_j^t, x_i^{t+1}} b(t, t+1)
        diag = jnp.stack([tv[t, t + 1].sum(axis=(1, 2)) for t in range(T1 - 1)])
        return diag

    return jax.vmap(one)(bp.msg_cores, bp.msg_logz, bp.msg_cores[rev],
                         bp.msg_logz[rev], bp.psi)


def alternate_correlations(bp: MPBP, values: jax.Array | None = None):
    v = jnp.arange(bp.q, dtype=bp.phi.dtype) if values is None else values
    am = alternate_marginals(bp)
    return jnp.einsum("etpq,p,q->et", am, v, v)


def bethe_free_energy(bp: MPBP) -> jax.Array:
    """sum_i f_i (reference ``bethe_free_energy``, ``mpbp.jl:298``)."""
    return jnp.sum(bp.f)


def logprob(bp: MPBP, x: np.ndarray) -> float:
    """Log posterior probability of a trajectory x[N, T1]
    (reference ``logprob``, ``mpbp.jl:301-324``)."""
    from .factors import transition_probs
    g = bp.graph
    x = jnp.asarray(x)
    N, T1 = x.shape
    nbr = jnp.asarray(np.minimum(g.nbr, g.N - 1))
    mask = jnp.asarray(g.in_mask)
    lp = jnp.sum(jnp.log(bp.phi[jnp.arange(N), 0, x[:, 0]]))
    for t in range(T1 - 1):
        xn = x[:, t][nbr]                                # [N, K]
        p = transition_probs(bp.tables.at_time(t), mask, xn, x[:, t])
        lp += jnp.sum(jnp.log(p[jnp.arange(N), x[:, t + 1]]))
        lp += jnp.sum(jnp.log(bp.phi[jnp.arange(N), t + 1, x[:, t + 1]]))
    src = jnp.asarray(g.edge_src)
    dst = jnp.asarray(g.edge_dst)
    for t in range(T1):
        lp += 0.5 * jnp.sum(jnp.log(bp.psi[jnp.arange(g.E), t, x[src, t],
                                           x[dst, t]]))
    return float(lp)


# ---------------------------------------------------------------------------
# resets (reference mpbp.jl:72-102)
# ---------------------------------------------------------------------------

def reset_messages(bp: MPBP) -> MPBP:
    fresh = mpbp(bp.graph, bp.tables, bp.T, bp.D, dtype=bp.phi.dtype,
                 periodic=bp.periodic)
    return dataclasses.replace(bp, msg_cores=fresh.msg_cores,
                               msg_logz=fresh.msg_logz)


def reset_beliefs(bp: MPBP) -> MPBP:
    fresh = mpbp(bp.graph, bp.tables, bp.T, bp.D, dtype=bp.phi.dtype,
                 periodic=bp.periodic)
    return dataclasses.replace(bp, bel_cores=fresh.bel_cores,
                               bel_logz=fresh.bel_logz)


def reset_observations(bp: MPBP) -> MPBP:
    return dataclasses.replace(bp, phi=jnp.ones_like(bp.phi),
                               psi=jnp.ones_like(bp.psi))


def reset(bp: MPBP, messages: bool = True, beliefs: bool = True,
          observations: bool = False) -> MPBP:
    """Combined reset (reference ``reset!``, ``mpbp.jl:97-102``)."""
    if messages:
        bp = reset_messages(bp)
    if beliefs:
        bp = reset_beliefs(bp)
    if observations:
        bp = reset_observations(bp)
    return bp


# ---------------------------------------------------------------------------
# small accessors / conveniences (reference mpbp.jl:35-37, 105-114, 241-243,
# 399-409)
# ---------------------------------------------------------------------------

def periodic_mpbp(graph: Graph, tables: RecursiveFactorTables, T: int, D: int,
                  phi=None, psi=None, dtype=jnp.float64) -> MPBP:
    """Trace-closed (periodic-in-time) state (reference ``periodic_mpbp``,
    ``mpbp.jl:399-409``)."""
    return mpbp(graph, tables, T, D, phi=phi, psi=psi, dtype=dtype,
                periodic=True)


def is_periodic(bp: MPBP) -> bool:
    """Reference ``is_periodic`` (``mpbp.jl:113-114``)."""
    return bp.periodic


def is_free_dynamics(bp: MPBP) -> bool:
    """True iff no reweighting: every phi_i^t (but t=0 for open trains) is
    constant in x (reference ``is_free_dynamics``, ``mpbp.jl:105-111``)."""
    phi = np.asarray(bp.phi)                    # [N, T1, q]
    sl = phi if bp.periodic else phi[:, 1:]
    return bool(np.all(sl == sl[..., :1]))


def getT(bp: MPBP) -> int:
    """Final time index T (trains have T+1 cores; ``mpbp.jl:35``)."""
    return bp.T


def getN(bp: MPBP) -> int:
    return bp.N


def nstates(bp: MPBP, i: int | None = None) -> int:
    """Number of single-variable states of node ``i`` (reference
    ``nstates(bp, i)``, ``mpbp.jl:37``).  Heterogeneous-q states built with
    ``mpbp(..., qs=...)`` report the per-node count; otherwise the global
    padded ``q``."""
    if i is not None and bp.qs is not None:
        return int(bp.qs[i])
    return bp.q


def expectation(f, p):
    """<f(x)> under a vector pmf, or <f(xi) f(xj)> under a matrix pmf
    (reference ``expectation``, ``mpbp.jl:241-243``).  ``f`` is a callable on
    the 0-indexed state, or an array of per-state values."""
    p = np.asarray(p)
    q = p.shape[-1]
    v = np.asarray([f(x) for x in range(q)], dtype=p.dtype) \
        if callable(f) else np.asarray(f, dtype=p.dtype)
    if p.ndim == 2 and p.shape == (q, q):
        return np.einsum("ij,i,j->", p, v, v)
    return np.einsum("...i,i->...", p, v)
