"""Streaming two-sided sketch (STTA) compression — the matmul-only fast path.

Motivation (measured on TPU v5e through the axon tunnel): every stock
``lax.linalg`` decomposition has a ~14-220 ms latency floor at our batched
small-matrix shapes, and the BP sweep chains O(T * degree) of them — they
dominate the runtime.  The streaming tensor-train approximation (generalized
Nystrom for TT; cf. Kressner et al., "Streaming tensor train approximation",
2022) replaces *all* per-step decompositions with:

* a right-to-left and a left-to-right scan of small einsums (MXU matmuls)
  computing random sketches of every bond plus the projected cores, and
* ONE batched Cholesky solve for all time steps at once,

giving cores ``B_t = pinv(S_t W_{t+1}) . (S_{t-1} X_t W_{t+1})`` — an oblique
projection that is exact (a.s.) whenever the true bond rank is below the
sketch size, and quasi-optimal under truncation.  Numerator/cross matrices
are emitted *inside* the sketch scans so no O(T * bond^2) intermediate is
ever materialized.

Two entry points:
* ``merge_stta``: the cavity merge (Kronecker pair of trains contracted with
  the ``prob_yy`` tensor) -> bond ``Dout``, never materializing the D^2 bond.
* ``mpem3_stta``: the MPEM3 -> truncated MPEM2 message conversion in one shot
  (replacing the SVD regrouping sweep + compress), sketching the *virtual*
  regrouped train whose bond is (TT-bond, x_i-link).

These implement the ``method='sketch'`` fast path; the deterministic QR/SVD
path remains the default for the machine-precision gates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .pipeline import staggered_scan
from .smallalg import spd_solve_unrolled
from .sumy import y_expand
from .tensortrain import TensorTrain, _safe_scale, _fit_axis, \
    normalize_eachmatrix

__all__ = ["merge_stta", "mpem3_stta", "merge_stta_batched",
           "mpem3_stta_batched", "mpem3_stta_batched_tm"]


def _solve_batched(M, N, eps):
    """pinv(M) @ N via normal equations with an unrolled SPD solve.

    M: [..., sl, sr]; N: [..., sl, k] -> [..., sr, k].
    Uses ``spd_solve_unrolled`` (ops/smallalg.py) rather than
    ``lax.linalg.cholesky`` + triangular solves: at sr <= ~32 the stock
    kernels carry a ~14-220 ms per-call latency floor on TPU that dominates
    the sweep (CLAUDE.md)."""
    sr = M.shape[-1]
    G = jnp.einsum("...ij,...ik->...jk", M, M)
    tr = jnp.maximum(jnp.trace(G, axis1=-2, axis2=-1), 1e-30)
    Gj = G + (eps * tr / sr)[..., None, None] * jnp.eye(sr, dtype=M.dtype)
    rhs = jnp.einsum("...ij,...ik->...jk", M, N)
    return spd_solve_unrolled(Gj, rhs)


def _eps_for(dtype):
    return 1e-12 if dtype == jnp.float64 else 1e-6


def merge_stta(Lc, Llz, Bc, Blz, pyy, Dout: int, Y: int, q: int, key,
               oversample: int = 4, unroll: int | bool = True,
               yy_off: int | None = None):
    """Merge cavity trains L (x) B (prob_yy-contracted) -> bond Dout.

    Lc: [T1, DL, DL, Y*q]; Bc: [T1, DB, DB, Y*q] -> ([T1, Dout, Dout, Y*q], logz).
    ``pyy`` may carry a leading T1 axis (time-varying factors).
    """
    T1, DL = Lc.shape[0], Lc.shape[1]
    DB = Bc.shape[1]
    P = Y * q
    dtype = Lc.dtype
    eps = _eps_for(dtype)
    sr = min(Dout, DL * DB)
    sl = min(sr + oversample, DL * DB)

    Lf = Lc.reshape(T1, DL, DL, Y, q)
    Bf = Bc.reshape(T1, DB, DB, Y, q)
    if yy_off is None:
        pyy_t = jnp.broadcast_to(pyy, (T1,) + pyy.shape[-4:])  # [T1,Y,Y,Y,q]
    else:
        pyy_t = jnp.zeros((T1, 1), dtype)                  # placeholder
    kphi, kpsi = jax.random.split(key)
    phi = jax.random.normal(kphi, (T1, sl, sl, Y, q), dtype)
    psi = jax.random.normal(kpsi, (T1, sr, sr, Y, q), dtype)

    # Scan carries/stacks are kept as FLAT trailing axes: materialized scan
    # buffers get tiled TPU layouts, and a trailing axis of 2..14 pads each
    # (8, 128) tile by 9-32x in both HBM bytes and bandwidth (measured: 20.5x
    # expansion, 6% buffer utilization — PERF.md).  Reshapes inside the step
    # bodies are fusion-internal and free.
    Lfl = Lc.reshape(T1, DL * DL * P)
    Bfl = Bc.reshape(T1, DB * DB * P)

    # ---- right sketches W_t [DL, DB, sr]: sites t..T1-1 vs psi ------------
    def wstep(Wf, xs):
        Ltf, Btf, Pt, Pyyt = xs
        Lt = Ltf.reshape(DL, DL, Y, q)
        Bt = Btf.reshape(DB, DB, Y, q)
        W = Wf.reshape(DL, DB, sr)
        if yy_off is None:
            Th = jnp.einsum("abyx,yuvx->abuvx", Pt, Pyyt)
        else:
            # banded: Th[a,b,u,v,x] = Pt[a,b,u+v-off,x]
            Th = y_expand(Pt, yy_off, axis=2, mode="sum")
        t1 = jnp.einsum("mnvx,lnb->mlvxb", Bt, W)          # [mB, nL, y2, x, b]
        u = jnp.einsum("abuvx,mlvxb->mluxa", Th, t1)       # [mB, nL, y1, x, a]
        W2 = jnp.einsum("knux,mnuxa->kma", Lt, u)          # [mL, mB, a]
        W2 = W2 / _safe_scale(jnp.max(jnp.abs(W2)))
        W2f = W2.reshape(DL * DB * sr)
        return W2f, W2f

    W_end = jnp.zeros((DL * DB * sr,), dtype).at[0].set(1.0)
    _, Ws = jax.lax.scan(wstep, W_end, (Lfl[1:], Bfl[1:], psi[1:], pyy_t[1:]),
                         reverse=True, unroll=unroll)
    # Ws[t] = flat W_{t+1} (sketch of sites t+1..) for t = 0..T1-2

    # ---- forward pass: carry S_{t-1}; emit (N_t, M_{t-1}-aligned) ---------
    # For core t (t = 1..T1-1):
    #   N_t = S_{t-1} X_t W_{t+1}   (W_{T1} = boundary at t = T1-1)
    #   M_{t-1} = S_{t-1} W_t
    # The scan runs t = 1..T1-1, carrying S and emitting (N_t, M_{t-1}).
    def fstep(Sf, xs):
        Ltf, Btf, Ft, Wtf, Wt1f, Pyyt = xs
        Lt = Ltf.reshape(DL, DL, Y, q)
        Bt = Btf.reshape(DB, DB, Y, q)
        Wt = Wtf.reshape(DL, DB, sr)
        Wt1 = Wt1f.reshape(DL, DB, sr)
        S = Sf.reshape(sl, DL, DB)
        # cross matrix with the *incoming* sketch: M = S W_t
        Mt = jnp.einsum("ekm,kma->ea", S, Wt)
        # numerator: N = S X_t W_{t+1}
        t1 = jnp.einsum("ekm,knux->enmux", S, Lt)          # [e, nL, mB, y1, x]
        if yy_off is None:
            t2 = jnp.einsum("yuvx,enmux,mjvx->enjyx", Pyyt, t1, Bt)
        else:
            # t1T[e,n,m,y,v,x] = t1[e,n,m,y+off-v,x]
            t1T = y_expand(t1, yy_off, axis=3, mode="diff")
            t2 = jnp.einsum("enmyvx,mjvx->enjyx", t1T, Bt)
        # flatten the shared t2 intermediate so the fusion boundary gets a
        # lane-packed layout (it is consumed twice and must materialize)
        t2 = t2.reshape(sl, DL * DB * Y * q)
        t2u = t2.reshape(sl, DL, DB, Y, q)
        Nt = jnp.einsum("enjyx,njb->eyxb", t2u, Wt1)       # [e, Y, q, sr]
        # advance the sketch: S_t from S_{t-1}
        S2 = jnp.einsum("efyx,enjyx->fnj", Ft, t2u)        # [e', nL, nB]
        S2 = S2 / _safe_scale(jnp.max(jnp.abs(S2)))
        return S2.reshape(sl * DL * DB), (Nt.reshape(sl * P * sr),
                                          Mt.reshape(sl * sr))

    # site-0 partial contraction (row (0,0) of X_0): c0[nL, nB, y, x]
    if yy_off is None:
        c0 = jnp.einsum("yuvx,nux,jvx->njyx", pyy_t[0], Lf[0, 0], Bf[0, 0])
    else:
        LT = y_expand(Lf[0, 0], yy_off, axis=1, mode="diff")  # [n, y, v, x]
        c0 = jnp.einsum("nyvx,jvx->njyx", LT, Bf[0, 0])
    # S_0 = sketch including site 0 (phi_0 enters through its boundary row)
    S_init = jnp.einsum("fyx,njyx->fnj", phi[0, 0], c0)
    S_init = S_init / _safe_scale(jnp.max(jnp.abs(S_init)))
    S_init = S_init.reshape(sl * DL * DB)
    W_last = jnp.zeros((DL * DB * sr,), dtype).at[0].set(1.0)
    Wnext = jnp.concatenate([Ws[1:], W_last[None]], axis=0)  # W_{t+1}, t=1..T1-1
    _, (Ns, Ms) = jax.lax.scan(
        fstep, S_init, (Lfl[1:], Bfl[1:], phi[1:], Ws, Wnext, pyy_t[1:]),
        unroll=unroll)
    # Ns[j] = flat N_{j+1}, Ms[j] = flat M_j for j = 0..T1-2
    Ms = Ms.reshape(T1 - 1, sl, sr)

    # ---- first core: row (0,0) of X_0 against W_1 -------------------------
    v0 = jnp.einsum("njyx,njb->byx", c0,
                    Ws[0].reshape(DL, DB, sr)).reshape(sr, P)
    first = jnp.zeros((sr, sr, P), dtype).at[0].set(v0)

    # ---- interior + last cores via one batched solve ----------------------
    Bsol = _solve_batched(Ms, Ns.reshape(T1 - 1, sl, P * sr), eps)
    Bsol = Bsol.reshape(T1 - 1, sr, P, sr).transpose(0, 1, 3, 2)
    # last core: right bond is the boundary sketch (e0): col 0 only is real
    last = jnp.zeros((sr, sr, P), dtype).at[:, 0, :].set(Bsol[-1][:, 0, :])
    cores = jnp.concatenate([first[None], Bsol[:-1], last[None]], axis=0)
    cores = _fit_axis(_fit_axis(cores, 1, Dout), 2, Dout)
    tt = normalize_eachmatrix(TensorTrain(cores, Llz + Blz, (Y, q)))
    return tt.cores, tt.logz


def mpem3_stta(B3, logz, Dout: int, key, oversample: int = 4,
               unroll: int | bool = True):
    """MPEM3 stack -> bond-Dout MPEM2 train in one two-sided sketch.

    B3: [T1, Db, Db, qi, qj, qi'] (xi' couples adjacent sites diagonally).
    The virtual regrouped train (reference ``mpem2(::MPEM3)``) has bond
    (n, xi'); sketches carry that composite link.  Replaces the SVD sweep +
    compress of the deterministic path.
    """
    T1, Db, _, qi, qj, _ = B3.shape
    P = qi * qj
    dtype = B3.dtype
    eps = _eps_for(dtype)
    sr = min(Dout, Db * qi)
    sl = min(sr + oversample, max(Db * qi, 1))

    kphi, kpsi = jax.random.split(key)
    phi = jax.random.normal(kphi, (T1, sl, sl, qi, qj), dtype)
    psi = jax.random.normal(kpsi, (T1, sr, sr, qi, qj), dtype)

    # flat trailing axes for all scan-materialized buffers (see merge_stta:
    # tiled TPU layouts pad small trailing dims 9-32x — PERF.md)
    B3f = B3.reshape(T1, Db * Db * qi * qj * qi)

    # ---- right sketches W_t [Db, qi(link), sr] ----------------------------
    def wstep(Wf, xs):
        Btf, Pt = xs
        Bt = Btf.reshape(Db, Db, qi, qj, qi)
        W = Wf.reshape(Db, qi, sr)
        t1 = jnp.einsum("mnijr,nrc->mijc", Bt, W)
        W2 = jnp.einsum("mijc,bcij->mib", t1, Pt)
        W2 = W2 / _safe_scale(jnp.max(jnp.abs(W2)))
        W2f = W2.reshape(Db * qi * sr)
        return W2f, W2f

    # right boundary: col-0 TT bond, xi' index 0 (reference takes slice 0)
    W_end = jnp.zeros((Db * qi * sr,), dtype).at[0].set(1.0)
    _, Ws = jax.lax.scan(wstep, W_end, (B3f[1:], psi[1:]), reverse=True,
                         unroll=unroll)
    # Ws[t] = flat W_{t+1} for t = 0..T1-2

    # ---- forward pass: carry S_{t-1}, emit (N_t, M_{t-1}) -----------------
    def fstep(Sf, xs):
        Btf, Ft, Wtf, Wt1f = xs
        Bt = Btf.reshape(Db, Db, qi, qj, qi)
        Wt = Wtf.reshape(Db, qi, sr)
        Wt1 = Wt1f.reshape(Db, qi, sr)
        S = Sf.reshape(sl, Db, qi)
        Mt = jnp.einsum("emi,mib->eb", S, Wt)
        t1 = jnp.einsum("emi,mnijr->enijr", S, Bt)
        Nt = jnp.einsum("enijr,nrb->eijb", t1, Wt1)        # [e, qi, qj, sr]
        S2 = jnp.einsum("enijr,efij->fnr", t1, Ft)
        S2 = S2 / _safe_scale(jnp.max(jnp.abs(S2)))
        return S2.reshape(sl * Db * qi), (Nt.reshape(sl * P * sr),
                                          Mt.reshape(sl * sr))

    # S_0 = sketch including site 0 (TT row 0; xi-link of site 0 summed
    # uniformly on the left — the delta is inside the B3 contraction)
    S_init = jnp.einsum("fij,nijr->fnr", phi[0, 0], B3[0, 0])
    S_init = S_init / _safe_scale(jnp.max(jnp.abs(S_init)))
    S_init = S_init.reshape(sl * Db * qi)
    W_last = jnp.zeros((Db * qi * sr,), dtype).at[0].set(1.0)
    Wnext = jnp.concatenate([Ws[1:], W_last[None]], axis=0)
    _, (Ns, Ms) = jax.lax.scan(fstep, S_init, (B3f[1:], phi[1:], Ws, Wnext),
                               unroll=unroll)
    Ms = Ms.reshape(T1 - 1, sl, sr)

    # ---- first core -------------------------------------------------------
    c0 = jnp.einsum("nijr,nrb->ijb", B3[0, 0], Ws[0].reshape(Db, qi, sr))
    first = jnp.zeros((sr, sr, P), dtype).at[0].set(c0.reshape(P, sr).T)

    # ---- interior + last via one batched solve ----------------------------
    Bsol = _solve_batched(Ms, Ns.reshape(T1 - 1, sl, P * sr), eps)
    Bsol = Bsol.reshape(T1 - 1, sr, P, sr).transpose(0, 1, 3, 2)
    last = jnp.zeros((sr, sr, P), dtype).at[:, 0, :].set(Bsol[-1][:, 0, :])
    cores = jnp.concatenate([first[None], Bsol[:-1], last[None]], axis=0)
    cores = _fit_axis(_fit_axis(cores, 1, Dout), 2, Dout)
    return TensorTrain(cores, logz, (qi, qj))


# ---------------------------------------------------------------------------
# explicitly batched + software-pipelined variants
# ---------------------------------------------------------------------------
#
# Same algebra as merge_stta / mpem3_stta but with an explicit leading
# instance axis and G-way staggered time scans (ops/pipeline.py): the per-step
# einsums of *all* instances (and of G consecutive time steps) execute as one
# wave, so the latency-bound dependent chain (PERF.md) becomes
# throughput-bound.  The vmap-per-node forms above are kept for the periodic
# and halo paths; results agree to dtype precision (same sketches, same
# contractions — gated by tests/test_methods_consistency.py).

def _stagger_for(B: int, G: int | None):
    """Pick the stagger width: amortize per-step latency without inflating
    the (S+G-1)/S iteration overhead.  Instances below ~256 stay latency-
    bound anyway (measured batch-independence floor, PERF.md).

    ``MPBP_STAGGER`` (env, read at trace time) overrides the heuristic —
    perf-experiment knob only."""
    import os
    env = os.environ.get("MPBP_STAGGER")
    if env is not None:
        g = int(env)
    elif G is not None:
        g = G
    else:
        g = 1
    while g > 1 and B % g:
        g -= 1
    return g


def _group(a, G):
    """[S, B, ...] -> [S, G, B//G, ...]"""
    return a.reshape(a.shape[:1] + (G, a.shape[1] // G) + a.shape[2:])


def _ungroup_t(a):
    """[S, G, Bg, ...] -> [S, G*Bg, ...]"""
    return a.reshape(a.shape[:1] + (a.shape[1] * a.shape[2],) + a.shape[3:])


def merge_stta_batched(Lc, Llz, Bc, Blz, pyy, Dout: int, Y: int, q: int, key,
                       oversample: int = 4, yy_off: int | None = None,
                       stagger: int | None = None):
    """Batched cavity merge: Lc [B, T1, DL, DL, Y*q] (x) Bc [B, T1, DB, DB,
    Y*q] -> ([B, T1, Dout, Dout, Y*q], logz [B]).

    ``pyy`` is shared across instances: [Y, Y, Y, q] (dense) — or a
    placeholder when ``yy_off`` selects the banded sum-type merge.  Same
    sketches for every instance (matching the vmapped :func:`merge_stta`).
    """
    Bn, T1, DL = Lc.shape[0], Lc.shape[1], Lc.shape[2]
    DB = Bc.shape[2]
    P = Y * q
    dtype = Lc.dtype
    eps = _eps_for(dtype)
    sr = min(Dout, DL * DB)
    sl = min(sr + oversample, DL * DB)
    S = T1 - 1
    G = _stagger_for(Bn, stagger)
    Bg = Bn // G

    Lf = Lc.reshape(Bn, T1, DL, DL, Y, q)
    Bf = Bc.reshape(Bn, T1, DB, DB, Y, q)
    kphi, kpsi = jax.random.split(key)
    phi = jax.random.normal(kphi, (T1, sl, sl, Y, q), dtype)
    psi = jax.random.normal(kpsi, (T1, sr, sr, Y, q), dtype)

    # time-major, flat trailing dims for everything a scan touches (tiled-
    # layout padding, see merge_stta)
    Lfl = jnp.moveaxis(Lc, 0, 1).reshape(T1, Bn, DL * DL * P)
    Bfl = jnp.moveaxis(Bc, 0, 1).reshape(T1, Bn, DB * DB * P)

    # psi (.) pyy pre-mix shared across instances: Th[t,a,b,u,v,x]
    if yy_off is None:
        Th = jnp.einsum("tabyx,yuvx->tabuvx", psi, pyy)
    else:
        Th = y_expand(psi, yy_off, axis=3, mode="sum")

    # ---- right sketches W_t [DL, DB, sr] -----------------------------------
    def wstep(Wflat, xb, xsh):
        Ltf, Btf = xb
        Tht, = xsh
        Lt = Ltf.reshape(G, Bg, DL, DL, Y, q)
        Bt = Btf.reshape(G, Bg, DB, DB, Y, q)
        W = Wflat.reshape(G, Bg, DL, DB, sr)
        t1 = jnp.einsum("gzmnvx,gzlnb->gzmlvxb", Bt, W)
        u = jnp.einsum("gabuvx,gzmlvxb->gzmluxa", Tht, t1)
        W2 = jnp.einsum("gzklux,gzmluxa->gzkma", Lt, u)
        W2 = W2 / _safe_scale(
            jnp.max(jnp.abs(W2), axis=(2, 3, 4), keepdims=True))
        W2f = W2.reshape(G, Bg, DL * DB * sr)
        return W2f, W2f

    W_end = jnp.zeros((DL * DB * sr,), dtype).at[0].set(1.0)
    W_init = jnp.broadcast_to(W_end, (G, Bg, DL * DB * sr))
    _, Ws = staggered_scan(
        wstep, W_init, (_group(Lfl[1:], G), _group(Bfl[1:], G)), (Th[1:],),
        S, G, reverse=True)
    # Ws[t] = W_{t+1} (sketch of sites t+1..) for t = 0..T1-2; [S, G, Bg, F]

    # ---- site-0 boundary ----------------------------------------------------
    if yy_off is None:
        c0 = jnp.einsum("yuvx,znux,zjvx->znjyx", pyy, Lf[:, 0, 0], Bf[:, 0, 0])
    else:
        LT = y_expand(Lf[:, 0, 0], yy_off, axis=2, mode="diff")  # [z,n,y,v,x]
        c0 = jnp.einsum("znyvx,zjvx->znjyx", LT, Bf[:, 0, 0])
    S_init = jnp.einsum("fyx,znjyx->zfnj", phi[0, 0], c0)
    S_init = S_init / _safe_scale(
        jnp.max(jnp.abs(S_init), axis=(1, 2, 3), keepdims=True))
    S_init = S_init.reshape(G, Bg, sl * DL * DB)

    # ---- forward pass: carry S_{t-1}; emit (N_t, M_{t-1}) ------------------
    def fstep(Sflat, xb, xsh):
        Ltf, Btf, Wtf, Wt1f = xb
        Ft, Pyyt = xsh
        Lt = Ltf.reshape(G, Bg, DL, DL, Y, q)
        Bt = Btf.reshape(G, Bg, DB, DB, Y, q)
        Wt = Wtf.reshape(G, Bg, DL, DB, sr)
        Wt1 = Wt1f.reshape(G, Bg, DL, DB, sr)
        Sm = Sflat.reshape(G, Bg, sl, DL, DB)
        Mt = jnp.einsum("gzekm,gzkma->gzea", Sm, Wt)
        t1 = jnp.einsum("gzekm,gzknux->gzenmux", Sm, Lt)
        if yy_off is None:
            z1 = jnp.einsum("gyuvx,gzenmux->gzenmyvx", Pyyt, t1)
        else:
            z1 = y_expand(t1, yy_off, axis=5, mode="diff")
        t2 = jnp.einsum("gzenmyvx,gzmjvx->gzenjyx", z1, Bt)
        Nt = jnp.einsum("gzenjyx,gznjb->gzeyxb", t2, Wt1)
        S2 = jnp.einsum("gefyx,gzenjyx->gzfnj", Ft, t2)
        S2 = S2 / _safe_scale(
            jnp.max(jnp.abs(S2), axis=(2, 3, 4), keepdims=True))
        return S2.reshape(G, Bg, sl * DL * DB), (
            Nt.reshape(G, Bg, sl * P * sr), Mt.reshape(G, Bg, sl * sr))

    W_last = jnp.zeros((1, G, Bg, DL * DB * sr), dtype).at[..., 0].set(1.0)
    Wnext = jnp.concatenate([Ws[1:], W_last], axis=0)      # W_{t+1}, t=1..T1-1
    if yy_off is None:
        pyy_t = jnp.broadcast_to(pyy, (T1,) + pyy.shape)
    else:
        pyy_t = jnp.zeros((T1, 1), dtype)
    _, (Ns, Ms) = staggered_scan(
        fstep, S_init,
        (_group(Lfl[1:], G), _group(Bfl[1:], G), Ws, Wnext),
        (phi[1:], pyy_t[1:]), S, G)
    Ns = jnp.moveaxis(_ungroup_t(Ns), 0, 1)     # [B, S, sl*P*sr]
    Ms = jnp.moveaxis(_ungroup_t(Ms), 0, 1).reshape(Bn, S, sl, sr)

    # ---- first core ---------------------------------------------------------
    Ws0 = _ungroup_t(Ws)[0].reshape(Bn, DL, DB, sr)
    v0 = jnp.einsum("znjyx,znjb->zbyx", c0, Ws0).reshape(Bn, sr, P)
    first = jnp.zeros((Bn, sr, sr, P), dtype).at[:, 0].set(v0)

    # ---- interior + last cores via one batched solve -----------------------
    Bsol = _solve_batched(Ms, Ns.reshape(Bn, S, sl, P * sr), eps)
    Bsol = Bsol.reshape(Bn, S, sr, P, sr).transpose(0, 1, 2, 4, 3)
    last = jnp.zeros((Bn, sr, sr, P), dtype)
    last = last.at[:, :, 0, :].set(Bsol[:, -1][:, :, 0, :])
    cores = jnp.concatenate([first[:, None], Bsol[:, :-1], last[:, None]],
                            axis=1)
    cores = _fit_axis(_fit_axis(cores, 2, Dout), 3, Dout)
    # batched normalize_eachmatrix
    m = _safe_scale(jnp.max(jnp.abs(cores), axis=(2, 3, 4)))     # [B, T1]
    cores = cores / m[:, :, None, None, None]
    logz = Llz + Blz - jnp.sum(jnp.log(m), axis=1)
    return cores, logz


def mpem3_stta_batched(B3, logz, Dout: int, key, oversample: int = 4,
                       stagger: int | None = None):
    """Batched MPEM3 -> bond-Dout MPEM2: B3 [B, T1, Db, Db, qi, qj, qi'] ->
    (cores [B, T1, Dout, Dout, qi*qj], logz [B]).  Same sketches for every
    instance (matching the vmapped :func:`mpem3_stta`)."""
    Bn, T1, Db, _, qi, qj, _ = B3.shape
    B3f = jnp.moveaxis(B3, 0, 1).reshape(T1, Bn, Db * Db * qi * qj * qi)
    return _mpem3_stta_tm(B3f, logz, Db, qi, qj, Dout, key, oversample,
                          stagger, order="mnijr")


def mpem3_stta_batched_tm(B3f, logz, Db: int, qi: int, qj: int, Dout: int,
                          key, oversample: int = 4,
                          stagger: int | None = None):
    """Time-major-flat entry: B3f [T1, B, qi*qj*qi'*Db*Db] with column order
    ``(i, j, r, m, n)`` (r = qi', the t+1 physical leg; m, n = bonds).

    Callers at large batch use this to hand over B3 WITHOUT ever
    materializing the 7-D tensor: on TPU an 8-D ``concatenate``/einsum with
    tiny trailing dims gets a (2,128)-tiled layout padded up to ~13x — a
    16 GB HLO temp at the N=1e4/T=50 chunked-sweep shape (measured; see
    ``bp._bucket_update_batched``).  The flat [T1, B, cols] form is what the
    scans consume anyway, and pads ~1.0x.
    """
    return _mpem3_stta_tm(B3f, logz, Db, qi, qj, Dout, key, oversample,
                          stagger, order="ijrmn")


def _mpem3_stta_tm(B3f, logz, Db, qi, qj, Dout, key, oversample, stagger,
                   order):
    """Shared body; ``order`` names the flat-column layout of B3f."""
    T1, Bn = B3f.shape[0], B3f.shape[1]
    P = qi * qj
    dtype = B3f.dtype
    eps = _eps_for(dtype)
    sr = min(Dout, Db * qi)
    sl = min(sr + oversample, max(Db * qi, 1))
    S = T1 - 1
    G = _stagger_for(Bn, stagger)
    Bg = Bn // G

    kphi, kpsi = jax.random.split(key)
    phi = jax.random.normal(kphi, (T1, sl, sl, qi, qj), dtype)
    psi = jax.random.normal(kpsi, (T1, sr, sr, qi, qj), dtype)

    if order == "mnijr":
        shp = (Db, Db, qi, qj, qi)
        sub = "mnijr"
    else:
        shp = (qi, qj, qi, Db, Db)
        sub = "ijrmn"

    def bt(btf):
        return btf.reshape((G, Bg) + shp)

    # ---- right sketches W_t [Db, qi(link), sr] ------------------------------
    def wstep(Wflat, xb, xsh):
        Btf, = xb
        Pt, = xsh
        Bt = bt(Btf)
        W = Wflat.reshape(G, Bg, Db, qi, sr)
        t1 = jnp.einsum(f"gz{sub},gznrc->gzmijc", Bt, W)
        W2 = jnp.einsum("gzmijc,gbcij->gzmib", t1, Pt)
        W2 = W2 / _safe_scale(
            jnp.max(jnp.abs(W2), axis=(2, 3, 4), keepdims=True))
        W2f = W2.reshape(G, Bg, Db * qi * sr)
        return W2f, W2f

    W_end = jnp.zeros((Db * qi * sr,), dtype).at[0].set(1.0)
    W_init = jnp.broadcast_to(W_end, (G, Bg, Db * qi * sr))
    _, Ws = staggered_scan(wstep, W_init, (_group(B3f[1:], G),), (psi[1:],),
                           S, G, reverse=True)

    # ---- forward pass -------------------------------------------------------
    def fstep(Sflat, xb, xsh):
        Btf, Wtf, Wt1f = xb
        Ft, = xsh
        Bt = bt(Btf)
        Wt = Wtf.reshape(G, Bg, Db, qi, sr)
        Wt1 = Wt1f.reshape(G, Bg, Db, qi, sr)
        Sm = Sflat.reshape(G, Bg, sl, Db, qi)
        Mt = jnp.einsum("gzemi,gzmib->gzeb", Sm, Wt)
        t1 = jnp.einsum(f"gzemi,gz{sub}->gzenijr", Sm, Bt)
        Nt = jnp.einsum("gzenijr,gznrb->gzeijb", t1, Wt1)
        S2 = jnp.einsum("gzenijr,gefij->gzfnr", t1, Ft)
        S2 = S2 / _safe_scale(
            jnp.max(jnp.abs(S2), axis=(2, 3, 4), keepdims=True))
        return S2.reshape(G, Bg, sl * Db * qi), (
            Nt.reshape(G, Bg, sl * P * sr), Mt.reshape(G, Bg, sl * sr))

    B300 = B3f[0].reshape((Bn,) + shp)      # t = 0 row
    B300 = B300[:, 0] if order == "mnijr" else B300[..., 0, :]
    # B300: [z, n, i, j, r] (mnijr) or [z, i, j, r, n] (ijrmn)
    sub0 = "znijr" if order == "mnijr" else "zijrn"
    S_init = jnp.einsum(f"fij,{sub0}->zfnr", phi[0, 0], B300)
    S_init = S_init / _safe_scale(
        jnp.max(jnp.abs(S_init), axis=(1, 2, 3), keepdims=True))
    S_init = S_init.reshape(G, Bg, sl * Db * qi)
    W_last = jnp.zeros((1, G, Bg, Db * qi * sr), dtype).at[..., 0].set(1.0)
    Wnext = jnp.concatenate([Ws[1:], W_last], axis=0)
    _, (Ns, Ms) = staggered_scan(
        fstep, S_init, (_group(B3f[1:], G), Ws, Wnext), (phi[1:],), S, G)
    Ns = jnp.moveaxis(_ungroup_t(Ns), 0, 1)
    Ms = jnp.moveaxis(_ungroup_t(Ms), 0, 1).reshape(Bn, S, sl, sr)

    # ---- first core ---------------------------------------------------------
    Ws0 = _ungroup_t(Ws)[0].reshape(Bn, Db, qi, sr)
    c0 = jnp.einsum(f"{sub0},znrb->zijb", B300, Ws0)
    first = jnp.zeros((Bn, sr, sr, P), dtype)
    first = first.at[:, 0].set(
        c0.reshape(Bn, P, sr).transpose(0, 2, 1))

    # ---- interior + last via one batched solve ------------------------------
    Bsol = _solve_batched(Ms, Ns.reshape(Bn, S, sl, P * sr), eps)
    Bsol = Bsol.reshape(Bn, S, sr, P, sr).transpose(0, 1, 2, 4, 3)
    last = jnp.zeros((Bn, sr, sr, P), dtype)
    last = last.at[:, :, 0, :].set(Bsol[:, -1][:, :, 0, :])
    cores = jnp.concatenate([first[:, None], Bsol[:, :-1], last[:, None]],
                            axis=1)
    cores = _fit_axis(_fit_axis(cores, 2, Dout), 3, Dout)
    return cores, logz
