"""Randomized structured rounding of the cavity merge.

The BP cavity merge (reference ``op`` at ``recursive_bp_factor.jl:117-131``)
builds the Kronecker-product train

    X_t[(mL,mB), (nL,nB), (y,x)] = sum_{y1,y2} Pyy[y,y1,y2,x] L_t[mL,nL,y1,x]
                                                             B_t[mB,nB,y2,x]

with bond DL*DB and immediately re-compresses it.  The deterministic path
(QR orthogonalization + truncating SVD) materializes the D^4 intermediate and
runs two sweeps of large decompositions — on TPU those small-matrix QR/SVD
kernels are latency-bound and dominate the sweep.

This module implements randomized TT rounding (sketch-project, cf. Al Daas,
Ballard, Benner et al., "Randomized algorithms for rounding in the tensor
train format", 2021) *directly on the Kronecker factors*:

1. right-to-left sketch pass: W_t = partial contraction of X_{t..T} with a
   random Gaussian train of bond ``s`` — einsums over the factors, never
   forming DL*DB x DL*DB matrices;
2. left-to-right projection pass: the only decomposition is a QR of the tiny
   ``[s*P, s]`` sketch; cores come out left-orthogonal with bond ``s``;
3. a final (cheap, bond-``s``) truncating SVD sweep applies the caller's
   truncation policy down to ``Dout``.

With ``s >= rank`` the result is exact almost surely (a Gaussian sketch of a
rank-k subspace with >= k columns captures it with probability 1), so the
accuracy gates hold; with truncation it is quasi-optimal.  Cost per step is
matmul-dominated -> MXU, and both memory and decomposition sizes are
independent of DL*DB.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .kernels import cholqr
from .sumy import y_expand
from .tensortrain import TensorTrain, _safe_scale, _sweep_truncate_rl, \
    normalize_eachmatrix
from .truncation import SVDTrunc

__all__ = ["merge_rounded"]


def merge_rounded(Lc, Llz, Bc, Blz, pyy, trunc: SVDTrunc, Dout: int, Y: int,
                  q: int, key, oversample: int = 2,
                  yy_off: int | None = None):
    """Merge two cavity trains and round to bond ``Dout`` without ever
    materializing the Kronecker bond.  Open (non-periodic) trains only.

    Lc: [T1, DL, DL, Y*q]; Bc: [T1, DB, DB, Y*q]. Returns (cores, logz) with
    cores [T1, Dout, Dout, Y*q].
    """
    T1, DL = Lc.shape[0], Lc.shape[1]
    DB = Bc.shape[1]
    P = Y * q
    dtype = Lc.dtype
    s = min(oversample * Dout, DL * DB)

    L = Lc.reshape(T1, DL, DL, Y, q)
    B = Bc.reshape(T1, DB, DB, Y, q)
    if yy_off is None:
        pyy_t = jnp.broadcast_to(pyy, (T1,) + pyy.shape[-4:])  # [T1,Y,Y,Y,q]
    else:
        pyy_t = jnp.zeros((T1, 1), dtype)                  # placeholder

    theta = jax.random.normal(key, (T1, s, s, Y, q), dtype)

    # ---- right-to-left sketch pass: W_t[mL, mB, a] ------------------------
    # W_{T+1} = e0 (x) e0 (x) e0  (open-train boundary: col 0 / theta col 0)
    def wstep(W, xs):
        Lt, Bt, Tt, Pyyt = xs
        # contract pyy with theta once per step: Th[a, b, y1, y2, x]
        if yy_off is None:
            Th = jnp.einsum("abyx,yuvx->abuvx", Tt, Pyyt)
        else:
            Th = y_expand(Tt, yy_off, axis=2, mode="sum")
        t1 = jnp.einsum("mnvx,lnb->mlvxb", Bt, W)        # [DB,DL(n? see below)]
        # W[nL, nB, b]; t1[mB, nL, y2, x, b]
        u = jnp.einsum("abuvx,mlvxb->mluxa", Th, t1)     # [mB, nL, y1, x, a]
        W2 = jnp.einsum("knux,mnuxa->kma", Lt, u)        # [mL, mB, a]
        m = _safe_scale(jnp.max(jnp.abs(W2)))
        return W2 / m, None

    W0 = jnp.zeros((DL, DB, s), dtype).at[0, 0, 0].set(1.0)

    # we need all W_{t+1} for t = 0..T1-2: scan from the right collecting
    def wcollect(W, xs):
        W2, _ = wstep(W, xs)
        return W2, W2

    _, Ws = jax.lax.scan(wcollect, W0, (L[1:], B[1:], theta[1:], pyy_t[1:]),
                         reverse=True)
    # Ws[t] = W_{t+1} for t = 0..T1-2  (partial contraction of sites t+1..T)

    # ---- left-to-right projection pass ------------------------------------
    def zcompute(C, Lt, Bt, Pyyt):
        # C: [s, DL, DB] carry; returns Z[s, nL, nB, y, x]
        t1 = jnp.einsum("pkm,knux->pnmux", C, Lt)        # [s, nL, mB, y1, x]
        if yy_off is None:
            Z = jnp.einsum("yuvx,pnmux,mjvx->pnjyx", Pyyt, t1, Bt)
        else:
            t1T = y_expand(t1, yy_off, axis=3, mode="diff")
            Z = jnp.einsum("pnmyvx,mjvx->pnjyx", t1T, Bt)
        return Z

    def lstep(carry, xs):
        C, lg = carry
        Lt, Bt, Wt1, Pyyt = xs
        Z = zcompute(C, Lt, Bt, Pyyt)                    # [s, nL, nB, Y, q]
        m = _safe_scale(jnp.max(jnp.abs(Z)))
        Z = Z / m
        lg = lg - jnp.log(m)
        Yk = jnp.einsum("pnjyx,nja->pyxa", Z, Wt1).reshape(s * P, s)
        Q, _ = cholqr(Yk)  # lane-batched Pallas CholQR on TPU (ops/kernels.py)
        core = Q.reshape(s, P, s).transpose(0, 2, 1)     # [s, s, P]
        C2 = jnp.einsum("pyxa,pnjyx->anj", Q.reshape(s, Y, q, s), Z)
        return (C2, lg), core

    C0 = jnp.zeros((s, DL, DB), dtype).at[0, 0, 0].set(1.0)
    (C, lg), cores = jax.lax.scan(
        lstep, (C0, Llz + Blz), (L[:-1], B[:-1], Ws, pyy_t[:-1]))

    # ---- last core: absorb carry; right bond is col-0 ---------------------
    Zl = zcompute(C, L[-1], B[-1], pyy_t[-1])            # [s, nL, nB, Y, q]
    last = jnp.zeros((s, s, P), dtype).at[:, 0, :].set(
        Zl[:, 0, 0].reshape(s, P))
    cores = jnp.concatenate([cores, last[None]], axis=0)

    # ---- apply the truncation policy on the small train -------------------
    out, lg = _sweep_truncate_rl(cores, lg, trunc, Dout)
    tt = normalize_eachmatrix(TensorTrain(out, lg, (Y, q)))
    return tt.cores, tt.logz
