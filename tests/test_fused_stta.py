"""Fused Pallas STTA kernels vs the XLA scan path (interpret mode on CPU).

The kernels are compared at the *scan-output* level (sketches Ws, cross
matrices Ms, numerators Ns) where agreement is dtype round-off — the
post-solve cores pass through an oblique pseudo-inverse whose conditioning on
random full-rank data amplifies round-off reorderings by kappa^2, so that is
NOT a meaningful comparison surface (the end-to-end surface is the belief
gate in test_fused_sweep_*).  Dual-path strategy per the reference
(``test/sis_small_tree.jl:68-98``).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matrixproductbp_tpu.ops import fused_stta
from matrixproductbp_tpu.ops.sumy import y_expand
from matrixproductbp_tpu.ops.tensortrain import _safe_scale


def _ref_scans(Lc1, Bc1, pyy, phi, psi, DL, DB, Y, q, sr, sl, yy_off=None):
    """The merge_stta scan algebra (ops/stta.py) for ONE instance."""
    T1 = Lc1.shape[0]
    P = Y * q
    dtype = Lc1.dtype
    Lfl = Lc1.reshape(T1, DL * DL * P)
    Bfl = Bc1.reshape(T1, DB * DB * P)
    pyy_t = jnp.broadcast_to(pyy, (T1,) + pyy.shape)

    def wstep(Wf, xs):
        Ltf, Btf, Pt, Pyyt = xs
        Lt = Ltf.reshape(DL, DL, Y, q)
        Bt = Btf.reshape(DB, DB, Y, q)
        W = Wf.reshape(DL, DB, sr)
        if yy_off is None:
            Th = jnp.einsum("abyx,yuvx->abuvx", Pt, Pyyt)
        else:
            Th = y_expand(Pt, yy_off, axis=2, mode="sum")
        t1 = jnp.einsum("mnvx,lnb->mlvxb", Bt, W)
        u = jnp.einsum("abuvx,mlvxb->mluxa", Th, t1)
        W2 = jnp.einsum("knux,mnuxa->kma", Lt, u)
        W2 = W2 / _safe_scale(jnp.max(jnp.abs(W2)))
        return W2.reshape(-1), W2.reshape(-1)

    W_end = jnp.zeros((DL * DB * sr,), dtype).at[0].set(1.0)
    _, Ws = jax.lax.scan(wstep, W_end,
                         (Lfl[1:], Bfl[1:], psi[1:], pyy_t[1:]), reverse=True)

    Lff = Lc1.reshape(T1, DL, DL, Y, q)
    Bff = Bc1.reshape(T1, DB, DB, Y, q)
    if yy_off is None:
        c0 = jnp.einsum("yuvx,nux,jvx->njyx", pyy, Lff[0, 0], Bff[0, 0])
    else:
        LT = y_expand(Lff[0, 0], yy_off, axis=1, mode="diff")
        c0 = jnp.einsum("nyvx,jvx->njyx", LT, Bff[0, 0])
    S_init = jnp.einsum("fyx,njyx->fnj", phi[0, 0], c0)
    S_init = S_init / _safe_scale(jnp.max(jnp.abs(S_init)))

    def fstep(Sf, xs):
        Ltf, Btf, Ft, Wtf, Wt1f, Pyyt = xs
        Lt = Ltf.reshape(DL, DL, Y, q)
        Bt = Btf.reshape(DB, DB, Y, q)
        Wt = Wtf.reshape(DL, DB, sr)
        Wt1 = Wt1f.reshape(DL, DB, sr)
        Sm = Sf.reshape(sl, DL, DB)
        Mt = jnp.einsum("ekm,kma->ea", Sm, Wt)
        t1 = jnp.einsum("ekm,knux->enmux", Sm, Lt)
        if yy_off is None:
            t2 = jnp.einsum("yuvx,enmux,mjvx->enjyx", Pyyt, t1, Bt)
        else:
            t1T = y_expand(t1, yy_off, axis=3, mode="diff")
            t2 = jnp.einsum("enmyvx,mjvx->enjyx", t1T, Bt)
        Nt = jnp.einsum("enjyx,njb->eyxb", t2, Wt1)
        S2 = jnp.einsum("efyx,enjyx->fnj", Ft, t2)
        S2 = S2 / _safe_scale(jnp.max(jnp.abs(S2)))
        return S2.reshape(-1), (Nt, Mt)

    W_last = jnp.zeros((DL * DB * sr,), dtype).at[0].set(1.0)
    Wnext = jnp.concatenate([Ws[1:], W_last[None]], axis=0)
    _, (Ns, Ms) = jax.lax.scan(
        fstep, S_init.reshape(-1),
        (Lfl[1:], Bfl[1:], phi[1:], Ws, Wnext, pyy_t[1:]))
    return Ws.reshape(T1 - 1, DL, DB, sr), Ns, Ms


@pytest.mark.parametrize("DL,DB,Y,q,Dout,yy_off,lean", [
    (4, 3, 2, 2, 5, None, False),
    (3, 3, 3, 2, 4, None, False),
    (3, 3, 4, 2, 5, 1, False),     # banded sum-type merge
    (4, 3, 2, 2, 5, None, True),   # lean F-step (large-D variant)
    (3, 3, 3, 2, 4, None, True),
    (3, 3, 4, 2, 5, 1, True),
])
def test_fused_scans_match_reference(DL, DB, Y, q, Dout, yy_off, lean,
                                     monkeypatch):
    monkeypatch.setattr(fused_stta, "_FORCE_LEAN", lean)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(17)
    B, T1 = 5, 5
    dtype = jnp.float64                      # interpret mode supports f64
    S = T1 - 1
    P = Y * q
    sr = min(Dout, DL * DB)
    sl = min(sr + 4, DL * DB)
    Lc = jnp.asarray(rng.normal(size=(B, T1, DL, DL, P)), dtype)
    Bc = jnp.asarray(rng.normal(size=(B, T1, DB, DB, P)), dtype)
    pyy = jnp.asarray(rng.random(size=(Y, Y, Y, q)), dtype)
    kphi, kpsi = jax.random.split(key)
    phi = jax.random.normal(kphi, (T1, sl, sl, Y, q), dtype)
    psi = jax.random.normal(kpsi, (T1, sr, sr, Y, q), dtype)

    Ws_ref, Ns_ref, Ms_ref = jax.vmap(
        lambda lc, bc: _ref_scans(lc, bc, pyy, phi, psi, DL, DB, Y, q, sr,
                                  sl, yy_off))(Lc, Bc)

    Lf = Lc.reshape(B, T1, DL, DL, Y, q)
    Bf = Bc.reshape(B, T1, DB, DB, Y, q)
    if yy_off is None:
        Th = jnp.einsum("tabyx,yuvx->tabuvx", psi, pyy)
        Pyy_d = pyy
        c0 = jnp.einsum("yuvx,znux,zjvx->znjyx", pyy, Lf[:, 0, 0],
                        Bf[:, 0, 0])
    else:
        Th = y_expand(psi, yy_off, axis=3, mode="sum")
        Pyy_d = fused_stta._band_indicator(Y, yy_off, q, dtype)
        LT = y_expand(Lf[:, 0, 0], yy_off, axis=2, mode="diff")
        c0 = jnp.einsum("znyvx,zjvx->znjyx", LT, Bf[:, 0, 0])
    Thk = jnp.transpose(Th, (0, 2, 4, 3, 5, 1))
    Phik = jnp.transpose(phi, (0, 3, 4, 2, 1))
    L1 = fused_stta._pad_lanes(jnp.moveaxis(Lf[:, 1:], 0, -1), -1)
    B1 = fused_stta._pad_lanes(jnp.moveaxis(Bf[:, 1:], 0, -1), -1)
    S_init = jnp.einsum("fyx,znjyx->zfnj", phi[0, 0], c0)
    S_init = S_init / _safe_scale(
        jnp.max(jnp.abs(S_init), axis=(1, 2, 3), keepdims=True))
    S_init_k = fused_stta._pad_lanes(jnp.moveaxis(S_init, 0, -1), -1)

    Ws = fused_stta._merge_wscan(L1, B1, Thk[1:], DL=DL, DB=DB, Y=Y, q=q,
                                 sr=sr, interpret=True)
    Ns_k, Ms_k = fused_stta._merge_fscan(
        L1, B1, Pyy_d, Phik[1:], Ws, S_init_k, DL=DL, DB=DB, Y=Y, q=q,
        sr=sr, sl=sl, interpret=True)

    np.testing.assert_allclose(
        np.moveaxis(np.asarray(Ws), -1, 0)[:B], np.asarray(Ws_ref),
        rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(Ns_k), -1, 0)[:B],
        np.asarray(Ns_ref).reshape(B, S, sl, Y, q, sr),
        rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(Ms_k), -1, 0)[:B], np.asarray(Ms_ref),
        rtol=1e-12, atol=1e-12)


def test_fused_merge_end_to_end_f64():
    """Full fused merge (scan + solve + assembly) vs the batched XLA path in
    f64; tolerance reflects the solve's conditioning on random data."""
    from matrixproductbp_tpu.ops.stta import merge_stta_batched
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(17)
    B, T1, DL, DB, Y, q, Dout = 5, 5, 4, 3, 2, 2, 5
    dtype = jnp.float64
    Lc = jnp.asarray(rng.normal(size=(B, T1, DL, DL, Y * q)), dtype)
    Bc = jnp.asarray(rng.normal(size=(B, T1, DB, DB, Y * q)), dtype)
    Llz = jnp.asarray(rng.normal(size=(B,)), dtype)
    Blz = jnp.asarray(rng.normal(size=(B,)), dtype)
    pyy = jnp.asarray(rng.random(size=(Y, Y, Y, q)), dtype)
    ref_c, ref_z = merge_stta_batched(Lc, Llz, Bc, Blz, pyy, Dout, Y, q, key)
    out_c, out_z = fused_stta.merge_stta_fused(Lc, Llz, Bc, Blz, pyy, Dout,
                                               Y, q, key, interpret=True)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out_z), np.asarray(ref_z),
                               rtol=1e-3, atol=1e-3)


def _ref_mpem3_scans(B3, phi, psi, Db, qi, qj, sr, sl):
    """The mpem3_stta scan algebra (ops/stta.py) for ONE instance."""
    T1 = B3.shape[0]
    dtype = B3.dtype
    B3f = B3.reshape(T1, -1)

    def wstep(Wf, xs):
        Btf, Pt = xs
        Bt = Btf.reshape(Db, Db, qi, qj, qi)
        W = Wf.reshape(Db, qi, sr)
        t1 = jnp.einsum("mnijr,nrc->mijc", Bt, W)
        W2 = jnp.einsum("mijc,bcij->mib", t1, Pt)
        W2 = W2 / _safe_scale(jnp.max(jnp.abs(W2)))
        return W2.reshape(-1), W2.reshape(-1)

    W_end = jnp.zeros((Db * qi * sr,), dtype).at[0].set(1.0)
    _, Ws = jax.lax.scan(wstep, W_end, (B3f[1:], psi[1:]), reverse=True)

    def fstep(Sf, xs):
        Btf, Ft, Wtf, Wt1f = xs
        Bt = Btf.reshape(Db, Db, qi, qj, qi)
        Wt = Wtf.reshape(Db, qi, sr)
        Wt1 = Wt1f.reshape(Db, qi, sr)
        Sm = Sf.reshape(sl, Db, qi)
        Mt = jnp.einsum("emi,mib->eb", Sm, Wt)
        t1 = jnp.einsum("emi,mnijr->enijr", Sm, Bt)
        Nt = jnp.einsum("enijr,nrb->eijb", t1, Wt1)
        S2 = jnp.einsum("enijr,efij->fnr", t1, Ft)
        S2 = S2 / _safe_scale(jnp.max(jnp.abs(S2)))
        return S2.reshape(-1), (Nt, Mt)

    S_init = jnp.einsum("fij,nijr->fnr", phi[0, 0], B3[0, 0])
    S_init = S_init / _safe_scale(jnp.max(jnp.abs(S_init)))
    W_last = jnp.zeros((Db * qi * sr,), dtype).at[0].set(1.0)
    Wnext = jnp.concatenate([Ws[1:], W_last[None]], axis=0)
    _, (Ns, Ms) = jax.lax.scan(fstep, S_init.reshape(-1),
                               (B3f[1:], phi[1:], Ws, Wnext))
    return Ws.reshape(T1 - 1, Db, qi, sr), Ns, Ms


@pytest.mark.parametrize("Db,qi,qj,Dout", [
    (4, 2, 2, 5),
    (3, 2, 1, 4),              # the belief path's dummy qj = 1 leg
])
def test_fused_mpem3_scans_match_reference(Db, qi, qj, Dout):
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(17)
    B, T1 = 5, 5
    dtype = jnp.float64
    S = T1 - 1
    sr = min(Dout, Db * qi)
    sl = min(sr + 4, Db * qi)
    B3 = jnp.asarray(rng.normal(size=(B, T1, Db, Db, qi, qj, qi)), dtype)
    kphi, kpsi = jax.random.split(key)
    phi = jax.random.normal(kphi, (T1, sl, sl, qi, qj), dtype)
    psi = jax.random.normal(kpsi, (T1, sr, sr, qi, qj), dtype)

    Ws_ref, Ns_ref, Ms_ref = jax.vmap(
        lambda b3: _ref_mpem3_scans(b3, phi, psi, Db, qi, qj, sr, sl))(B3)

    B1 = fused_stta._pad_lanes(jnp.moveaxis(B3[:, 1:], 0, -1), -1)
    S_init = jnp.einsum("fij,znijr->zfnr", phi[0, 0], B3[:, 0, 0])
    S_init = S_init / _safe_scale(
        jnp.max(jnp.abs(S_init), axis=(1, 2, 3), keepdims=True))
    S_init_k = fused_stta._pad_lanes(jnp.moveaxis(S_init, 0, -1), -1)

    Ws = fused_stta._mpem3_wscan(B1, psi[1:], Db=Db, qi=qi, qj=qj, sr=sr,
                                 interpret=True)
    Ns_k, Ms_k = fused_stta._mpem3_fscan(B1, phi[1:], Ws, S_init_k, Db=Db,
                                         qi=qi, qj=qj, sr=sr, sl=sl,
                                         interpret=True)

    np.testing.assert_allclose(
        np.moveaxis(np.asarray(Ws), -1, 0)[:B], np.asarray(Ws_ref),
        rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(Ns_k), -1, 0)[:B],
        np.asarray(Ns_ref).reshape(B, S, sl, qi, qj, sr),
        rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(Ms_k), -1, 0)[:B], np.asarray(Ms_ref),
        rtol=1e-12, atol=1e-12)


def test_fused_mpem3_end_to_end_f64(monkeypatch):
    from matrixproductbp_tpu.ops.stta import mpem3_stta_batched
    monkeypatch.setattr(fused_stta, "_MPEM3_CHUNK", 2)   # force chunked path
    rng = np.random.default_rng(2)
    key = jax.random.PRNGKey(17)
    B, T1, Db, qi, qj, Dout = 5, 5, 4, 2, 2, 5
    dtype = jnp.float64
    B3 = jnp.asarray(rng.normal(size=(B, T1, Db, Db, qi, qj, qi)), dtype)
    lz = jnp.asarray(rng.normal(size=(B,)), dtype)
    ref_c, ref_z = mpem3_stta_batched(B3, lz, Dout, key)
    out_c, out_z = fused_stta.mpem3_stta_fused(B3, lz, Dout, key,
                                               interpret=True)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out_z), np.asarray(ref_z),
                               rtol=1e-12, atol=1e-12)


def test_fused_sweep_beliefs_match_oracle(monkeypatch):
    """Full sweep through the fused-kernel dispatch (interpret mode, f64) on
    a tree: beliefs must match the enumeration oracle — the same end-to-end
    gate the XLA paths pass (test/sis_small_tree.jl:28-50)."""
    import matrixproductbp_tpu as mp
    from matrixproductbp_tpu import bp as bpmod
    from matrixproductbp_tpu import exact
    from matrixproductbp_tpu.models import SIS, mpbp_sis

    monkeypatch.setattr(fused_stta, "_FORCE_INTERPRET", True)
    monkeypatch.setattr(bpmod, "_BATCH_MIN_NODES", 1)

    g = mp.graph_from_edges(4, [(0, 1), (0, 2), (2, 3)])
    sis = SIS(g, lam=0.2, rho=0.1, T=3, gamma=0.3)
    bp0 = mpbp_sis(sis, D=12)
    bp1, _, _ = mp.iterate(bp0, maxiter=12, trunc=mp.TruncBond(12), tol=0.0,
                           method="sketch")
    b = np.asarray(mp.beliefs(bp1))
    p_ex, _ = exact.exact_prob(bp1)
    b_ex = np.asarray(exact.exact_marginals(bp1, p_ex))
    assert np.abs(b - b_ex).max() < 1e-6

def test_fused_mpem3_tm_end_to_end_f64(monkeypatch):
    """Time-major flat entry (the message-path layout) == batched-tm XLA path
    — the wiring the bench-scale sweep takes once fused message conversion is
    admitted (bp._bucket_update_batched)."""
    from matrixproductbp_tpu.ops.stta import mpem3_stta_batched_tm
    monkeypatch.setattr(fused_stta, "_MPEM3_CHUNK", 2)   # force chunked path
    rng = np.random.default_rng(3)
    key = jax.random.PRNGKey(17)
    B, T1, Db, qi, qj, Dout = 5, 5, 4, 2, 2, 5
    dtype = jnp.float64
    B3f = jnp.asarray(
        rng.normal(size=(T1, B, qi * qj * qi * Db * Db)), dtype)
    lz = jnp.asarray(rng.normal(size=(B,)), dtype)
    ref_c, ref_z = mpem3_stta_batched_tm(B3f, lz, Db, qi, qj, Dout, key)
    out_c, out_z = fused_stta.mpem3_stta_fused_tm(B3f, lz, Db, qi, qj, Dout,
                                                  key, interpret=True)
    # cores agree to solve conditioning (same bound as the non-tm gate: the
    # per-step rescale axes differ between kernel and XLA paths, perturbing
    # the normal equations while spanning the same subspace)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out_z), np.asarray(ref_z),
                               rtol=1e-12, atol=1e-12)
