"""Bisect merge_stta_batched: cumulative stage timings at G=1."""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from matrixproductbp_tpu.ops import stta
from matrixproductbp_tpu.ops.pipeline import staggered_scan
from matrixproductbp_tpu.ops.tensortrain import _safe_scale, _fit_axis
from matrixproductbp_tpu.ops.sumy import y_expand

B, T1, D = 8192, 16, 10
Y, q = 2, 2
P = Y * q
sr, sl = 10, 14
S = T1 - 1
dtype = jnp.float32
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(17)
dev = jax.devices()[0]


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(f, *args, reps=3):
    out = f(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    fetch(out)
    return (time.perf_counter() - t0) / reps


Lc = jax.device_put(jnp.asarray(
    rng.standard_normal((B, T1, D, D, P)).astype(np.float32)), dev)
Bc = jax.device_put(jnp.asarray(
    rng.standard_normal((B, T1, D, D, P)).astype(np.float32)), dev)
lz = jnp.zeros((B,), dtype)
pyy = jnp.asarray(rng.random(size=(Y, Y, Y, q)).astype(np.float32))


def upto(stage):
    def fn(Lc, Llz, Bc, Blz):
        Bn, DL, DB = B, D, D
        eps = 1e-6
        G, Bg = 1, B
        Lf = Lc.reshape(Bn, T1, DL, DL, Y, q)
        Bf = Bc.reshape(Bn, T1, DB, DB, Y, q)
        kphi, kpsi = jax.random.split(key)
        phi = jax.random.normal(kphi, (T1, sl, sl, Y, q), dtype)
        psi = jax.random.normal(kpsi, (T1, sr, sr, Y, q), dtype)
        Lfl = jnp.moveaxis(Lc, 0, 1).reshape(T1, Bn, DL * DL * P)
        Bfl = jnp.moveaxis(Bc, 0, 1).reshape(T1, Bn, DB * DB * P)
        Th = jnp.einsum("tabyx,yuvx->tabuvx", psi, pyy)

        def grp(a):
            return a.reshape(a.shape[:1] + (G, Bg) + a.shape[2:])

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
            return W2.reshape(G, Bg, -1), W2.reshape(G, Bg, -1)

        W_end = jnp.zeros((DL * DB * sr,), dtype).at[0].set(1.0)
        W_init = jnp.broadcast_to(W_end, (G, Bg, DL * DB * sr))
        _, Ws = staggered_scan(wstep, W_init, (grp(Lfl[1:]), grp(Bfl[1:])),
                               (Th[1:],), S, G, reverse=True)
        if stage == "wscan":
            return Ws

        c0 = jnp.einsum("yuvx,znux,zjvx->znjyx", pyy, Lf[:, 0, 0],
                        Bf[:, 0, 0])
        S_init = jnp.einsum("fyx,znjyx->zfnj", phi[0, 0], c0)
        S_init = S_init / _safe_scale(
            jnp.max(jnp.abs(S_init), axis=(1, 2, 3), keepdims=True))
        S_init = S_init.reshape(G, Bg, sl * DL * DB)

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
            z1 = jnp.einsum("gyuvx,gzenmux->gzenmyvx", Pyyt, t1)
            t2 = jnp.einsum("gzenmyvx,gzmjvx->gzenjyx", z1, Bt)
            Nt = jnp.einsum("gzenjyx,gznjb->gzeyxb", t2, Wt1)
            S2 = jnp.einsum("gefyx,gzenjyx->gzfnj", Ft, t2)
            S2 = S2 / _safe_scale(
                jnp.max(jnp.abs(S2), axis=(2, 3, 4), keepdims=True))
            return S2.reshape(G, Bg, -1), (Nt.reshape(G, Bg, -1),
                                           Mt.reshape(G, Bg, -1))

        W_last = jnp.zeros((1, G, Bg, DL * DB * sr), dtype).at[..., 0].set(1.0)
        Wnext = jnp.concatenate([Ws[1:], W_last], axis=0)
        pyy_t = jnp.broadcast_to(pyy, (T1,) + pyy.shape)
        _, (Ns, Ms) = staggered_scan(
            fstep, S_init, (grp(Lfl[1:]), grp(Bfl[1:]), Ws, Wnext),
            (phi[1:], pyy_t[1:]), S, G)
        if stage == "fscan":
            return Ns

        Ns = jnp.moveaxis(Ns.reshape(S, Bn, -1), 0, 1)
        Ms = jnp.moveaxis(Ms.reshape(S, Bn, -1), 0, 1).reshape(Bn, S, sl, sr)
        if stage == "reorder":
            return Ns

        Bsol = stta._solve_batched(Ms, Ns.reshape(Bn, S, sl, P * sr), eps)
        if stage == "solve":
            return Bsol

        Bsol = Bsol.reshape(Bn, S, sr, P, sr).transpose(0, 1, 2, 4, 3)
        Ws0 = Ws.reshape(S, Bn, -1)[0].reshape(Bn, DL, DB, sr)
        v0 = jnp.einsum("znjyx,znjb->zbyx", c0, Ws0).reshape(Bn, sr, P)
        first = jnp.zeros((Bn, sr, sr, P), dtype).at[:, 0].set(v0)
        last = jnp.zeros((Bn, sr, sr, P), dtype)
        last = last.at[:, :, 0, :].set(Bsol[:, -1][:, :, 0, :])
        cores = jnp.concatenate([first[:, None], Bsol[:, :-1], last[:, None]],
                                axis=1)
        cores = _fit_axis(_fit_axis(cores, 2, D), 3, D)
        m = _safe_scale(jnp.max(jnp.abs(cores), axis=(2, 3, 4)))
        cores = cores / m[:, :, None, None, None]
        logz = Llz + Blz - jnp.sum(jnp.log(m), axis=1)
        return cores, logz

    return jax.jit(fn)


for stage in ["wscan", "fscan", "reorder", "solve", "full"]:
    t = timeit(upto(stage), Lc, lz, Bc, lz)
    print(f"{stage}: {t:.4f} s", flush=True)
