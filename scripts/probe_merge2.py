"""Bisect the batched merge: time W-scan / F-scan / solve / assembly
separately, vs the r2 ablate5-style scan (known 0.14 s) on the same session."""
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
from matrixproductbp_tpu.ops.tensortrain import _safe_scale

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


Lf = jax.device_put(jnp.asarray(
    rng.standard_normal((B, T1, D, D, Y, q)).astype(np.float32)), dev)
Bf = jax.device_put(jnp.asarray(
    rng.standard_normal((B, T1, D, D, Y, q)).astype(np.float32)), dev)
pyy = jnp.asarray(rng.random(size=(Y, Y, Y, q)).astype(np.float32))
kphi, kpsi = jax.random.split(key)
phi = jax.random.normal(kphi, (T1, sl, sl, Y, q), dtype)
psi = jax.random.normal(kpsi, (T1, sr, sr, Y, q), dtype)
pyy_t = jnp.broadcast_to(pyy, (T1,) + pyy.shape)


# ---- ablate5-style W scan (r2 reference point) ------------------------------
def wscan_a5(Lf, Bf):
    def wstep(W, xs):
        Lt, Bt, Pt, Pyyt = xs
        Th = jnp.einsum("abyx,yuvx->abuvx", Pt, Pyyt)
        t1 = jnp.einsum("emnvx,elnb->emlvxb", Bt, W)
        u = jnp.einsum("abuvx,emlvxb->emluxa", Th, t1)
        W2 = jnp.einsum("eknux,emnuxa->ekma", Lt, u)
        W2 = W2 / _safe_scale(
            jnp.max(jnp.abs(W2), axis=(1, 2, 3), keepdims=True))
        return W2, W2

    W_end = jnp.zeros((B, D, D, sr), dtype).at[:, 0, 0, 0].set(1.0)
    Lt_s = jnp.moveaxis(Lf[:, 1:], 1, 0)
    Bt_s = jnp.moveaxis(Bf[:, 1:], 1, 0)
    _, Ws = jax.lax.scan(wstep, W_end, (Lt_s, Bt_s, psi[1:], pyy_t[1:]),
                         reverse=True)
    return Ws


print("a5 wscan:", round(timeit(jax.jit(wscan_a5), Lf, Bf), 4), flush=True)


# ---- my batched W scan, no pipeline helper, G axis stripped ----------------
def wscan_mine(Lf, Bf):
    Th_all = jnp.einsum("tabyx,yuvx->tabuvx", psi, pyy)
    Lfl = jnp.moveaxis(Lf, 1, 0).reshape(T1, B, D * D * P)
    Bfl = jnp.moveaxis(Bf, 1, 0).reshape(T1, B, D * D * P)

    def wstep(Wflat, xs):
        Ltf, Btf, Tht = xs
        Lt = Ltf.reshape(B, D, D, Y, q)
        Bt = Btf.reshape(B, D, D, Y, q)
        W = Wflat.reshape(B, D, D, sr)
        t1 = jnp.einsum("zmnvx,zlnb->zmlvxb", Bt, W)
        u = jnp.einsum("abuvx,zmlvxb->zmluxa", Tht, t1)
        W2 = jnp.einsum("zklux,zmluxa->zkma", Lt, u)
        W2 = W2 / _safe_scale(
            jnp.max(jnp.abs(W2), axis=(1, 2, 3), keepdims=True))
        W2f = W2.reshape(B, D * D * sr)
        return W2f, W2f

    W_end = jnp.zeros((B, D * D * sr), dtype).at[:, 0].set(1.0)
    _, Ws = jax.lax.scan(wstep, W_end, (Lfl[1:], Bfl[1:], Th_all[1:]),
                         reverse=True)
    return Ws


print("mine wscan flat:", round(timeit(jax.jit(wscan_mine), Lf, Bf), 4),
      flush=True)


# ---- same but with a leading singleton G axis (as in the shipped code) -----
def wscan_g1(Lf, Bf):
    Th_all = jnp.einsum("tabyx,yuvx->tabuvx", psi, pyy)
    Lfl = jnp.moveaxis(Lf, 1, 0).reshape(T1, 1, B, D * D * P)
    Bfl = jnp.moveaxis(Bf, 1, 0).reshape(T1, 1, B, D * D * P)

    def wstep(Wflat, xs):
        Ltf, Btf, Tht = xs
        Lt = Ltf.reshape(1, B, D, D, Y, q)
        Bt = Btf.reshape(1, B, D, D, Y, q)
        W = Wflat.reshape(1, B, D, D, sr)
        t1 = jnp.einsum("gzmnvx,gzlnb->gzmlvxb", Bt, W)
        u = jnp.einsum("gabuvx,gzmlvxb->gzmluxa", Tht, t1)
        W2 = jnp.einsum("gzklux,gzmluxa->gzkma", Lt, u)
        W2 = W2 / _safe_scale(
            jnp.max(jnp.abs(W2), axis=(2, 3, 4), keepdims=True))
        W2f = W2.reshape(1, B, D * D * sr)
        return W2f, W2f

    W_end = jnp.zeros((1, B, D * D * sr), dtype).at[..., 0].set(1.0)
    _, Ws = jax.lax.scan(wstep, W_end,
                         (Lfl[1:], Bfl[1:], Th_all[1:, None]), reverse=True)
    return Ws


print("mine wscan g1-axis:", round(timeit(jax.jit(wscan_g1), Lf, Bf), 4),
      flush=True)
