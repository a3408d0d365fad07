"""Fifth ablation: time the merge's internal stages separately."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from matrixproductbp_tpu.ops.tensortrain import _safe_scale
from matrixproductbp_tpu.ops.stta import _solve_batched

D, T1, N = 10, 16, 4096
q, Y = 2, 2
P = Y * q
sr, sl = 10, 14
dtype = jnp.float32
res = {}
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(17)


def fetch(x):
    return float(jnp.sum(x))


def timeit(f, *args, reps=3):
    out = f(*args)
    fetch(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    fetch(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


pyy = jnp.zeros((Y, Y, Y, q), dtype).at[1, 1, 1].set(1.0) \
    .at[1, 0, 1].set(1.0).at[1, 1, 0].set(1.0).at[0, 0, 0].set(1.0)
Lf = jnp.asarray(rng.standard_normal((N, T1, D, D, Y, q)), dtype)
Bf = jnp.asarray(rng.standard_normal((N, T1, D, D, Y, q)), dtype)
kphi, kpsi = jax.random.split(key)
phi = jax.random.normal(kphi, (T1, sl, sl, Y, q), dtype)
psi = jax.random.normal(kpsi, (T1, sr, sr, Y, q), dtype)
pyy_t = jnp.broadcast_to(pyy, (T1,) + pyy.shape)


def wscan(Lf, Bf):
    def wstep(W, xs):
        Lt, Bt, Pt, Pyyt = xs
        Th = jnp.einsum("abyx,yuvx->abuvx", Pt, Pyyt)
        t1 = jnp.einsum("emnvx,elnb->emlvxb", Bt, W)
        u = jnp.einsum("abuvx,emlvxb->emluxa", Th, t1)
        W2 = jnp.einsum("eknux,emnuxa->ekma", Lt, u)
        W2 = W2 / _safe_scale(
            jnp.max(jnp.abs(W2), axis=(1, 2, 3), keepdims=True))
        return W2, W2

    W_end = jnp.zeros((N, D, D, sr), dtype).at[:, 0, 0, 0].set(1.0)
    Lt_s = jnp.moveaxis(Lf[:, 1:], 1, 0)   # [T1-1, N, ...]
    Bt_s = jnp.moveaxis(Bf[:, 1:], 1, 0)
    _, Ws = jax.lax.scan(wstep, W_end, (Lt_s, Bt_s, psi[1:], pyy_t[1:]),
                         reverse=True)
    return Ws


res["wscan_s"] = timeit(jax.jit(wscan), Lf, Bf)
print(json.dumps(res), flush=True)

Ws = jax.jit(wscan)(Lf, Bf)


def fscan(Lf, Bf, Ws):
    def fstep(S, xs):
        Lt, Bt, Ft, Wt, Wt1, Pyyt = xs
        Mt = jnp.einsum("eckm,ekma->eca", S, Wt)
        t1 = jnp.einsum("eckm,eknux->ecnmux", S, Lt)
        t2 = jnp.einsum("yuvx,ecnmux,emjvx->ecnjyx", Pyyt, t1, Bt)
        Nt = jnp.einsum("ecnjyx,enjb->ecyxb", t2, Wt1)
        S2 = jnp.einsum("cfyx,ecnjyx->efnj", Ft, t2)
        S2 = S2 / _safe_scale(
            jnp.max(jnp.abs(S2), axis=(1, 2, 3), keepdims=True))
        return S2, (Nt, Mt)

    c0 = jnp.einsum("yuvx,enux,ejvx->enjyx", pyy, Lf[:, 0, 0], Bf[:, 0, 0])
    S_init = jnp.einsum("fyx,enjyx->efnj", phi[0, 0], c0)
    W_last = jnp.zeros((N, D, D, sr), dtype).at[:, 0, 0, 0].set(1.0)
    Wnext = jnp.concatenate([Ws[1:], W_last[None]], axis=0)
    Lt_s = jnp.moveaxis(Lf[:, 1:], 1, 0)
    Bt_s = jnp.moveaxis(Bf[:, 1:], 1, 0)
    _, (Ns, Ms) = jax.lax.scan(
        fstep, S_init, (Lt_s, Bt_s, phi[1:], Ws, Wnext, pyy_t[1:]))
    return Ns, Ms


res["fscan_s"] = timeit(jax.jit(fscan), Lf, Bf, Ws)
print(json.dumps(res), flush=True)

Ns, Ms = jax.jit(fscan)(Lf, Bf, Ws)
Msb = jnp.moveaxis(Ms, 0, 1)                  # [N, T1-1, sl, sr]
Nsb = jnp.moveaxis(Ns, 0, 1).reshape(N, T1 - 1, sl, P * sr)


def solve(Msb, Nsb):
    return _solve_batched(Msb, Nsb, 1e-6)


res["solve_s"] = timeit(jax.jit(solve), Msb, Nsb)
print(json.dumps(res), flush=True)

# how expensive is ONE wstep outside scan, applied to all t at once (batched)?
def wstep_all(Lf, Bf, Ws):
    Lt = Lf[:, 1:]
    Bt = Bf[:, 1:]
    Th = jnp.einsum("tabyx,tyuvx->tabuvx", psi[1:], pyy_t[1:])
    t1 = jnp.einsum("etmnvx,etlnb->etmlvxb", Bt, jnp.moveaxis(Ws, 0, 1))
    u = jnp.einsum("tabuvx,etmlvxb->etmluxa", Th, t1)
    W2 = jnp.einsum("etknux,etmnuxa->etkma", Lt, u)
    return W2


res["wstep_all_t_batched_s"] = timeit(jax.jit(wstep_all), Lf, Bf, Ws)
print("FINAL " + json.dumps(res, indent=1), flush=True)
