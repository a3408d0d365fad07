"""Fourth ablation: batch-LAST (lane-packed) merge vs vmap batch-first.

Hypothesis: merge tensors have trailing dims 2..14; TPU tiles are (8,128), so
batch-first layouts waste 9-64x of every lane. Packing the node batch into
the minor-most axis should recover most of it.
"""
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
from matrixproductbp_tpu.ops.smallalg import spd_solve_unrolled

D, T1, N = 10, 16, 4096
q, Y = 2, 2
P = Y * q
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


# OR-type pyy (SIS)
pyy = jnp.zeros((Y, Y, Y, q), dtype).at[1, 1, 1].set(1.0) \
    .at[1, 0, 1].set(1.0).at[1, 1, 0].set(1.0).at[0, 0, 0].set(1.0)


def merge_batch_last(Lc, Bc, Dout):
    """STTA merge with an explicit trailing batch axis 'e' in every einsum.

    Lc, Bc: [T1, D, D, Y, q, E]. Returns cores [T1, Dout, Dout, Y*q, E].
    Mirrors ops/stta.py::merge_stta numerics (same sketches).
    """
    E = Lc.shape[-1]
    DL = Lc.shape[1]
    DB = Bc.shape[1]
    sr = min(Dout, DL * DB)
    sl = sr + 4
    kphi, kpsi = jax.random.split(key)
    phi = jax.random.normal(kphi, (T1, sl, sl, Y, q), dtype)
    psi = jax.random.normal(kpsi, (T1, sr, sr, Y, q), dtype)

    def wstep(W, xs):
        Lt, Bt, Pt, Pyyt = xs
        Th = jnp.einsum("abyx,yuvx->abuvx", Pt, Pyyt)
        t1 = jnp.einsum("mnvxe,lnbe->mlvxbe", Bt, W)
        u = jnp.einsum("abuvx,mlvxbe->mluxae", Th, t1)
        W2 = jnp.einsum("knuxe,mnuxae->kmae", Lt, u)
        W2 = W2 / _safe_scale(jnp.max(jnp.abs(W2)))
        return W2, W2

    W_end = jnp.zeros((DL, DB, sr, E), dtype).at[0, 0, 0].set(1.0)
    pyy_t = jnp.broadcast_to(pyy, (T1,) + pyy.shape)
    _, Ws = jax.lax.scan(wstep, W_end, (Lc[1:], Bc[1:], psi[1:], pyy_t[1:]),
                         reverse=True)

    def fstep(S, xs):
        Lt, Bt, Ft, Wt, Wt1, Pyyt = xs
        Mt = jnp.einsum("ckme,kmae->cae", S, Wt)
        t1 = jnp.einsum("ckme,knuxe->cnmuxe", S, Lt)
        t2 = jnp.einsum("yuvx,cnmuxe,mjvxe->cnjyxe", Pyyt, t1, Bt)
        Nt = jnp.einsum("cnjyxe,njbe->cyxbe", t2, Wt1)
        S2 = jnp.einsum("cfyx,cnjyxe->fnje", Ft, t2)
        S2 = S2 / _safe_scale(jnp.max(jnp.abs(S2)))
        return S2, (Nt, Mt)

    c0 = jnp.einsum("yuvx,nuxe,jvxe->njyxe", pyy, Lc[0, 0], Bc[0, 0])
    S_init = jnp.einsum("fyx,njyxe->fnje", phi[0, 0], c0)
    S_init = S_init / _safe_scale(jnp.max(jnp.abs(S_init)))
    W_last = jnp.zeros((DL, DB, sr, E), dtype).at[0, 0, 0].set(1.0)
    Wnext = jnp.concatenate([Ws[1:], W_last[None]], axis=0)
    _, (Ns, Ms) = jax.lax.scan(
        fstep, S_init, (Lc[1:], Bc[1:], phi[1:], Ws, Wnext, pyy_t[1:]))

    # solve: move batch in front for the unrolled solve (elementwise anyway)
    Msb = jnp.moveaxis(Ms, -1, 0)                       # [E, T1-1, sl, sr]
    Nsb = jnp.moveaxis(Ns.reshape(T1 - 1, sl, P * sr, E), -1, 0)
    G = jnp.einsum("etij,etik->etjk", Msb, Msb)
    tr = jnp.maximum(jnp.trace(G, axis1=-2, axis2=-1), 1e-30)
    Gj = G + (1e-6 * tr / sr)[..., None, None] * jnp.eye(sr, dtype=dtype)
    rhs = jnp.einsum("etij,etik->etjk", Msb, Nsb)
    Bsol = spd_solve_unrolled(Gj, rhs)                  # [E, T1-1, sr, P*sr]
    return Bsol


@jax.jit
def run_batch_last(Lc, Bc):
    return merge_batch_last(Lc, Bc, D)


Lc = jnp.asarray(rng.standard_normal((T1, D, D, Y, q, N)), dtype)
Bc = jnp.asarray(rng.standard_normal((T1, D, D, Y, q, N)), dtype)
res["merge_batchlast_1N_s"] = timeit(run_batch_last, Lc, Bc)
print(json.dumps(res), flush=True)

# reference point: current vmap merge at same size
from matrixproductbp_tpu.ops.stta import merge_stta
Lc0 = jnp.asarray(rng.standard_normal((N, T1, D, D, Y * q)), dtype)
Rc0 = jnp.asarray(rng.standard_normal((N, T1, D, D, Y * q)), dtype)
lz = jnp.zeros((N,), dtype)
f0 = jax.jit(lambda Lc, lz, Rc: jax.vmap(
    lambda a, al, bb, bl: merge_stta(a, al, bb, bl, pyy, D, Y, q, key))(
    Lc, lz, Rc, lz))
res["merge_vmap_1N_s"] = timeit(f0, Lc0, lz, Rc0)
print("FINAL " + json.dumps(res, indent=1), flush=True)
