import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from matrixproductbp_tpu.ops.tensortrain import _safe_scale

D, T1, N = 10, 16, 4096
q, Y = 2, 2
sr, sl = 10, 14
dtype = jnp.float32
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(17)

def fetch(x): return float(jnp.sum(x))
def timeit(f, *a, reps=3):
    out = f(*a); fetch(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps): out = f(*a)
    fetch(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter()-t0)/reps

pyy = jnp.zeros((Y,Y,Y,q), dtype).at[1,1,1].set(1.).at[1,0,1].set(1.).at[1,1,0].set(1.).at[0,0,0].set(1.)
pyy_t = jnp.broadcast_to(pyy, (T1,)+pyy.shape)
kphi, kpsi = jax.random.split(key)
psi = jax.random.normal(kpsi, (T1, sr, sr, Y, q), dtype)

# xs as [T1, N, D*D*Y*q] flat; carry as [N, D*D*sr] flat
Lflat = jnp.asarray(rng.standard_normal((T1, N, D*D*Y*q)), dtype)
Bflat = jnp.asarray(rng.standard_normal((T1, N, D*D*Y*q)), dtype)

def wscan_flat(Lflat, Bflat):
    def wstep(Wf, xs):
        Ltf, Btf, Pt, Pyyt = xs
        Lt = Ltf.reshape(N, D, D, Y, q)
        Bt = Btf.reshape(N, D, D, Y, q)
        W = Wf.reshape(N, D, D, sr)
        Th = jnp.einsum("abyx,yuvx->abuvx", Pt, Pyyt)
        t1 = jnp.einsum("emnvx,elnb->emlvxb", Bt, W)
        u = jnp.einsum("abuvx,emlvxb->emluxa", Th, t1)
        W2 = jnp.einsum("eknux,emnuxa->ekma", Lt, u)
        W2 = W2 / _safe_scale(jnp.max(jnp.abs(W2), axis=(1,2,3), keepdims=True))
        W2f = W2.reshape(N, D*D*sr)
        return W2f, W2f
    W_end = jnp.zeros((N, D*D*sr), dtype).at[:, 0].set(1.0)
    _, Ws = jax.lax.scan(wstep, W_end, (Lflat[1:], Bflat[1:], psi[1:], pyy_t[1:]), reverse=True)
    return Ws

res = {}
f = jax.jit(wscan_flat)
res["wscan_flat2d_s"] = timeit(f, Lflat, Bflat)
m = f.lower(jax.ShapeDtypeStruct(Lflat.shape, dtype), jax.ShapeDtypeStruct(Bflat.shape, dtype)).compile().memory_analysis()
res["wscan_flat2d_temp_GB"] = m.temp_size_in_bytes/1e9
print("FINAL " + json.dumps(res, indent=1), flush=True)
