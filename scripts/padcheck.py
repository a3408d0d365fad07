import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, json
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from matrixproductbp_tpu.ops.stta import merge_stta
from matrixproductbp_tpu.ops.tensortrain import _safe_scale
D, T1, N = 10, 16, 2048
q, Y = 2, 2
dtype = jnp.float32
key = jax.random.PRNGKey(17)
pyy = jnp.zeros((Y,Y,Y,q), dtype).at[1,1,1].set(1.).at[1,0,1].set(1.).at[1,1,0].set(1.).at[0,0,0].set(1.)

f0 = jax.jit(lambda Lc, lz, Rc: jax.vmap(
    lambda a, al, bb, bl: merge_stta(a, al, bb, bl, pyy, D, Y, q, key))(Lc, lz, Rc, lz))
Lc = jax.ShapeDtypeStruct((N, T1, D, D, Y*q), dtype)
lz = jax.ShapeDtypeStruct((N,), dtype)
comp = f0.lower(Lc, lz, Lc).compile()
m = comp.memory_analysis()
print("batch-first temp bytes:", m.temp_size_in_bytes/1e9, "GB")

# batch-last variant
def merge_bl(Lc, Bc):
    E = Lc.shape[-1]
    sr, sl = 10, 14
    kphi, kpsi = jax.random.split(key)
    phi = jax.random.normal(kphi, (T1, sl, sl, Y, q), dtype)
    psi = jax.random.normal(kpsi, (T1, sr, sr, Y, q), dtype)
    pyy_t = jnp.broadcast_to(pyy, (T1,)+pyy.shape)
    def wstep(W, xs):
        Lt, Bt, Pt, Pyyt = xs
        Th = jnp.einsum("abyx,yuvx->abuvx", Pt, Pyyt)
        t1 = jnp.einsum("mnvxe,lnbe->mlvxbe", Bt, W)
        u = jnp.einsum("abuvx,mlvxbe->mluxae", Th, t1)
        W2 = jnp.einsum("knuxe,mnuxae->kmae", Lt, u)
        W2 = W2 / _safe_scale(jnp.max(jnp.abs(W2), axis=(0,1,2), keepdims=True))
        return W2, W2
    W_end = jnp.zeros((D, D, sr, E), dtype).at[0,0,0].set(1.0)
    _, Ws = jax.lax.scan(wstep, W_end, (Lc[1:], Bc[1:], psi[1:], pyy_t[1:]), reverse=True)
    return Ws

fbl = jax.jit(merge_bl)
Lcl = jax.ShapeDtypeStruct((T1, D, D, Y, q, N), dtype)
comp2 = fbl.lower(Lcl, Lcl).compile()
m2 = comp2.memory_analysis()
print("batch-last wscan temp bytes:", m2.temp_size_in_bytes/1e9, "GB")

# batch-first wscan only, for apples-to-apples
def merge_bf(Lc, Bc):
    sr, sl = 10, 14
    kphi, kpsi = jax.random.split(key)
    psi = jax.random.normal(kpsi, (T1, sr, sr, Y, q), dtype)
    pyy_t = jnp.broadcast_to(pyy, (T1,)+pyy.shape)
    def wstep(W, xs):
        Lt, Bt, Pt, Pyyt = xs
        Th = jnp.einsum("abyx,yuvx->abuvx", Pt, Pyyt)
        t1 = jnp.einsum("emnvx,elnb->emlvxb", Bt, W)
        u = jnp.einsum("abuvx,emlvxb->emluxa", Th, t1)
        W2 = jnp.einsum("eknux,emnuxa->ekma", Lt, u)
        W2 = W2 / _safe_scale(jnp.max(jnp.abs(W2), axis=(1,2,3), keepdims=True))
        return W2, W2
    W_end = jnp.zeros((N, D, D, sr), dtype).at[:,0,0,0].set(1.0)
    Lt_s = jnp.moveaxis(Lc[:,1:], 1, 0)
    Bt_s = jnp.moveaxis(Bc[:,1:], 1, 0)
    _, Ws = jax.lax.scan(wstep, W_end, (Lt_s, Bt_s, psi[1:], pyy_t[1:]), reverse=True)
    return Ws
fbf = jax.jit(merge_bf)
Lcf = jax.ShapeDtypeStruct((N, T1, D, D, Y, q), dtype)
comp3 = fbf.lower(Lcf, Lcf).compile()
m3 = comp3.memory_analysis()
print("batch-first wscan temp bytes:", m3.temp_size_in_bytes/1e9, "GB")
