"""Second ablation: scan unrolling + batch scaling of the STTA merge."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from matrixproductbp_tpu.ops.stta import merge_stta, mpem3_stta
import matrixproductbp_tpu as mp

D, T1, N = 10, 16, 4096
q, Y = 2, 2
dtype = jnp.float32
res = {}
rng = np.random.default_rng(0)


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


key = jax.random.PRNGKey(17)
pyy = jnp.zeros((Y, Y, Y, q), dtype)
pyy = pyy.at[1, 1, 1].set(1.0).at[1, 0, 1].set(1.0).at[1, 1, 0].set(1.0) \
         .at[0, 0, 0].set(1.0)  # OR-type


def mk(b):
    Lc = jnp.asarray(rng.standard_normal((b, T1, D, D, Y * q)), dtype)
    Rc = jnp.asarray(rng.standard_normal((b, T1, D, D, Y * q)), dtype)
    lz = jnp.zeros((b,), dtype)
    return Lc, lz, Rc


for unroll in (1, 4, 16):
    f = jax.jit(lambda Lc, lz, Rc, u=unroll: jax.vmap(
        lambda a, al, bb, bl: merge_stta(a, al, bb, bl, pyy, D, Y, q, key,
                                         unroll=u))(Lc, lz, Rc, lz))
    res[f"merge_N_unroll{unroll}_s"] = timeit(f, *mk(N))
    print(json.dumps(res), flush=True)

# batch scaling at the best-looking unroll
for b in (3 * N, 8 * N):
    f = jax.jit(lambda Lc, lz, Rc: jax.vmap(
        lambda a, al, bb, bl: merge_stta(a, al, bb, bl, pyy, D, Y, q, key,
                                         unroll=16))(Lc, lz, Rc, lz))
    res[f"merge_{b//N}N_unroll16_s"] = timeit(f, *mk(b))
    print(json.dumps(res), flush=True)

# pipe with unroll
B3 = jnp.asarray(rng.standard_normal((N, T1, D, D, q, q, q)), dtype)
lzb = jnp.zeros((N,), dtype)
for unroll in (1, 16):
    f = jax.jit(lambda B3, lzb, u=unroll: jax.vmap(
        lambda bb, l: mpem3_stta(bb, l, D, key, unroll=u).cores)(B3, lzb))
    res[f"pipe_N_unroll{unroll}_s"] = timeit(f, B3, lzb)

print("FINAL " + json.dumps(res, indent=1), flush=True)
