"""Third ablation: merge batch scaling + bf16 operand speed."""
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

from matrixproductbp_tpu.ops.stta import merge_stta

D, T1, N = 10, 16, 4096
q, Y = 2, 2
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


pyy32 = jnp.zeros((Y, Y, Y, q), jnp.float32).at[1, 1, 1].set(1.0) \
    .at[1, 0, 1].set(1.0).at[1, 1, 0].set(1.0).at[0, 0, 0].set(1.0)


def mk(b, dtype):
    Lc = jnp.asarray(rng.standard_normal((b, T1, D, D, Y * q)), dtype)
    Rc = jnp.asarray(rng.standard_normal((b, T1, D, D, Y * q)), dtype)
    lz = jnp.zeros((b,), dtype)
    return Lc, lz, Rc


for tag, b, dt in (("half", N // 2, jnp.float32), ("1N", N, jnp.float32),
                   ("2N", 2 * N, jnp.float32),
                   ("1N_bf16", N, jnp.bfloat16)):
    pyy = pyy32.astype(dt)
    f = jax.jit(lambda Lc, lz, Rc, p=pyy: jax.vmap(
        lambda a, al, bb, bl: merge_stta(a, al, bb, bl, p, D, Y, q, key))(
        Lc, lz, Rc, lz))
    try:
        res[f"merge_{tag}_s"] = timeit(f, *mk(b, dt))
    except Exception as e:  # noqa
        res[f"merge_{tag}_s"] = f"ERR {type(e).__name__}"
    print(json.dumps(res), flush=True)

print("FINAL " + json.dumps(res, indent=1), flush=True)
