"""Stage timing at bench shape: fused merge vs mpem3 vs lift.
Usage: python probe_stages.py [N] [D] [T]"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
D = int(sys.argv[2]) if len(sys.argv) > 2 else 10
T = int(sys.argv[3]) if len(sys.argv) > 3 else 15

from matrixproductbp_tpu.ops import fused_stta
from matrixproductbp_tpu.ops.stta import merge_stta_batched, \
    mpem3_stta_batched

T1 = T + 1
Y, q = 2, 2
Dm = D
key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)


def timeit(f, *args, reps=5, tag=""):
    out = f(*args)
    s = float(jnp.sum(out[0])) if isinstance(out, tuple) else float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    s = float(jnp.sum(out[0])) if isinstance(out, tuple) else float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag}: {dt*1e3:.1f} ms  (chk {s:.3g})", flush=True)
    return dt


# merge at batch 2N (the P1 call), cropped-bond inputs Dm x Dm
B2 = jnp.asarray(rng.standard_normal((2 * N, T1, Dm, Dm, Y * q)),
                 jnp.float32)
lz2 = jnp.zeros((2 * N,), jnp.float32)
pyy = jnp.ones((Y, Y, Y, q), jnp.float32)

fused = jax.jit(lambda a, b: fused_stta.merge_stta_fused(
    a, lz2, a, lz2, b, D, Y, q, key, yy_off=0))
xla = jax.jit(lambda a, b: merge_stta_batched(
    a, lz2, a, lz2, b, D, Y, q, key, yy_off=0))

t_f2 = timeit(fused, B2, pyy, tag=f"fused merge  B={2*N}")
t_x2 = timeit(xla, B2, pyy, tag=f"xla   merge  B={2*N}")

B1 = B2[:N]
lz1 = lz2[:N]
fused1 = jax.jit(lambda a, b: fused_stta.merge_stta_fused(
    a, lz1, a, lz1, b, D, Y, q, key, yy_off=0))
t_f1 = timeit(fused1, B1, pyy, tag=f"fused merge  B={N}")

# mpem3 at batch 3N (Dcc = D after merges)
B3 = jnp.asarray(rng.standard_normal((3 * N, T1, D, D, q, q, q)),
                 jnp.float32)
lz3 = jnp.zeros((3 * N,), jnp.float32)
mp3 = jax.jit(lambda a: mpem3_stta_batched(a, lz3, D, key))
t_m = timeit(mp3, B3, tag=f"mpem3 (xla)  B={3*N}")

print(f"\nmerge path (fused): {(t_f2 + 2*t_f1)*1e3:.1f} ms; "
      f"mpem3: {t_m*1e3:.1f} ms", flush=True)
