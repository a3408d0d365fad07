"""Compile + time the fused merge kernels at D=20 (lean F-step variant).

Usage: python scripts/probe_lean.py [B] [T1] [D] [reps]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from matrixproductbp_tpu.ops import fused_stta
from matrixproductbp_tpu.ops.stta import merge_stta_batched

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
T1 = int(sys.argv[2]) if len(sys.argv) > 2 else 16
D = int(sys.argv[3]) if len(sys.argv) > 3 else 20
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 3
Y, q = 2, 2
P = Y * q

fused_stta.set_active_platform(jnp.zeros(1))
print("variant:", fused_stta._f_variant(D, D, Y, q, min(D, D * D),
                                        min(D + 4, D * D)))

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(17)
Lc = jnp.asarray(rng.normal(size=(B, T1, D, D, P)), jnp.float32)
Bc = jnp.asarray(rng.normal(size=(B, T1, D, D, P)), jnp.float32)
Llz = jnp.zeros(B, jnp.float32)
pyy = jnp.asarray(rng.random(size=(Y, Y, Y, q)), jnp.float32)


@jax.jit
def run_fused(lc, llz, bc, blz):
    c, z = fused_stta.merge_stta_fused(lc, llz, bc, blz, pyy, D, Y, q, key)
    return c, z


@jax.jit
def run_xla(lc, llz, bc, blz):
    c, z = merge_stta_batched(lc, llz, bc, blz, pyy, D, Y, q, key)
    return c, z


for name, fn in [("fused", run_fused), ("xla", run_xla)]:
    t0 = time.perf_counter()
    c, z = fn(Lc, Llz, Bc, Llz)
    s = float(jnp.sum(c)) + float(jnp.sum(z))
    print(f"{name} compile+run: {time.perf_counter()-t0:.1f}s chk={s:.4g}",
          flush=True)
    t0 = time.perf_counter()
    cur_l, cur_z = c, z
    for _ in range(REPS):
        # chain a data dependency so the relay cache can't serve a repeat
        cur_l, cur_z = fn(Lc + 1e-9 * jnp.sum(cur_z), Llz, Bc, Llz)
    s = float(jnp.sum(cur_l)) + float(jnp.sum(cur_z))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name} per-merge: {dt*1000:.1f} ms (B={B}, T1={T1}, D={D})",
          flush=True)
