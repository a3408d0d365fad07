"""Probe one batched cavity-merge level at bench shape, varying stagger G."""
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
from matrixproductbp_tpu.ops.stta import merge_stta_batched

B = int(os.environ.get("PROBE_B", 8192))
T1 = int(os.environ.get("PROBE_T1", 16))
D = int(os.environ.get("PROBE_D", 10))
Y, q = 2, 2
GS = [int(x) for x in os.environ.get("PROBE_G", "1,2,4,8").split(",")]

rng = np.random.default_rng(0)
dev = jax.devices()[0]
Lc = jax.device_put(jnp.asarray(
    rng.random(size=(B, T1, D, D, Y * q), dtype=np.float32)), dev)
Bc = jax.device_put(jnp.asarray(
    rng.random(size=(B, T1, D, D, Y * q), dtype=np.float32)), dev)
lz = jnp.zeros((B,), jnp.float32)
pyy = jnp.asarray(rng.random(size=(Y, Y, Y, q), dtype=np.float32))
key = jax.random.PRNGKey(17)

for G in GS:
    fn = jax.jit(lambda a, az, b, bz, g=G: merge_stta_batched(
        a, az, b, bz, pyy, D, Y, q, key, stagger=g))
    t0 = time.perf_counter()
    c, z = fn(Lc, lz, Bc, lz)
    float(jnp.sum(z) + jnp.sum(c[:, -1]))
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 3
    cc, zz = Lc, lz
    for _ in range(reps):
        cc2, zz = fn(cc[:, :, :D, :D, :], zz, Bc, lz)
        cc = cc2
    float(jnp.sum(zz) + jnp.sum(cc[:, -1]))
    dt = (time.perf_counter() - t0) / reps
    print(f"G={G}: compile+first {t_first:.1f}s, per level {dt * 1000:.1f} ms",
          flush=True)
