"""Probe: time one bp_sweep at bench-like shape on the real TPU with the
fused Pallas path vs the vmap XLA path.  MPBP_FUSED=0 disables the kernels.
Usage: python probe_fused.py [N] [D] [T]"""
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
D = int(sys.argv[2]) if len(sys.argv) > 2 else 10
T = int(sys.argv[3]) if len(sys.argv) > 3 else 15

import matrixproductbp_tpu as mp
from matrixproductbp_tpu.graph import random_regular_graph
from matrixproductbp_tpu.models import SIS, mpbp_sis
from matrixproductbp_tpu.ops import fused_stta

rng = np.random.default_rng(0)
g = random_regular_graph(N, 3, rng)
sis = SIS(g, lam=0.2, rho=0.1, T=T, gamma=0.3)
bp = mpbp_sis(sis, D=D, dtype=jnp.float32)
bp = jax.device_put(bp, jax.devices()[0])
trunc = mp.TruncBond(D)

print(f"backend={jax.default_backend()} N={N} D={D} T={T} "
      f"fused_env={os.environ.get('MPBP_FUSED', '1')}", flush=True)

t0 = time.perf_counter()
out = mp.bp_sweep(bp, trunc, method="sketch")
s = float(jnp.sum(out.msg_logz))
print(f"compile+first sweep: {time.perf_counter()-t0:.1f}s logz_sum={s:.6g}",
      flush=True)

t0 = time.perf_counter()
cur = out
for _ in range(3):
    cur = mp.bp_sweep(cur, trunc, method="sketch")
s = float(jnp.sum(cur.msg_logz))
dt = (time.perf_counter() - t0) / 3
print(f"per-sweep: {dt:.4f}s  edge_updates/s={g.E/dt:.1f} logz_sum={s:.6g}",
      flush=True)
