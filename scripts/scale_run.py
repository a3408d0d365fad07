"""Single-chip scale demo: SIS on a large Erdos-Renyi graph via the
memory-bounded chunked sweep (BASELINE.md scale target, single-chip leg).

Usage: python scripts/scale_run.py [N] [T] [D] [chunk] [sweeps]

Prints one JSON line with the measured sweep time, edge-update rate, and the
convergence delta of the last sweep.  Reference anchor: the largest instance
the Julia package exercises is Glauber ER N=5e3, T=15
(notebooks/glauber_erdos_renyi.ipynb); the BASELINE scale row asks for SIS ER
N=1e5, T=50.
"""
import json
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
T = int(sys.argv[2]) if len(sys.argv) > 2 else 50
D = int(sys.argv[3]) if len(sys.argv) > 3 else 10
CHUNK = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
SWEEPS = int(sys.argv[5]) if len(sys.argv) > 5 else 3

import matrixproductbp_tpu as mp
from matrixproductbp_tpu.graph import graph_from_edges
from matrixproductbp_tpu.models import SIS, mpbp_sis

rng = np.random.default_rng(0)
# ER G(N, M) with mean degree ~3 (giant component; reference-style workload)
M = int(1.5 * N)
src = rng.integers(0, N, 3 * M)
dst = rng.integers(0, N, 3 * M)
keep = src < dst
pairs = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)[:M]
g = graph_from_edges(N, [tuple(p) for p in pairs])
print(f"graph: N={g.N} E={g.E} dmax={g.dmax}", flush=True)

sis = SIS(g, lam=0.2, rho=0.1, T=T, gamma=0.3)
bp = mpbp_sis(sis, D=D, dtype=jnp.float32)
bp = jax.device_put(bp, jax.devices()[0])
trunc = mp.TruncBond(D)

t0 = time.perf_counter()
out = mp.bp_sweep_chunked(bp, trunc, method="sketch", chunk=CHUNK)
s = float(jnp.sum(out.msg_logz))
print(f"compile+first sweep: {time.perf_counter()-t0:.1f}s "
      f"logz={s:.6g}", flush=True)

m_old = mp.beliefs(out)
t0 = time.perf_counter()
cur = out
for _ in range(SWEEPS):
    cur = mp.bp_sweep_chunked(cur, trunc, method="sketch", chunk=CHUNK)
m_new = mp.beliefs(cur)
delta = float(jnp.max(jnp.abs(m_new - m_old)))
dt = (time.perf_counter() - t0) / SWEEPS
print(json.dumps({
    "workload": f"SIS ER N={N} T={T} D={D} f32 sketch chunk={CHUNK}",
    "sweep_s": round(dt, 3),
    "edge_updates_per_s": round(g.E / dt, 1),
    "last_sweep_delta": delta,
    "msg_bytes": int(np.prod(cur.msg_cores.shape) * 4),
}), flush=True)
