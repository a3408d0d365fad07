"""Round-5 perf probe: one timed bench-shape sweep on the real chip.

Usage: python scripts/probe_r05.py [D] [N] [sweeps]
Respects MPBP_FUSE_MSG / MPBP_FUSED set in the environment (A/B the fused
message-path MPEM3 conversion and the fused kernels overall).  Prints one
JSON line: sweep seconds + compiled peak-memory analysis of the sweep
executable.
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

D = int(sys.argv[1]) if len(sys.argv) > 1 else 10
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
SWEEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
T = 15

import matrixproductbp_tpu as mp
from matrixproductbp_tpu.graph import random_regular_graph
from matrixproductbp_tpu.models import SIS, mpbp_sis

rng = np.random.default_rng(0)
g = random_regular_graph(N, 3, rng)
sis = SIS(g, lam=0.2, rho=0.1, T=T, gamma=0.3)
bp = mpbp_sis(sis, D=D, dtype=jnp.float32)
trunc = mp.TruncBond(D)

# memory analysis of the jitted sweep executable
from matrixproductbp_tpu.ops import fused_stta
from matrixproductbp_tpu.bp import _bp_sweep_jit
fused_stta.set_active_platform(bp.msg_cores)
lowered = _bp_sweep_jit.lower(bp, trunc, method="sketch",
                              platform=fused_stta._active_platform())
compiled = lowered.compile()
try:
    ma = compiled.memory_analysis()
    mem = {"temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
           "arg_gb": round(ma.argument_size_in_bytes / 2**30, 2),
           "peak_gb": round((ma.temp_size_in_bytes
                             + ma.argument_size_in_bytes
                             + ma.output_size_in_bytes) / 2**30, 2)}
except Exception as e:
    mem = str(e)[:100]

out = mp.bp_sweep(bp, trunc, method="sketch")
float(jnp.sum(out.msg_logz))
t0 = time.perf_counter()
cur = out
for _ in range(SWEEPS):
    cur = mp.bp_sweep(cur, trunc, method="sketch")
float(jnp.sum(cur.msg_logz))
dt = (time.perf_counter() - t0) / SWEEPS
print(json.dumps({
    "D": D, "N": N, "sweep_s": round(dt, 4),
    "edge_updates_per_s": round(g.E / dt, 1),
    "fuse_msg": os.environ.get("MPBP_FUSE_MSG", "1"),
    "fused": os.environ.get("MPBP_FUSED", "1"),
    "memory": mem,
}), flush=True)
