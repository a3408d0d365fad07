"""Probe: compile + per-sweep time of the batched sketch sweep (bench shape)."""
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
import matrixproductbp_tpu as mp
from matrixproductbp_tpu.graph import random_regular_graph
from matrixproductbp_tpu.models import SIS, mpbp_sis

N = int(os.environ.get("PROBE_N", 4096))
D = int(os.environ.get("PROBE_D", 10))
T = int(os.environ.get("PROBE_T", 15))
METHOD = os.environ.get("PROBE_METHOD", "sketch")

rng = np.random.default_rng(0)
g = random_regular_graph(N, 3, rng)
sis = SIS(g, lam=0.2, rho=0.1, T=T, gamma=0.3)
bp = jax.device_put(mpbp_sis(sis, D=D, dtype=jnp.float32), jax.devices()[0])
trunc = mp.TruncBond(D)

t0 = time.perf_counter()
out = mp.bp_sweep(bp, trunc, method=METHOD)
print("traced+dispatched:", round(time.perf_counter() - t0, 1), flush=True)
float(jnp.sum(out.msg_logz))
print("first run done:", round(time.perf_counter() - t0, 1), flush=True)

t0 = time.perf_counter()
cur = out
for _ in range(3):
    cur = mp.bp_sweep(cur, trunc, method=METHOD)
float(jnp.sum(cur.msg_logz))
dt = (time.perf_counter() - t0) / 3
print(f"per sweep: {dt:.4f} s   edge-updates/s: {g.E / dt:.1f}", flush=True)
