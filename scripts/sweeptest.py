import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json, os, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from matrixproductbp_tpu.graph import random_regular_graph
from matrixproductbp_tpu.models import SIS, mpbp_sis
import matrixproductbp_tpu as mp

rng = np.random.default_rng(0)
g = random_regular_graph(4096, 3, rng)
sis = SIS(g, lam=0.2, rho=0.1, T=15, gamma=0.3)
bp = jax.device_put(mpbp_sis(sis, D=10, dtype=jnp.float32), jax.devices()[0])
trunc = mp.TruncBond(10)
t0 = time.perf_counter()
out = mp.bp_sweep(bp, trunc, method="sketch")
float(jnp.sum(out.msg_logz))
print("first call (incl compile):", time.perf_counter() - t0, flush=True)
t0 = time.perf_counter()
cur = out
for _ in range(3):
    cur = mp.bp_sweep(cur, trunc, method="sketch")
float(jnp.sum(cur.msg_logz))
dt = (time.perf_counter() - t0) / 3
print(json.dumps({"sweep_s": dt, "edge_updates_per_s": g.E / dt}), flush=True)
