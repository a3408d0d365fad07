"""TPU probe: separate tunnel/dispatch overhead from real sweep compute.

Measures (1) empty jit round-trip, (2) per-sweep time when sweeps are chained
host-side (one jit call each) vs device-side (k sweeps inside one jit), at two
problem sizes.  All timings chain data dependencies and force a device->host
fetch (CLAUDE.md: block_until_ready does not synchronize through the tunnel).
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from matrixproductbp_tpu.graph import random_regular_graph
from matrixproductbp_tpu.models import SIS, mpbp_sis
import matrixproductbp_tpu as mp
from functools import partial

D = 10
T = 15
METHOD = "sketch"
results = {}


def fetch(x):
    return float(jnp.sum(x))


# --- 1. empty round trip ----------------------------------------------------
f = jax.jit(lambda x: x + 1.0)
x = jnp.ones((8,), jnp.float32)
fetch(f(x))
t0 = time.perf_counter()
y = x
for _ in range(10):
    y = f(y)
fetch(y)
results["empty_roundtrip_ms"] = (time.perf_counter() - t0) / 10 * 1e3

# chained inside one jit
g10 = jax.jit(lambda x: jax.lax.fori_loop(0, 10, lambda i, v: v + 1.0, x))
fetch(g10(x))
t0 = time.perf_counter()
fetch(g10(x))
results["empty_10chained_onejit_ms"] = (time.perf_counter() - t0) * 1e3


def probe_size(N, tag, ksweeps=4):
    rng = np.random.default_rng(0)
    g = random_regular_graph(N, 3, rng)
    sis = SIS(g, lam=0.2, rho=0.1, T=T, gamma=0.3)
    bp = mpbp_sis(sis, D=D, dtype=jnp.float32)
    bp = jax.device_put(bp, jax.devices()[0])
    trunc = mp.TruncBond(D)

    t0 = time.perf_counter()
    out = mp.bp_sweep(bp, trunc, method=METHOD)
    fetch(out.msg_logz)
    results[f"{tag}_first_call_s"] = time.perf_counter() - t0

    # host-chained: one jit call per sweep
    t0 = time.perf_counter()
    cur = out
    for _ in range(ksweeps):
        cur = mp.bp_sweep(cur, trunc, method=METHOD)
    fetch(cur.msg_logz)
    results[f"{tag}_per_sweep_hostchain_s"] = (time.perf_counter() - t0) / ksweeps

    # device-chained: k sweeps in one jit via scan
    @partial(jax.jit, static_argnames=("k",))
    def multi(bp, k):
        def body(b, _):
            return mp.bp_sweep.__wrapped__(b, trunc, None, None, 0.0, METHOD), None
        out, _ = jax.lax.scan(body, bp, None, length=k)
        return out

    t0 = time.perf_counter()
    out2 = multi(out, ksweeps)
    fetch(out2.msg_logz)
    dt_inc_compile = time.perf_counter() - t0
    results[f"{tag}_multisweep_first_s"] = dt_inc_compile
    t0 = time.perf_counter()
    out3 = multi(out2, ksweeps)
    fetch(out3.msg_logz)
    results[f"{tag}_per_sweep_devchain_s"] = (time.perf_counter() - t0) / ksweeps
    print(json.dumps(results), flush=True)


probe_size(256, "n256")
probe_size(4096, "n4096", ksweeps=3)

print("FINAL " + json.dumps(results, indent=1), flush=True)
