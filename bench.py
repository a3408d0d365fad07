"""Benchmark: edge-message updates per second per chip.

North-star metric from BASELINE.json: edge-message updates/s/chip at bond
dimension 10 (and 20), on an SIS Erdos-Renyi workload.  One full BP sweep
updates every directed edge message once, so

    edge_updates_per_s = E * n_sweeps / elapsed.

``vs_baseline``: the reference publishes no absolute numbers (BASELINE.md), so
we report speedup against this same implementation executed on the host CPU
(single process) — the honest measurable stand-in for the reference's
CPU-bound Julia execution model.

Prints ONE json line.
"""
import json
import os
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

D_BENCH = 10
N_NODES = 4096
DEGREE = 3
T_HORIZON = 15
SWEEPS = 3
METHOD = "sketch"   # matmul-dominated STTA fast path


def build(dtype):
    import jax.numpy as jnp
    from matrixproductbp_tpu.graph import random_regular_graph
    from matrixproductbp_tpu.models import SIS, mpbp_sis

    rng = np.random.default_rng(0)
    g = random_regular_graph(N_NODES, DEGREE, rng)
    sis = SIS(g, lam=0.2, rho=0.1, T=T_HORIZON, gamma=0.3)
    return mpbp_sis(sis, D=D_BENCH, dtype=dtype), g


def timed_sweeps(bp, device, sweeps):
    import jax.numpy as jnp
    import matrixproductbp_tpu as mp

    bp = jax.device_put(bp, device)
    trunc = mp.TruncBond(D_BENCH)
    # compile + warmup; the final float() forces a real device->host fetch
    # (block_until_ready alone does not synchronize through the TPU tunnel)
    out = mp.bp_sweep(bp, trunc, method=METHOD)
    float(jnp.sum(out.msg_logz))
    t0 = time.perf_counter()
    cur = out
    for _ in range(sweeps):
        cur = mp.bp_sweep(cur, trunc, method=METHOD)
    float(jnp.sum(cur.msg_logz))
    return (time.perf_counter() - t0) / sweeps


def main():
    import jax.numpy as jnp

    accel = jax.devices()[0]
    dtype = jnp.float32
    bp, g = build(dtype)
    dt_accel = timed_sweeps(bp, accel, SWEEPS)
    eups = g.E / dt_accel

    # vs_baseline: speedup over this same implementation on the host CPU
    # (the reference publishes no absolute numbers — BASELINE.md; its
    # execution model is CPU-bound Julia, so host CPU is the honest proxy)
    vs = None
    try:
        cpus = jax.devices("cpu")
        dt_cpu = timed_sweeps(bp, cpus[0], 1)
        vs = dt_cpu / dt_accel
    except Exception:
        vs = None

    print(json.dumps({
        "metric": f"edge-message updates/s/chip (SIS {DEGREE}-regular "
                  f"N={N_NODES} T={T_HORIZON} D={D_BENCH}, f32, {METHOD})",
        "value": round(eups, 2),
        "unit": "edge_updates/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    sys.exit(main())
