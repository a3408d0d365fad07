"""Benchmark: edge-message updates per second per chip, plus the BASELINE.md
companion metrics, in ONE json line.

Fields (BASELINE.md "Targets for the new TPU framework"):
  value                      edge-updates/s/chip at bond dim D=10
  d20_edge_updates_per_s     same at D=20
  belief_l1_vs_exact         max-abs belief error of the f32 TPU fast path vs
                             the f64 exact-enumeration oracle (same SIS model
                             on a small tree; CPU f64)
  roofline                   measured per-chip utilization from the analytic
                             FLOP model (utils/profiling.py)
  vs_baseline                speedup over this same implementation on the host
                             CPU (the reference publishes no absolute numbers;
                             its execution model is CPU-bound Julia)

One full BP sweep updates every directed edge message once, so
edge_updates_per_s = E * n_sweeps / elapsed.  Timing notes: data dependencies
are chained and a device->host fetch forces synchronization through the TPU
tunnel (see CLAUDE.md).

Resilience: a complete JSON line (missing fields = null) is printed after
EVERY phase, most important metric first, and SIGTERM/SIGALRM flush the
best-known line before exiting — so an external timeout still leaves a
parseable result in the tail.  First-compile through the tunnel is the long
pole; the persistent cache in .jax_cache/ makes reruns cheap.
"""
import json
import os
import signal
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_NODES = 4096
N_NODES_D20 = 1024  # D=20 leg: the chunked N=4096 run OOMs 16 GB (the merge
                    # kernels' padded lanes-last stream copies are ~1.6 GB
                    # each at D=20; measured r05) — the whole-jit N=1024 leg
                    # is the largest proven D=20 configuration; rate is
                    # per-edge so N cancels
DEGREE = 3
T_HORIZON = 15
SWEEPS = 3
METHOD = "sketch"   # matmul-dominated STTA fast path

RESULT = {
    "metric": (f"edge-message updates/s/chip (SIS {DEGREE}-regular "
               f"N={N_NODES} T={T_HORIZON} D=10, f32, {METHOD})"),
    "value": None,
    "unit": "edge_updates/s",
    "vs_baseline": None,
    "d20_edge_updates_per_s": None,
    "belief_l1_vs_exact": None,
    "karate_converge_s": None,
    "roofline": None,
}


def emit():
    print(json.dumps(RESULT), flush=True)


def _flush_and_exit(signum, frame):
    emit()
    sys.exit(1)


signal.signal(signal.SIGTERM, _flush_and_exit)
signal.signal(signal.SIGALRM, _flush_and_exit)


def build(dtype, D, n_nodes=N_NODES):
    from matrixproductbp_tpu.graph import random_regular_graph
    from matrixproductbp_tpu.models import SIS, mpbp_sis

    rng = np.random.default_rng(0)
    g = random_regular_graph(n_nodes, DEGREE, rng)
    sis = SIS(g, lam=0.2, rho=0.1, T=T_HORIZON, gamma=0.3)
    return mpbp_sis(sis, D=D, dtype=dtype), g


def _short_err(e, n=160):
    return "error: " + " ".join(str(e).split())[:n]


def timed_sweeps(bp, device, sweeps, D, chunk=None):
    import jax.numpy as jnp
    import matrixproductbp_tpu as mp

    bp = jax.device_put(bp, device)
    trunc = mp.TruncBond(D)

    def sweep(b):
        if chunk is not None:
            return mp.bp_sweep_chunked(b, trunc, method=METHOD, chunk=chunk)
        return mp.bp_sweep(b, trunc, method=METHOD)

    # compile + warmup; the final float() forces a real device->host fetch
    # (block_until_ready alone does not synchronize through the TPU tunnel)
    out = sweep(bp)
    float(jnp.sum(out.msg_logz))
    t0 = time.perf_counter()
    cur = out
    for _ in range(sweeps):
        cur = sweep(cur)
    float(jnp.sum(cur.msg_logz))
    return (time.perf_counter() - t0) / sweeps


def accuracy_line(accel):
    """Belief L1 of the f32 TPU fast path vs the f64 enumeration oracle
    (BASELINE.md: 'belief L1 error vs exact_prob')."""
    import jax.numpy as jnp
    import matrixproductbp_tpu as mp
    from matrixproductbp_tpu import exact
    from matrixproductbp_tpu.models import SIS, mpbp_sis

    g = mp.graph_from_edges(4, [(0, 1), (0, 2), (2, 3)])
    sis = SIS(g, lam=0.2, rho=0.1, T=3, gamma=0.3)
    bp32 = jax.device_put(mpbp_sis(sis, D=10, dtype=jnp.float32), accel)
    # converge on the fast path, then 2 deterministic full-precision polish
    # sweeps (iterate(polish=...)): removes the TPU default-matmul-precision
    # (bf16-pass) noise and the sketch randomization from the final beliefs
    bp32, _, _ = mp.iterate(bp32, maxiter=10, trunc=mp.TruncBond(10), tol=0.0,
                            method=METHOD, polish=2)
    b32 = np.asarray(mp.beliefs(bp32))

    cpu = jax.devices("cpu")[0]
    bp64 = jax.device_put(mpbp_sis(sis, D=16), cpu)
    with jax.default_device(cpu):
        p_ex, _ = exact.exact_prob(bp64)
        b_ex = np.asarray(exact.exact_marginals(bp64, p_ex))
    return float(np.abs(b32 - b_ex).max())


# Zachary karate club (34 nodes, 78 undirected edges) — the reference's
# representative workload (notebooks/sis_karate_club_network.ipynb).
KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2),
    (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3),
    (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32), (3, 7),
    (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16), (6, 16),
    (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]


def karate_converge(accel, T=50, D=10, maxiter=100, tol=1e-6):
    """Wall-clock to BP fixed point on karate-club SIS (compile excluded by a
    1-sweep warmup ``iterate`` on the same shapes)."""
    import matrixproductbp_tpu as mp
    from matrixproductbp_tpu.models import SIS, mpbp_sis
    import jax.numpy as jnp

    g = mp.graph_from_edges(34, KARATE_EDGES)
    sis = SIS(g, lam=0.2, rho=0.1, T=T, gamma=0.1)
    trunc = mp.TruncBond(D)
    bp = jax.device_put(mpbp_sis(sis, D=D, dtype=jnp.float32), accel)
    mp.iterate(bp, maxiter=1, trunc=trunc, tol=0.0, method=METHOD)  # warmup
    bp = jax.device_put(mpbp_sis(sis, D=D, dtype=jnp.float32), accel)
    t0 = time.perf_counter()
    _, n_it, _ = mp.iterate(bp, maxiter=maxiter, trunc=trunc, tol=tol,
                            method=METHOD)
    dt = time.perf_counter() - t0
    return {"seconds": round(dt, 3), "iters": n_it,
            "params": f"karate N=34 T={T} D={D} tol={tol}"}


def main():
    import gc
    import jax.numpy as jnp
    from matrixproductbp_tpu.utils.profiling import sweep_flops_estimate

    # A parseable (all-null) line FIRST: even if an external timeout kills us
    # mid-compile, the tail still holds valid JSON.
    emit()

    accel = jax.devices()[0]
    dtype = jnp.float32

    # ---- phase 1: the headline number (D=10) -------------------------------
    bp10, g = build(dtype, 10)
    dt10 = timed_sweeps(bp10, accel, SWEEPS, 10)
    RESULT["value"] = round(g.E / dt10, 2)
    flops10 = sweep_flops_estimate(bp10, METHOD)
    RESULT["roofline"] = {
        "sweep_seconds_d10": round(dt10, 4),
        "est_flops_per_sweep_d10": flops10,
        "achieved_flops_per_s": round(flops10 / dt10, 1),
        "v5e_f32_peak_utilization": round(flops10 / dt10 / 98e12, 6),
    }
    emit()
    # free phase-1 HBM before the later phases: the D=20 chunked leg +
    # leftover phase-1 state exhausted the chip when everything stayed live
    del bp10
    gc.collect()

    # ---- phase 2: accuracy line (tiny compile) ------------------------------
    try:
        RESULT["belief_l1_vs_exact"] = accuracy_line(accel)
    except Exception as e:  # keep the headline number alive
        RESULT["belief_l1_vs_exact"] = _short_err(e)
    gc.collect()
    emit()

    # ---- phase 3: D=20 (N=1024 whole-jit; see N_NODES_D20 note) ------------
    try:
        bp20, g20 = build(dtype, 20, N_NODES_D20)
        dt20 = timed_sweeps(bp20, accel, SWEEPS, 20)
        RESULT["d20_edge_updates_per_s"] = round(g20.E / dt20, 2)
    except Exception as e:
        RESULT["d20_edge_updates_per_s"] = _short_err(e)
    finally:
        try:
            del bp20
        except NameError:
            pass
    gc.collect()
    emit()

    # ---- phase 3b: end-to-end convergence wall-clock (karate-club SIS) -----
    # reference params: notebooks/sis_karate_club_network.ipynb — N=34, T=50,
    # bond 10, maxiter=100, tol=1e-6.  Measures user-visible time-to-fixed-
    # point (post-compile), not steady-state throughput.
    try:
        RESULT["karate_converge_s"] = karate_converge(accel)
    except Exception as e:
        RESULT["karate_converge_s"] = _short_err(e)
    gc.collect()
    emit()

    # ---- phase 4: vs_baseline = same impl on the host CPU -------------------
    try:
        cpus = jax.devices("cpu")
        with jax.default_device(cpus[0]):
            bp10c, _ = build(dtype, 10)   # rebuilt ON the CPU (phase-1 state
            dt_cpu = timed_sweeps(bp10c, cpus[0], 1, 10)   # was freed above)
        RESULT["vs_baseline"] = round(dt_cpu / dt10, 3)
    except Exception as e:
        RESULT["vs_baseline"] = _short_err(e)
    emit()
    return 0


if __name__ == "__main__":
    sys.exit(main())
