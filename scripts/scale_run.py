"""Single-chip scale demo: SIS on a large Erdos-Renyi graph via the
flat-resident in-place sweep (BASELINE.md scale target, single-chip leg).

Usage: python scripts/scale_run.py [N] [T] [D] [chunk] [sweeps]

Prints one JSON line with the measured sweep time, edge-update rate, and the
convergence delta of the last sweep.  Reference anchor: the largest instance
the Julia package exercises is Glauber ER N=5e3, T=15
(notebooks/glauber_erdos_renyi.ipynb); the BASELINE scale row asks for SIS ER
N=1e5, T=50.

Memory (16 GB v5e): resident = E*(T+1)*D^2*q^2*4 B messages (single-buffered
— the sweep is in-place Gauss-Seidel, ``bigsweep.py``) + N*(T+1)*D^2*q*4 B
beliefs + chunk temporaries.  At T=50, D=10, ER mean degree 3 that bounds a
single chip at N~5e4; N=1e5 at D=20 needs the halo multi-chip path.
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
MODE = sys.argv[6] if len(sys.argv) > 6 else "seg"   # seg | chunked

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import bigsweep
from matrixproductbp_tpu.graph import graph_from_edges
from matrixproductbp_tpu.models.sis import SISFactorSpec

rng = np.random.default_rng(0)
# ER G(N, M) with mean degree ~3 (giant component; reference-style workload)
M = int(1.5 * N)
src = rng.integers(0, N, 3 * M)
dst = rng.integers(0, N, 3 * M)
keep = src < dst
pairs = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)[:M]
g = graph_from_edges(N, [tuple(p) for p in pairs])
print(f"graph: N={g.N} E={g.E} dmax={g.dmax}", flush=True)

tables = mp.build_tables(
    g, [SISFactorSpec(lam=0.2, rho=0.1)] * g.N).astype(jnp.float32)
# patient-zero prior gamma=0.3 as phi at t=0 (sis.jl:24-33 semantics)
phi = np.ones((g.N, T + 1, 2), np.float32)
phi[:, 0, 0] = 0.7
phi[:, 0, 1] = 0.3
trunc = mp.TruncBond(D)

if MODE == "chunked":
    # double-buffered Jacobi (bp.bp_sweep_chunked): 2x message residency but
    # whole-bucket batched/fused chunk updates — the fair comparison leg for
    # sizes where 2x still fits the chip
    bp = mp.mpbp(g, tables, T, D, phi=jnp.asarray(phi), dtype=jnp.float32)
    msg_bytes = int(bp.msg_cores.size * 4)
    print(f"resident messages: {msg_bytes/2**30:.2f} GiB (x2 Jacobi)",
          flush=True)
    t0 = time.perf_counter()
    bp = mp.bp_sweep_chunked(bp, trunc, method="sketch", chunk=CHUNK)
    float(jnp.sum(bp.msg_logz))
    print(f"compile+first sweep: {time.perf_counter()-t0:.1f}s", flush=True)
    m_old = np.asarray(mp.beliefs(bp))
    t0 = time.perf_counter()
    for _ in range(SWEEPS):
        bp = mp.bp_sweep_chunked(bp, trunc, method="sketch", chunk=CHUNK)
    float(jnp.sum(bp.msg_logz))
    dt = (time.perf_counter() - t0) / SWEEPS
    m_new = np.asarray(mp.beliefs(bp))
else:
    plan = bigsweep.SegPlan(g, slots=CHUNK)
    st = bigsweep.seg_init(plan, tables, T, D, dtype=jnp.float32)
    msg_bytes = int(plan.S * plan.SEG_ROWS * st.segs[0].shape[0] * 4)
    print(f"resident messages: {msg_bytes/2**30:.2f} GiB "
          f"(S={plan.S} segments, {len(plan.chunks)} chunks)", flush=True)

    t0 = time.perf_counter()
    st = bigsweep.bp_sweep_seg(tables, st, trunc, T, D, phi=phi,
                               method="sketch")
    print(f"compile+first sweep: {time.perf_counter()-t0:.1f}s", flush=True)

    m_old = bigsweep.seg_beliefs(st, T, 2)
    t0 = time.perf_counter()
    for _ in range(SWEEPS):
        st = bigsweep.bp_sweep_seg(tables, st, trunc, T, D, phi=phi,
                                   method="sketch")
    # the per-segment drains already forced completion sweep-by-sweep
    dt = (time.perf_counter() - t0) / SWEEPS
    m_new = bigsweep.seg_beliefs(st, T, 2)
delta = float(np.max(np.abs(m_new - m_old)))
print(json.dumps({
    "workload": f"SIS ER N={N} T={T} D={D} f32 sketch slots={CHUNK} {MODE}",
    "sweep_s": round(dt, 3),
    "edge_updates_per_s": round(g.E / dt, 1),
    "last_sweep_delta": delta,
    "msg_bytes": msg_bytes,
}), flush=True)
