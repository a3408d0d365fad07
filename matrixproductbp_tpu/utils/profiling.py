"""Per-chip roofline accounting for the BP sweep.

BASELINE.md asks for a measured kernel roofline per chip.  The sweep's
arithmetic is dominated by the cavity-merge contractions and the
sketch/decomposition passes; this module provides an analytic FLOP model for
one synchronous sweep and a measured utilization report (timings force a
device->host fetch — see CLAUDE.md on tunnel synchronization).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

__all__ = ["sweep_flops_estimate", "roofline_report"]

# v5e peak dense f32 throughput (bf16 is 2x); used only for a utilization %
_V5E_F32_FLOPS = 98e12


def sweep_flops_estimate(bp, method: str = "sketch") -> float:
    """Rough FLOPs of one sweep (contractions only, constants dropped)."""
    g = bp.graph
    N, K, T1 = g.N, g.dmax, bp.T + 1
    D = bp.D
    q = bp.q
    Y = bp.tables.Y
    P = Y * q
    n_merge = max(3 * K - 5, 1)
    if method == "sketch":
        s = D + 4
        # sketch scans: per t, einsums ~ s * D^2 * D * P twice + solves
        per_merge = T1 * (4 * s * D ** 3 * P) + T1 * (2 * s * s * D * P)
        per_pipe = T1 * (4 * s * D ** 2 * q ** 3) + T1 * (2 * s * s * D * q)
    else:
        # deterministic: kron merge (D^4 P) + QR/SVD sweeps O(T D^6 P)
        per_merge = T1 * (2 * D ** 4 * P + 4 * (D * D) ** 2 * (D * D) * P)
        per_pipe = T1 * (8 * (q * D) ** 2 * D * q ** 2)
    return float(N * (n_merge * per_merge + (K + 1) * per_pipe))


def roofline_report(bp, trunc, method: str = "sketch", reps: int = 3) -> dict:
    """Measure per-sweep wall time and report achieved FLOP/s."""
    from ..bp import bp_sweep

    out = bp_sweep(bp, trunc, method=method)
    float(jnp.sum(out.msg_logz))                       # sync through tunnel
    t0 = time.perf_counter()
    cur = out
    for _ in range(reps):
        cur = bp_sweep(cur, trunc, method=method)
    float(jnp.sum(cur.msg_logz))
    dt = (time.perf_counter() - t0) / reps

    flops = sweep_flops_estimate(bp, method)
    return {
        "sweep_seconds": dt,
        "edge_updates_per_s": bp.graph.E / dt,
        "est_flops_per_sweep": flops,
        "achieved_flops_per_s": flops / dt,
        "v5e_f32_utilization": flops / dt / _V5E_F32_FLOPS,
    }
