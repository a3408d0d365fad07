"""Flat-resident large-graph sweep (bigsweep.py) vs the standard paths.

The flat path exists for the BASELINE scale target (single 16 GB chip,
N>=1e4): flat 2-D layout-pinned residents + in-place (Gauss-Seidel) chunk
updates.  Gates: (a) one Jacobi-mode sweep is BIT-EXACT vs
``bp_sweep_chunked`` (same gather values, same update body); (b) the
Seidel fixed point matches exact enumeration on a tree (the reference's
asynchronous ``iterate!`` semantics, ``mpbp.jl:185-198``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import bigsweep, exact
from matrixproductbp_tpu.models.sis import SISFactorSpec


def _chain(N):
    return mp.graph_from_edges(N, [(i, i + 1) for i in range(N - 1)])


def _tables(g, dtype):
    t = mp.build_tables(g, [SISFactorSpec(lam=0.2, rho=0.3)] * g.N)
    return t.astype(dtype)


def test_jacobi_sweep_bitexact_vs_chunked():
    g = _chain(40)
    tables = _tables(g, jnp.float32)
    T, D = 3, 8
    trunc = mp.TruncBond(D)
    fs = bigsweep.flat_init(g, tables, T, D, dtype=jnp.float32,
                            belief_cores=True)
    fs1 = bigsweep.bp_sweep_flat(g, tables, fs, trunc, T, D, chunk=16,
                                 method="sketch", jacobi=True)
    bp = mp.mpbp(g, tables, T=T, D=D, dtype=jnp.float32)
    bp1 = mp.bp_sweep_chunked(bp, trunc, method="sketch", chunk=16)
    assert np.array_equal(np.asarray(bp1.msg_cores).reshape(g.E, -1),
                          np.asarray(fs1.msg2))
    assert np.array_equal(np.asarray(bp1.msg_logz), np.asarray(fs1.msg_logz))
    assert np.array_equal(np.asarray(bp1.bel_cores).reshape(g.N, -1),
                          np.asarray(fs1.bel2))
    assert np.array_equal(np.asarray(bp1.f), np.asarray(fs1.f))


def test_seidel_fixed_point_matches_exact_tree():
    g = mp.graph_from_edges(5, [(0, 1), (1, 2), (1, 3), (3, 4)])
    tables = _tables(g, jnp.float64)
    T, D = 3, 12
    trunc = mp.TruncBond(D)
    fs = bigsweep.flat_init(g, tables, T, D, dtype=jnp.float64)
    fs, nit, delta = bigsweep.iterate_flat(g, tables, fs, trunc, T, D,
                                           maxiter=40, tol=1e-12, chunk=8,
                                           method="sketch")
    b = bigsweep.flat_beliefs(fs, T, D, tables.q)
    bp = mp.mpbp(g, tables, T=T, D=D, dtype=jnp.float64)  # oracle container
    b_ex = exact.exact_marginals(bp)
    assert np.abs(b - b_ex).max() < 1e-7   # f64 end-to-end (iteration residual)
    # free energy identity on the tree: -F == log Z
    _, Z = exact.exact_prob(bp)
    assert np.isclose(-bigsweep.flat_free_energy(fs), np.log(Z), atol=1e-5)


def test_iterate_flat_converges_and_damping_runs():
    g = _chain(20)
    tables = _tables(g, jnp.float32)
    T, D = 2, 6
    fs = bigsweep.flat_init(g, tables, T, D, dtype=jnp.float32)
    fs, nit, delta = bigsweep.iterate_flat(
        g, tables, fs, mp.TruncBond(D), T, D, maxiter=30, tol=1e-4,
        chunk=8, method="sketch", damp=0.2)
    assert nit < 30 and delta < 1e-4   # f32 sketch noise floor ~4e-5


def test_seg_sweep_matches_bp_sweep_one_sweep():
    """Segment-replacement mode (single chunk => pure Jacobi) reproduces
    the synchronous ``bp_sweep`` on a 3-regular graph (one degree class)."""
    from matrixproductbp_tpu.graph import random_regular_graph
    rng = np.random.default_rng(3)
    g = random_regular_graph(16, 3, rng)
    tables = _tables(g, jnp.float32)
    T, D = 3, 9
    trunc = mp.TruncBond(D)
    plan = bigsweep.SegPlan(g, slots=64)
    st = bigsweep.seg_init(plan, tables, T, D, dtype=jnp.float32)
    st = bigsweep.bp_sweep_seg(tables, st, trunc, T, D, method="sketch")
    bp1 = mp.bp_sweep(mp.mpbp(g, tables, T=T, D=D, dtype=jnp.float32),
                      trunc, method="sketch")
    b_seg = bigsweep.seg_beliefs(st, T, 2)
    b_std = np.asarray(mp.beliefs(bp1))
    assert np.abs(b_seg - b_std).max() < 1e-6     # f32 ulp-level


def test_seg_fixed_point_matches_exact_tree():
    """Multi-chunk multi-segment Seidel converges to the exact tree
    marginals and the Bethe free energy identity (f64)."""
    g = mp.graph_from_edges(6, [(0, 1), (1, 2), (1, 3), (3, 4), (3, 5)])
    tables = _tables(g, jnp.float64)
    T, D = 3, 12
    plan = bigsweep.SegPlan(g, slots=4, seg_rows=8)
    st = bigsweep.seg_init(plan, tables, T, D, dtype=jnp.float64)
    st, nit, delta = bigsweep.iterate_seg(
        tables, st, mp.TruncBond(D), T, D, maxiter=40, tol=1e-11,
        method="sketch")
    b = bigsweep.seg_beliefs(st, T, 2)
    bp = mp.mpbp(g, tables, T=T, D=D)
    err = np.abs(b - exact.exact_marginals(bp)).max()
    assert err < 1e-7      # beliefs follow the state dtype (f64 here)
    _, Z = exact.exact_prob(bp)
    assert np.isclose(-bigsweep.seg_free_energy(st), np.log(Z), atol=1e-5)
