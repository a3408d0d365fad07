"""bp_sweep_chunked vs bp_sweep: identical math, bounded memory.

The chunked sweep must reproduce the monolithic sweep exactly — same Jacobi
semantics (all chunks read pre-sweep messages), same per-node update, same
sketch key — on a graph with mixed degrees (multiple buckets) and a chunk
size that forces padding of the last partial chunk.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import matrixproductbp_tpu as mp
from matrixproductbp_tpu.graph import random_regular_graph
from matrixproductbp_tpu.models.sis import SISFactorSpec


def _mixed_graph():
    # star-ish + chain: degrees 1..4 => multiple power-of-two buckets
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (4, 5), (5, 6), (6, 7),
             (7, 8), (8, 9), (2, 9)]
    return mp.graph_from_edges(10, edges)


@pytest.mark.parametrize("method", ["qr", "sketch"])
def test_chunked_equals_monolithic(method):
    g = _mixed_graph()
    tables = mp.build_tables(g, [SISFactorSpec(lam=0.2, rho=0.3)] * g.N)
    bp0 = mp.mpbp(g, tables, T=4, D=8)
    trunc = mp.TruncBond(8)

    a = mp.bp_sweep(bp0, trunc, method=method)
    b = mp.bp_sweep_chunked(bp0, trunc, method=method, chunk=3)

    np.testing.assert_allclose(np.asarray(a.msg_cores),
                               np.asarray(b.msg_cores), rtol=1e-12,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(a.msg_logz),
                               np.asarray(b.msg_logz), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(a.bel_cores),
                               np.asarray(b.bel_cores), rtol=1e-12,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(a.f), np.asarray(b.f), rtol=1e-12,
                               atol=1e-12)


def test_chunked_preserves_input_state():
    """_scatter_rows donates buffers; the caller's bp must stay readable."""
    g = _mixed_graph()
    tables = mp.build_tables(g, [SISFactorSpec(lam=0.2, rho=0.3)] * g.N)
    bp0 = mp.mpbp(g, tables, T=3, D=6)
    before = np.asarray(bp0.msg_cores).copy()
    mp.bp_sweep_chunked(bp0, mp.TruncBond(6), method="sketch", chunk=4)
    np.testing.assert_array_equal(np.asarray(bp0.msg_cores), before)


def test_chunked_iterate_converges_to_oracle():
    from matrixproductbp_tpu import exact
    g = mp.graph_from_edges(5, [(0, 1), (1, 2), (1, 3), (3, 4)])
    tables = mp.build_tables(g, [SISFactorSpec(lam=0.2, rho=0.3)] * g.N)
    bp = mp.mpbp(g, tables, T=3, D=12)
    bp, n, _ = mp.iterate(bp, maxiter=20, trunc=mp.TruncBond(12), tol=1e-12,
                          chunk=2)
    b = np.asarray(mp.beliefs(bp))
    err = np.abs(b - exact.exact_marginals(bp)).max()
    assert err < 1e-9
