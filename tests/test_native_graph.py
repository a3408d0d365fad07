"""Native C++ graph builder/partitioner vs the pure-Python reference path."""
import numpy as np
import pytest

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import native
from matrixproductbp_tpu.parallel import partition_nodes, edge_cut


def _edges(rng, N, m):
    e = set()
    while len(e) < m:
        i, j = rng.integers(0, N, 2)
        if i != j:
            e.add((min(int(i), int(j)), max(int(i), int(j))))
    return list(e)


def test_native_matches_python():
    if native._load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    edges = _edges(rng, 50, 120)
    g_py = mp.graph_from_edges(50, edges, native=False)
    g_cc = mp.graph_from_edges(50, edges, native=True)
    assert g_py.E == g_cc.E and g_py.dmax == g_cc.dmax
    np.testing.assert_array_equal(g_py.edge_src, g_cc.edge_src)
    np.testing.assert_array_equal(g_py.edge_dst, g_cc.edge_dst)
    np.testing.assert_array_equal(g_py.rev_edge, g_cc.rev_edge)
    np.testing.assert_array_equal(g_py.in_edges, g_cc.in_edges)
    np.testing.assert_array_equal(g_py.in_mask, g_cc.in_mask)
    np.testing.assert_array_equal(g_py.nbr, g_cc.nbr)
    np.testing.assert_array_equal(g_py.degree, g_cc.degree)


def test_native_partition_valid():
    if native._load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(1)
    g = mp.random_regular_graph(96, 3, rng)
    order = rng.permutation(96).astype(np.int32)
    part = native.partition_native(g, 4, order)
    assert part is not None
    counts = np.bincount(part, minlength=4)
    assert counts.sum() == 96
    assert counts.max() <= 96 // 4 + 8
    assert edge_cut(g, part) < g.E
