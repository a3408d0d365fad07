"""High-degree scalability: the star-graph anchor (BASELINE.md row 4).

The reference's flagship scaling result (``notebooks/sis_star_graph.ipynb``)
is that the recursive path runs star graphs to N=100 in poly(degree) while
the generic path is exp(degree).  Here the analogous regression risk is the
*dense* ``Pyy`` merge: for sum-type y (homogeneous Glauber, Y = d+1) it costs
Y^3 per merge and needs a [d, Y, Y, Y, q] table.  The banded (Toeplitz) merge
(``ops/sumy.py``) plus degree-bucketed sweep keep the hub polynomial and the
leaves cheap.

Gates:
 * N=7 star: banded fast path == exhaustive enumeration (exactness at the
   hub with Y=7);
 * N=100 star, T=10, D=5: one Glauber sweep completes in bounded time and
   yields normalized, finite beliefs matching the N=100 leaf-field theory
   sanity bound (hub magnetization sign).
 * bucketed sweep == single-bucket sweep on an irregular graph (exactness of
   the bucketing itself).
"""
import time

import numpy as np
import pytest

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import exact
from matrixproductbp_tpu.factors import build_tables
from matrixproductbp_tpu.models import (HomogeneousGlauberFactorSpec,
                                        SISFactorSpec)


def test_star5_banded_glauber_matches_enumeration():
    g = mp.star_graph(5)
    specs = [HomogeneousGlauberFactorSpec(0.3, 0.1, 0.7)] * g.N
    tables = build_tables(g, specs)
    assert tables.yy_off == 0 and tables.Pyy.shape[-3] == 1  # banded, no Pyy
    phi = np.ones((g.N, 3, 2))
    phi[:, 0] = [0.6, 0.4]
    bp = mp.mpbp(g, tables, T=2, D=16, phi=phi)
    bp, _, _ = mp.iterate(bp, maxiter=15, trunc=mp.TruncThresh(0.0), tol=1e-13)
    p_ex, Z = exact.exact_prob(bp)
    assert np.allclose(np.asarray(mp.beliefs(bp)),
                       exact.exact_marginals(bp, p_ex), atol=1e-9)
    assert np.isclose(-float(mp.bethe_free_energy(bp)), np.log(Z), atol=1e-9)


@pytest.mark.slow
def test_star100_glauber_poly_degree():
    """Degree-99 hub: Y=100 banded merges + bucketing keep the sweep tractable
    (the dense path would need a ~10^6-entry Pyy per slot and Y^3 merges)."""
    N = 100
    g = mp.star_graph(N)
    specs = [HomogeneousGlauberFactorSpec(0.2, 0.05, 0.5)] * N
    t0 = time.time()
    tables = build_tables(g, specs)
    build_s = time.time() - t0
    phi = np.ones((N, 11, 2))
    phi[:, 0] = [0.7, 0.3]
    bp = mp.mpbp(g, tables, T=10, D=5, phi=phi)
    t0 = time.time()
    bp, n, deltas = mp.iterate(bp, maxiter=3, trunc=mp.TruncBond(5), tol=1e-9)
    sweep_s = (time.time() - t0) / max(n, 1)
    b = np.asarray(mp.beliefs(bp))
    assert np.all(np.isfinite(b))
    assert np.allclose(b.sum(-1), 1.0, atol=1e-8)
    # ferromagnetic J>0 with +h bias and up-leaning init: hub leans up (x=0)
    assert b[0, -1, 0] > 0.5
    # poly(d) evidence: bounded wall time on the 2-core CPU box
    assert build_s < 120 and sweep_s < 300, (build_s, sweep_s)


def test_bucketed_sweep_equals_global_padding():
    """Degree bucketing is exact: beliefs/messages identical to a fully
    padded single-bucket sweep on an irregular (ER) instance."""
    import dataclasses
    rng = np.random.default_rng(5)
    g = mp.erdos_renyi_graph(14, 2.5, rng)
    spec = SISFactorSpec(0.3, 0.2, alpha=0.05)
    tables = build_tables(g, [spec] * g.N)
    phi = np.ones((g.N, 4, 2))
    phi[:, 0] = [0.6, 0.4]
    bp = mp.mpbp(g, tables, T=3, D=8, phi=phi)

    bp_b, _, _ = mp.iterate(bp, maxiter=6, trunc=mp.TruncBond(8), tol=0.0)

    # force one bucket by erasing ydims and lying that all degrees = dmax:
    # pad the degree array is not possible (graph static); instead compare
    # against a graph whose buckets are disabled via uniform dmax padding —
    # easiest exact foil: same sweep with ydims=None (no Y cropping) and a
    # degree array forced to one bucket by monkeypatching _degree_buckets.
    import matrixproductbp_tpu.bp as bpmod
    orig = bpmod._degree_buckets
    try:
        bpmod._degree_buckets = lambda graph: [
            (np.arange(graph.N), graph.dmax)]
        tables2 = dataclasses.replace(tables, ydims=None)
        bp2 = mp.mpbp(g, tables2, T=3, D=8, phi=phi)
        bp_g, _, _ = mp.iterate(bp2, maxiter=6, trunc=mp.TruncBond(8), tol=0.0)
    finally:
        bpmod._degree_buckets = orig

    assert np.allclose(np.asarray(mp.beliefs(bp_b)),
                       np.asarray(mp.beliefs(bp_g)), atol=1e-11)
    assert np.allclose(np.asarray(bp_b.f), np.asarray(bp_g.f), atol=1e-11)
