"""Symmetry-collapse equivalences and equilibrium oracles.

Mirrors reference strategy #3 (``test/glauber_infinite_graph.jl``): BP cannot
distinguish an infinite k-regular graph from the complete graph K_{k+1}, so
their marginals and (suitably rescaled) free energies must match; plus the
population-dynamics equilibrium oracle vs the scalar cavity fixed point
(``test/equilibrium.jl``)."""
import numpy as np
import pytest

import matrixproductbp_tpu as mp
from matrixproductbp_tpu.factors import build_tables
from matrixproductbp_tpu.infinite import (infinite_regular_graph,
                                          infinite_bipartite_graph,
                                          mpbp_infinite_graph,
                                          mpbp_infinite_bipartite_graph,
                                          bethe_free_energy_infinite_bipartite)
from matrixproductbp_tpu.models import (SISFactorSpec,
                                        HomogeneousGlauberFactorSpec,
                                        RandomRegular, equilibrium_observables,
                                        equilibrium_magnetization)

T = 3
TRUNC = mp.TruncThresh(0.0)


def test_infinite_regular_equals_complete_graph():
    """Glauber on the infinite 3-regular graph == K_4 (all nodes equivalent)."""
    J, h, beta = 0.4, 0.15, 0.8
    k = 3
    # complete graph K_4
    g = mp.graph_from_edges(4, [(i, j) for i in range(4) for j in range(i)])
    specs = [HomogeneousGlauberFactorSpec(J, h, beta)] * 4
    bp = mp.mpbp(g, build_tables(g, specs), T, D=24)
    bp, _, _ = mp.iterate(bp, maxiter=25, trunc=TRUNC, tol=1e-12)
    b_complete = np.asarray(mp.beliefs(bp))[0]

    gi = infinite_regular_graph(k)
    tables = build_tables(gi, [HomogeneousGlauberFactorSpec(J, h, beta)])
    bpi = mpbp_infinite_graph(k, tables, T, D=24)
    bpi, _, _ = mp.iterate(bpi, maxiter=60, trunc=TRUNC, tol=1e-12)
    b_inf = np.asarray(mp.beliefs(bpi))[0]

    assert np.allclose(b_complete, b_inf, atol=1e-7), \
        np.abs(b_complete - b_inf).max()


def test_infinite_bipartite_symmetric_equals_regular():
    """Bipartite (k, k) with identical blocks must reproduce the k-regular
    single-message fixed point (``glauber_infinite_graph.jl:48-101``)."""
    lam, rho = 0.25, 0.15
    k = 3
    gi = infinite_regular_graph(k)
    tables = build_tables(gi, [SISFactorSpec(lam, rho, alpha=0.01)])
    phi = np.ones((1, T + 1, 2))
    phi[0, 0] = [0.7, 0.3]
    bp1 = mpbp_infinite_graph(k, tables, T, D=16, phi=phi)
    bp1, _, _ = mp.iterate(bp1, maxiter=60, trunc=TRUNC, tol=1e-12)
    b1 = np.asarray(mp.beliefs(bp1))[0]

    gb = infinite_bipartite_graph(k, k)
    tables2 = build_tables(gb, [SISFactorSpec(lam, rho, alpha=0.01)] * 2)
    phi2 = np.ones((2, T + 1, 2))
    phi2[:, 0] = [0.7, 0.3]
    bp2 = mpbp_infinite_bipartite_graph((k, k), tables2, T, D=16, phi=phi2)
    bp2, _, _ = mp.iterate(bp2, maxiter=60, trunc=TRUNC, tol=1e-12)
    b2 = np.asarray(mp.beliefs(bp2))

    assert np.allclose(b2[0], b1, atol=1e-8)
    assert np.allclose(b2[1], b1, atol=1e-8)
    # symmetric blocks: bipartite free energy reduces to the per-node one
    f1 = float(mp.bethe_free_energy(bp1))
    f2 = bethe_free_energy_infinite_bipartite(bp2)
    assert np.isclose(f1, f2, atol=1e-8)


def test_infinite_graph_pair_route_free_energy():
    """Pair route on the infinite graph: per-node F via belief + pair lognorms
    (k/2-weighted through the aliased in-edges) equals the sweep ledger, and
    ``pair_beliefs`` logz carries the (1/(k-1) - 1/2) specialization
    (``infinite_graph.jl:38-44``)."""
    J, h, beta = 0.4, 0.15, 0.8
    k = 3
    gi = infinite_regular_graph(k)
    tables = build_tables(gi, [HomogeneousGlauberFactorSpec(J, h, beta)])
    bpi = mpbp_infinite_graph(k, tables, T, D=24)
    # D=24 gives enough cavity capacity at these parameters for both the
    # sweep ledger and the pair route to agree to 1e-8 (the identity is
    # exact only when the k-message fold is not truncated)
    bpi, _, _ = mp.iterate(bpi, maxiter=60, trunc=TRUNC, tol=1e-12)
    F_pair = float(mp.bethe_free_energy_pair(bpi))
    F = float(mp.bethe_free_energy(bpi))
    assert np.isclose(F_pair, F, atol=1e-8), (F_pair, F)
    _, logz = mp.pair_beliefs(bpi)
    lz_e = float(mp.pair_lognorms(bpi)[0])
    assert np.isclose(float(logz[0]), (1.0 / (k - 1) - 0.5) * lz_e, atol=1e-12)


def test_periodic_infinite_graph_vs_complete():
    """Periodic infinite k-regular == periodic K_{k+1} for beliefs and pair
    beliefs (``test/periodic.jl:71-116``; the reference skips the periodic
    free-energy equality — marked NOT WORKING there — and so do we)."""
    from matrixproductbp_tpu.infinite import periodic_mpbp_infinite_graph
    J, h, beta = 1.0, 0.0, 1.0
    k, Tp = 3, 2
    phi1 = np.ones((1, Tp + 1, 2))
    phi1[0, 0] = [0.75, 0.25]
    phi1[0, 1] = [0.4, 0.6]
    phi1[0, 2] = [0.95, 0.05]
    gi = infinite_regular_graph(k)
    tables = build_tables(gi, [HomogeneousGlauberFactorSpec(J, h, beta)])
    bpi = periodic_mpbp_infinite_graph(k, tables, Tp, D=10, phi=phi1)
    bpi, _, _ = mp.iterate(bpi, maxiter=150, trunc=mp.TruncBond(10),
                           tol=1e-12, damp=0.2)
    b_inf = np.asarray(mp.beliefs(bpi))[0]
    pb_inf = np.asarray(mp.pair_beliefs(bpi)[0])[0]

    N = k + 1
    g = mp.graph_from_edges(N, [(i, j) for i in range(N) for j in range(i)])
    specs = [HomogeneousGlauberFactorSpec(J, h, beta)] * N
    phiN = np.broadcast_to(phi1, (N, Tp + 1, 2)).copy()
    bp = mp.periodic_mpbp(g, build_tables(g, specs), Tp, D=10, phi=phiN)
    bp, _, _ = mp.iterate(bp, maxiter=150, trunc=mp.TruncBond(10), tol=1e-12,
                          damp=0.2)
    b_c = np.asarray(mp.beliefs(bp))[0]
    pb_c = np.asarray(mp.pair_beliefs(bp)[0])[0]

    assert np.allclose(b_inf, b_c, atol=1e-6), np.abs(b_inf - b_c).max()
    assert np.allclose(pb_inf, pb_c, atol=1e-6)


def test_equilibrium_population_dynamics_vs_fixed_point():
    """Population dynamics magnetization == scalar cavity fixed point on RRG
    (``test/equilibrium.jl:9-15``)."""
    k, J, beta, h = 3, 0.5, 1.0, 0.2
    m_fp, r, e = equilibrium_observables(RandomRegular(k), J, beta=beta, h=h)
    m_pop, err = equilibrium_magnetization(
        RandomRegular(k),
        pJ=lambda rng, s: np.full(s, J),
        ph=lambda rng, s: np.full(s, h),
        beta=beta, popsize=2000, maxiter=200, nsamples=2000,
        rng=np.random.default_rng(0))
    assert abs(abs(m_fp) - m_pop) < max(5 * err, 0.02), (m_fp, m_pop, err)


def test_inference_metrics():
    from matrixproductbp_tpu.models import roc, auc, kl_marginals, l1_marginals
    guess = [3, 1, 2, 0]
    true_zp = [3]
    x, y = roc(guess, true_zp)
    assert y[-1] == 1
    assert auc(guess, true_zp) == 1.0          # true positive ranked first
    assert auc([0, 1, 2, 3], [3]) == 0.0       # ranked last
    b1 = np.full((2, 3, 2), 0.5)
    b2 = np.stack([np.full((3, 2), 0.5), np.tile([0.8, 0.2], (3, 1))])
    assert np.all(kl_marginals(b1, b1) == 0)
    assert np.all(l1_marginals(b1, b2)[0] >= 0)
