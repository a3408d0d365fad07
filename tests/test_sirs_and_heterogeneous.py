"""SIRS and heterogeneous-SIS gates vs enumeration + the uniform-parameter
equivalence (mirrors ``test/sirs_small_tree.jl`` and
``test/sis_heterogeneous_compare_homogeneous.jl``)."""
import numpy as np

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import exact
from matrixproductbp_tpu.models import (SIRS, mpbp_sirs, SIS, mpbp_sis,
                                        SISHeterogeneous,
                                        mpbp_sis_heterogeneous)

TRUNC = mp.TruncThresh(0.0)


def tree():
    return mp.graph_from_edges(4, [(0, 1), (0, 2), (2, 3)])


def test_sirs_tree_vs_exact():
    g = tree()
    sirs = SIRS(g, lam=0.3, rho=0.2, sigma=0.15, T=2, gamma=0.4, alpha=0.05)
    bp = mpbp_sirs(sirs, D=18)
    bp, _, _ = mp.iterate(bp, maxiter=15, trunc=TRUNC, tol=1e-13)
    p_ex, Z = exact.exact_prob(bp)
    b = np.asarray(mp.beliefs(bp))
    m_ex = exact.exact_marginals(bp, p_ex)
    assert np.allclose(b, m_ex, atol=1e-8)
    assert np.isclose(-float(mp.bethe_free_energy(bp)), np.log(Z), atol=1e-8)


def test_sis_heterogeneous_tree_vs_exact():
    g = tree()
    rng = np.random.default_rng(0)
    lam_d = rng.uniform(0.1, 0.5, g.E)
    rho = rng.uniform(0.1, 0.4, g.N)
    het = SISHeterogeneous(g, lam_d, rho, T=2, gamma=0.3)
    bp = mpbp_sis_heterogeneous(het, D=16)
    bp, _, _ = mp.iterate(bp, maxiter=15, trunc=TRUNC, tol=1e-13)
    p_ex, Z = exact.exact_prob(bp)
    b = np.asarray(mp.beliefs(bp))
    m_ex = exact.exact_marginals(bp, p_ex)
    assert np.allclose(b, m_ex, atol=1e-8)
    assert np.isclose(-float(mp.bethe_free_energy(bp)), np.log(Z), atol=1e-8)


def test_heterogeneous_uniform_equals_homogeneous():
    """Uniform per-edge/node parameters must reproduce plain SIS
    (``test/sis_heterogeneous_compare_homogeneous.jl:19-35``)."""
    g = tree()
    lam, rho = 0.3, 0.2
    sis = SIS(g, lam, rho, T=2, gamma=0.4)
    bp1 = mpbp_sis(sis, D=16)
    bp1, _, _ = mp.iterate(bp1, maxiter=15, trunc=TRUNC, tol=1e-13)
    het = SISHeterogeneous(g, np.full(g.E, lam), np.full(g.N, rho), T=2,
                           gamma=0.4)
    bp2 = mpbp_sis_heterogeneous(het, D=16)
    bp2, _, _ = mp.iterate(bp2, maxiter=15, trunc=TRUNC, tol=1e-13)
    assert np.allclose(np.asarray(mp.beliefs(bp1)),
                       np.asarray(mp.beliefs(bp2)), atol=1e-9)
    assert np.isclose(float(mp.bethe_free_energy(bp1)),
                      float(mp.bethe_free_energy(bp2)), atol=1e-9)
