"""Model-level convenience constructors: periodic and stationary variants
(reference ``periodic_mpbp(::Model)`` / ``mpbp_stationary(::Model)``,
``Models/glauber/glauber_bp.jl:102-116``, ``epidemics/sis_bp.jl:48-58``,
``sis_heterogeneous_bp.jl:52-56``)."""
import numpy as np

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import exact
from matrixproductbp_tpu.models import (
    SIS, SIRS, Ising, Glauber, SISHeterogeneous,
    periodic_mpbp_sis, periodic_mpbp_sirs, periodic_mpbp_glauber,
    periodic_mpbp_sis_heterogeneous, mpbp_stationary_sis,
    mpbp_stationary_glauber)


def test_periodic_sis_constructor_vs_enumeration():
    g = mp.graph_from_edges(3, [(0, 1), (1, 2)])
    T = 2
    sis = SIS(g, 0.35, 0.25, T, gamma=0.3)
    # free dynamics for the trace closure (like the reference periodic tests)
    sis.phi = np.ones((g.N, T + 1, 2))
    bp = periodic_mpbp_sis(sis, D=16)
    assert mp.is_periodic(bp)
    bp, _, _ = mp.iterate(bp, maxiter=20, trunc=mp.TruncThresh(0.0), tol=1e-12)
    p_ex, Z = exact.exact_prob(bp)
    assert np.allclose(np.asarray(mp.beliefs(bp)),
                       exact.exact_marginals(bp, p_ex), atol=1e-8)


def test_periodic_constructors_smoke():
    g = mp.graph_from_edges(3, [(0, 1), (1, 2)])
    T = 2
    sirs = SIRS(g, 0.3, 0.2, 0.1, T, gamma=0.3)
    bp = periodic_mpbp_sirs(sirs, D=8)
    assert mp.is_periodic(bp) and bp.q == 3

    lam_d = np.full(g.E, 0.3)
    het = SISHeterogeneous(g, lam_d, np.full(g.N, 0.2), T, gamma=0.3)
    bp = periodic_mpbp_sis_heterogeneous(het, D=8)
    assert mp.is_periodic(bp)

    ising = Ising(g, J=np.full(g.E // 2, 0.4), h=np.zeros(g.N), beta=0.7)
    gl = Glauber(ising, T)
    bp = periodic_mpbp_glauber(gl, D=8)
    assert mp.is_periodic(bp)


def test_stationary_constructors():
    """mpbp_stationary(::SIS/::Glauber): stationary fixed point through the
    model-level constructor matches the hand-assembled one."""
    from matrixproductbp_tpu.stationary import (iterate_stationary,
                                                beliefs_stationary)
    g = mp.graph_from_edges(3, [(0, 1), (1, 2)])
    sis = SIS(g, 0.4, 0.3, T=0, gamma=0.3, alpha=0.05)
    bp = mpbp_stationary_sis(sis, D=4)
    assert np.allclose(bp.phi[:, 1], 0.3)       # gamma lands in phi0
    bp, n, deltas, _ = iterate_stationary(bp, maxiter=40,
                                          trunc=mp.TruncVUMPS(6), tol=1e-10)
    b = beliefs_stationary(bp)
    assert b.shape == (3, 1, 2) or b.shape == (3, 2)
    assert np.all(b >= -1e-12) and np.allclose(b.sum(-1), 1, atol=1e-8)

    ising = Ising(g, J=np.full(g.E // 2, 0.4), h=np.full(g.N, 0.1), beta=0.7)
    gl = Glauber(ising, T=0)
    bps = mpbp_stationary_glauber(gl, D=4)
    bps, _, _, _ = iterate_stationary(bps, maxiter=40,
                                      trunc=mp.TruncVUMPS(6), tol=1e-10)
    bg = beliefs_stationary(bps)
    assert np.allclose(bg.sum(-1), 1, atol=1e-8)
