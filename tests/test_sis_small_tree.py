"""End-to-end accuracy gate: SIS on a small tree vs exhaustive enumeration.

Mirrors the reference test strategy (``test/sis_small_tree.jl``): on a tree
with near-exact truncation, BP is exact — partition function (via the Bethe
free energy), single-site marginals, pair marginals and autocorrelations must
all match enumeration to high precision (SURVEY.md §4, BASELINE.md gate).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import exact
from matrixproductbp_tpu.models import SIS, mpbp_sis, INFECTIOUS


def make_bp(T=2, D=16, lam=0.35, rho=0.25, gamma=0.4, alpha=0.0, psi=None):
    # 4-node tree:  1 - 0 - 2,  2 - 3
    g = mp.graph_from_edges(4, [(0, 1), (0, 2), (2, 3)])
    sis = SIS(g, lam, rho, T, gamma=gamma, alpha=alpha, psi=psi)
    return mpbp_sis(sis, D=D)


@pytest.fixture(scope="module")
def converged():
    bp = make_bp()
    trunc = mp.TruncThresh(0.0)
    bp, iters, deltas = mp.iterate(bp, maxiter=12, trunc=trunc, tol=1e-13)
    p_ex, Z = exact.exact_prob(bp)
    return bp, p_ex, Z


def test_marginals_match_exact(converged):
    bp, p_ex, _ = converged
    b = np.asarray(mp.beliefs(bp))
    m_ex = exact.exact_marginals(bp, p_ex)
    assert np.allclose(b, m_ex, atol=1e-9)


def test_free_energy_matches_logZ(converged):
    bp, _, Z = converged
    F = float(mp.bethe_free_energy(bp))
    assert np.isclose(-F, np.log(Z), atol=1e-9)


def test_pair_marginals_match_exact(converged):
    bp, p_ex, _ = converged
    pb, _ = mp.pair_beliefs(bp)
    pb = np.asarray(pb)
    pm_ex = exact.exact_pair_marginals(bp, p_ex)
    assert np.allclose(pb, pm_ex, atol=1e-8)


def test_pair_logz_assembles_free_energy(converged):
    """Pair route to the Bethe free energy (mpbp.jl:218-235):
    F = sum_i [-log ẑ_i + 1/2 sum_{j∈∂i} log ẑ_ij] with ẑ from the *stored*
    messages; must equal the sweep-ledger F and -log Z_exact on a tree."""
    bp, _, Z = converged
    F_pair = float(mp.bethe_free_energy_pair(bp))
    F = float(mp.bethe_free_energy(bp))
    assert np.isclose(F_pair, F, atol=1e-9)
    assert np.isclose(-F_pair, np.log(Z), atol=1e-9)
    # consistency of the components: node assembly with (1/d_j - 1/2) weights
    # (the reference's pair_beliefs logz output) vs raw per-edge lognorms
    _, logz_pair = mp.pair_beliefs(bp)
    lz_e = np.asarray(mp.pair_lognorms(bp))
    dst = bp.graph.edge_dst
    deg = np.asarray(bp.graph.degree, float)
    expect = np.zeros(bp.N)
    np.add.at(expect, dst, (1.0 / deg[dst] - 0.5) * lz_e)
    assert np.allclose(np.asarray(logz_pair), expect, atol=1e-10)


def test_autocorrelations_match_exact(converged):
    bp, p_ex, _ = converged
    r = np.asarray(mp.autocorrelations(bp))
    r_ex = exact.exact_autocorrelations(bp, p=p_ex)
    assert np.allclose(r, r_ex, atol=1e-8)


def test_autocovariances_match_exact(converged):
    bp, p_ex, _ = converged
    c = np.asarray(mp.autocovariances(bp))
    c_ex = exact.exact_autocovariances(bp, p=p_ex)
    assert np.allclose(c, c_ex, atol=1e-8)


def test_alternate_marginals_match_exact(converged):
    bp, p_ex, _ = converged
    am = np.asarray(mp.alternate_marginals(bp))
    am_ex = exact.exact_alternate_marginals(bp, p_ex)
    assert np.allclose(am, am_ex, atol=1e-8)


def test_observations_reweighting():
    """Soft observations (phi reweighting) keep BP == exact on the tree."""
    bp = make_bp()
    phi = np.asarray(bp.phi).copy()
    phi[1, 2] = [0.2, 0.8]   # observe node 1 at final time
    phi[3, 1] = [0.9, 0.1]
    bp = mp.MPBP(bp.tables, jnp.asarray(phi), bp.psi, bp.msg_cores,
                 bp.msg_logz, bp.bel_cores, bp.bel_logz, bp.f, bp.garrays,
                 bp.graph)
    bp, _, _ = mp.iterate(bp, maxiter=15, trunc=mp.TruncThresh(0.0), tol=1e-13)
    p_ex, Z = exact.exact_prob(bp)
    b = np.asarray(mp.beliefs(bp))
    m_ex = exact.exact_marginals(bp, p_ex)
    assert np.allclose(b, m_ex, atol=1e-9)
    assert np.isclose(-float(mp.bethe_free_energy(bp)), np.log(Z), atol=1e-9)


def test_damping_reaches_same_fixed_point():
    bp = make_bp()
    bp, _, _ = mp.iterate(bp, maxiter=25, trunc=mp.TruncThresh(0.0),
                          tol=1e-13, damp=0.3)
    p_ex, _ = exact.exact_prob(bp)
    b = np.asarray(mp.beliefs(bp))
    m_ex = exact.exact_marginals(bp, p_ex)
    assert np.allclose(b, m_ex, atol=1e-8)
