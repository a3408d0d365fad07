"""Soft-margin sampler sanity vs BP (mirrors ``test/sampling.jl``) and pair
observations reweighting vs enumeration (mirrors ``test/pair_observations.jl``)."""
import jax
import numpy as np

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import exact, sampling
from matrixproductbp_tpu.observations import (pair_observations_directed,
                                              pair_obs_undirected_to_directed)
from matrixproductbp_tpu.models import SIS, mpbp_sis


def tree():
    return mp.graph_from_edges(4, [(0, 1), (0, 2), (2, 3)])


def test_sampler_matches_bp_marginals():
    g = tree()
    sis = SIS(g, lam=0.3, rho=0.2, T=3, gamma=0.4)
    bp = mpbp_sis(sis, D=16)
    bp, _, _ = mp.iterate(bp, maxiter=15, trunc=mp.TruncThresh(0.0), tol=1e-12)
    b = np.asarray(mp.beliefs(bp))
    sms = sampling.sample(bp, 20000, key=jax.random.PRNGKey(1))
    m, err = sampling.marginals_mc(sms)
    assert np.all(np.abs(m - b) < 6 * np.maximum(err, 5e-3))


def test_sampler_weighted_by_observations():
    """With observations the sampler importance-weights; marginals must still
    agree with BP/exact on the tree."""
    g = tree()
    sis = SIS(g, lam=0.3, rho=0.2, T=2, gamma=0.4)
    bp = mpbp_sis(sis, D=16)
    rng = np.random.default_rng(0)
    bp, X, _ = sampling.draw_node_observations(bp, nobs=2, rng=rng,
                                               softinf=50.0)
    bp, _, _ = mp.iterate(bp, maxiter=15, trunc=mp.TruncThresh(0.0), tol=1e-12)
    p_ex, _ = exact.exact_prob(bp)
    m_ex = exact.exact_marginals(bp, p_ex)
    assert np.allclose(np.asarray(mp.beliefs(bp)), m_ex, atol=1e-8)
    sms = sampling.sample(bp, 40000, key=jax.random.PRNGKey(2))
    m, err = sampling.marginals_mc(sms)
    assert np.all(np.abs(m - m_ex) < 6 * np.maximum(err, 8e-3))


def test_pair_marginals_mc():
    g = tree()
    sis = SIS(g, lam=0.3, rho=0.2, T=2, gamma=0.4)
    bp = mpbp_sis(sis, D=16)
    bp, _, _ = mp.iterate(bp, maxiter=15, trunc=mp.TruncThresh(0.0), tol=1e-12)
    pb, _ = mp.pair_beliefs(bp)
    sms = sampling.sample(bp, 20000, key=jax.random.PRNGKey(3))
    m, err = sampling.pair_marginals_mc(sms)
    assert np.all(np.abs(m - np.asarray(pb)) < 6 * np.maximum(err, 8e-3))


def test_pair_observations_vs_exact():
    """Edge reweighting psi: BP == exact with nontrivial pair observations
    (``test/pair_observations.jl:43-57``)."""
    g = tree()
    T = 2
    rng = np.random.default_rng(5)
    obs = [(0, 2, 1, rng.uniform(0.2, 1.0, (2, 2))),
           (2, 3, 2, rng.uniform(0.2, 1.0, (2, 2)))]
    psi = pair_observations_directed(obs, g, T, 2)
    sis = SIS(g, lam=0.3, rho=0.2, T=T, gamma=0.4, psi=psi)
    bp = mpbp_sis(sis, D=16)
    bp, _, _ = mp.iterate(bp, maxiter=20, trunc=mp.TruncThresh(0.0), tol=1e-12)
    p_ex, Z = exact.exact_prob(bp)
    assert np.allclose(np.asarray(mp.beliefs(bp)),
                       exact.exact_marginals(bp, p_ex), atol=1e-8)
    assert np.isclose(-float(mp.bethe_free_energy(bp)), np.log(Z), atol=1e-8)


def test_undirected_to_directed():
    g = tree()
    T1 = 2
    rng = np.random.default_rng(1)
    psi_u = rng.uniform(0.5, 1.0, (g.E // 2, T1, 2, 2))
    psi = pair_obs_undirected_to_directed(psi_u, g)
    rev = g.rev_edge
    assert np.allclose(psi, psi[rev].transpose(0, 1, 3, 2))


def test_gillespie_runs():
    g = tree()
    sis = SIS(g, lam=0.4, rho=0.1, T=3, gamma=0.5)
    rng = np.random.default_rng(7)
    av, sd = sampling.continuous_sis_sampler(sis, T=3.0, lam=0.4, rho=0.1,
                                             nsamples=200, nbins=10, rng=rng)
    assert av.shape == (4, 11)
    assert np.all(av >= -1.0) and np.all(av <= 1.0)


def test_hard_observation_log_semantics():
    """Hard (zero-probability) observations give -inf trajectory log-weights
    without RuntimeWarnings (the log(0)s are intentional; exact.py wraps them
    in errstate) and exact_prob zeroes exactly the excluded trajectories."""
    import dataclasses
    import warnings as _w
    import jax.numpy as jnp
    g = mp.graph_from_edges(2, [(0, 1)])
    sis = SIS(g, 0.4, 0.2, T=1, gamma=0.5)
    bp = mpbp_sis(sis, D=4)
    phi = np.asarray(bp.phi).copy()
    phi[0, 1] = [1.0, 0.0]       # hard observation: node 0 susceptible at t=1
    bp = dataclasses.replace(bp, phi=jnp.asarray(phi))
    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        p_ex, Z = exact.exact_prob(bp)
    assert np.isclose(p_ex.sum(), 1.0) and np.isfinite(np.log(Z))
    X = exact._decode_all(len(p_ex), 2, 2, 2)    # [Q, N, T1]
    assert np.all(p_ex[X[:, 0, 1] == 1] == 0.0)
    assert p_ex[X[:, 0, 1] == 0].sum() > 0
