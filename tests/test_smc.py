"""Particle-sharded SMC sampler (matrixproductbp_tpu/smc.py).

Gates: (a) posterior marginals vs the exact-enumeration oracle under strong
observations (where plain importance sampling degenerates), (b) the evidence
estimate vs the exact partition function, (c) mesh-sharded run reproduces the
single-device run bit-for-bit (same keys; the resampling gather is the only
cross-shard op), (d) without observations it reduces to the prior sampler.
"""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import exact, sampling, smc
from matrixproductbp_tpu.models.sis import SISFactorSpec


def _observed_bp(T=3, seed=3):
    g = mp.graph_from_edges(4, [(0, 1), (1, 2), (1, 3)])
    tables = mp.build_tables(g, [SISFactorSpec(lam=0.3, rho=0.25)] * g.N)
    phi = np.ones((g.N, T + 1, 2))
    phi[:, 0] = [0.6, 0.4]
    bp = mp.mpbp(g, tables, T=T, D=8, phi=phi)
    rng = np.random.default_rng(seed)
    bp, X, obs = sampling.draw_node_observations(bp, 5, rng, softinf=20.0)
    return bp


def test_smc_posterior_marginals_vs_exact():
    bp = _observed_bp()
    p_ex, Z = exact.exact_prob(bp)
    m_ex = exact.exact_marginals(bp, p_ex)
    sms = smc.smc_sample(bp, 16384, key=jax.random.PRNGKey(0))
    m, err = sampling.marginals_mc(sms)
    assert np.abs(m - m_ex).max() < 0.03
    # evidence estimate vs exact partition function (free prior => Z_prior=1)
    assert abs(sms.log_evidence - np.log(Z)) < 0.06


def test_smc_resampling_triggers_and_beats_degeneracy():
    bp = _observed_bp()
    sms = smc.smc_sample(bp, 2048, key=jax.random.PRNGKey(1), ess_frac=0.9)
    # with aggressive resampling the residual weights stay non-degenerate
    ess = float(smc.effective_sample_size(np.asarray(sms.logw)))
    assert ess > 0.3 * 2048


def test_smc_sharded_matches_single_device():
    bp = _observed_bp()
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("p",))
    sms1 = smc.smc_sample(bp, 1024, key=jax.random.PRNGKey(2))
    sms8 = smc.smc_sample(bp, 1024, key=jax.random.PRNGKey(2), mesh=mesh)
    np.testing.assert_array_equal(sms1.X, sms8.X)
    np.testing.assert_allclose(sms1.logw, sms8.logw, rtol=1e-12)


def test_smc_reduces_to_prior_sampler_without_observations():
    g = mp.graph_from_edges(3, [(0, 1), (1, 2)])
    tables = mp.build_tables(g, [SISFactorSpec(lam=0.3, rho=0.25)] * g.N)
    phi = np.ones((g.N, 4, 2))
    phi[:, 0] = [0.7, 0.3]
    bp = mp.mpbp(g, tables, T=3, D=4, phi=phi)
    sms = smc.smc_sample(bp, 4096, key=jax.random.PRNGKey(3))
    # no reweighting: weights stay exactly zero in log-domain, no resampling
    assert np.allclose(sms.logw, 0.0)
    m, _ = sampling.marginals_mc(sms)
    p_ex, _ = exact.exact_prob(bp)
    m_ex = exact.exact_marginals(bp, p_ex)
    assert np.abs(m - m_ex).max() < 0.04
