"""Time-varying factors w[i][t] (reference ``mpbp.jl:3,22``: one BPFactor per
node per time step).  Gates:

* stacked-constant tables reproduce the constant-table path exactly,
* genuinely time-varying dynamics match exhaustive enumeration on a tree,
* sampler and logprob agree with the time-varying oracle.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import exact
from matrixproductbp_tpu.bp import mpbp as make_mpbp
from matrixproductbp_tpu.models.sis import SISFactorSpec


def _tree():
    # 4-node tree: 0-1, 1-2, 1-3
    return mp.graph_from_edges(4, [(0, 1), (1, 2), (1, 3)])


def _lam_t(t):
    return 0.15 + 0.1 * t


def _tv_setup(T=3):
    g = _tree()
    rng = np.random.default_rng(5)
    specs_t = [[SISFactorSpec(lam=_lam_t(t), rho=0.3 + 0.05 * t)
                for t in range(T + 1)] for _ in range(g.N)]
    tables = mp.build_tables_t(g, specs_t)
    phi = rng.uniform(0.3, 1.0, size=(g.N, T + 1, 2))
    return g, tables, phi


def test_stacked_constant_matches_constant_path():
    g = _tree()
    T = 3
    specs = [SISFactorSpec(lam=0.3, rho=0.2) for _ in range(g.N)]
    tb_const = mp.build_tables(g, specs)
    tb_tv = mp.build_tables_t(g, [[specs[i]] * (T + 1) for i in range(g.N)])
    assert tb_tv.time_varying and not tb_const.time_varying

    phi = np.ones((g.N, T + 1, 2))
    phi[:, 0, 1] = 0.4  # nonuniform init
    bp0 = make_mpbp(g, tb_const, T=T, D=8, phi=phi)
    bp1 = make_mpbp(g, tb_tv, T=T, D=8, phi=phi)
    for _ in range(4):
        bp0 = mp.bp_sweep(bp0, mp.TruncBond(8))
        bp1 = mp.bp_sweep(bp1, mp.TruncBond(8))
    np.testing.assert_allclose(np.asarray(mp.beliefs(bp0)),
                               np.asarray(mp.beliefs(bp1)), atol=1e-12)
    assert np.isclose(float(mp.bethe_free_energy(bp0)),
                      float(mp.bethe_free_energy(bp1)), atol=1e-12)


@pytest.mark.parametrize("method", ["qr", "sketch"])
def test_time_varying_matches_enumeration(method):
    g, tables, phi = _tv_setup(T=3)
    bp = make_mpbp(g, tables, T=3, D=12, phi=phi)
    bp, n, _ = mp.iterate(bp, maxiter=12, trunc=mp.TruncBond(12), tol=1e-13,
                          method=method)
    b = np.asarray(mp.beliefs(bp))
    m_ex = exact.exact_marginals(bp)
    tol = 1e-9 if method == "qr" else 1e-7
    assert np.abs(b - m_ex).max() < tol, np.abs(b - m_ex).max()
    # partition function vs Bethe free energy (tree => exact)
    _, Z = exact.exact_prob(bp)
    assert np.isclose(-float(mp.bethe_free_energy(bp)), np.log(Z), atol=1e-8)


def test_time_varying_pair_and_alternate_marginals():
    g, tables, phi = _tv_setup(T=2)
    bp = make_mpbp(g, tables, T=2, D=12, phi=phi)
    bp, _, _ = mp.iterate(bp, maxiter=10, trunc=mp.TruncBond(12), tol=1e-13)
    pb, _ = mp.pair_beliefs(bp)
    pb_ex = exact.exact_pair_marginals(bp)
    assert np.abs(np.asarray(pb) - pb_ex).max() < 1e-9
    am = np.asarray(mp.alternate_marginals(bp))
    am_ex = exact.exact_alternate_marginals(bp)
    assert np.abs(am - am_ex).max() < 1e-9


def test_time_varying_logprob_and_sampler():
    g, tables, phi = _tv_setup(T=2)
    bp = make_mpbp(g, tables, T=2, D=8, phi=phi)
    p, Z = exact.exact_prob(bp)
    X = exact._decode_all(len(p), 2, g.N, 3)
    rng = np.random.default_rng(0)
    feasible = np.nonzero(p > 1e-12)[0]  # SIS forbids spontaneous infection
    for idx in rng.choice(feasible, size=10, replace=False):
        lp = mp.bp.logprob(bp, X[idx])  # unnormalized (reference convention)
        assert np.isclose(lp, np.log(p[idx]) + np.log(Z), atol=1e-9)
    # sampler: weighted marginals approach the exact ones
    import jax
    sms = mp.sampling.sample(bp, 20000, key=jax.random.PRNGKey(1))
    m_mc, err = mp.sampling.marginals_mc(sms)
    m_ex = exact.exact_marginals(bp)
    assert np.abs(m_mc - m_ex).max() < 0.03
