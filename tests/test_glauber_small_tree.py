"""Glauber accuracy gates: all four factor variants vs exact enumeration,
cross-validation of fast vs trace paths, and the observe-everything identity.
Mirrors ``test/glauber_small_tree.jl`` / ``glauber_pmJ_small_tree.jl``."""
import numpy as np
import pytest

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import exact, sampling
from matrixproductbp_tpu.models.glauber import (
    Ising, Glauber, mpbp_glauber, glauber_factor_specs,
    HomogeneousGlauberFactorSpec, PMJGlauberFactorSpec,
    IntegerGlauberFactorSpec)

T = 2
TRUNC = mp.TruncThresh(0.0)


def tree():
    return mp.graph_from_edges(4, [(0, 1), (0, 2), (2, 3)])


def run(ising, D=24, force=None, maxiter=15):
    gl = Glauber(ising, T)
    bp = mpbp_glauber(gl, D=D, force=force)
    bp, _, _ = mp.iterate(bp, maxiter=maxiter, trunc=TRUNC, tol=1e-13)
    return bp


def check_vs_exact(bp, atol=1e-8):
    p_ex, Z = exact.exact_prob(bp)
    b = np.asarray(mp.beliefs(bp))
    m_ex = exact.exact_marginals(bp, p_ex)
    assert np.allclose(b, m_ex, atol=atol)
    assert np.isclose(-float(mp.bethe_free_energy(bp)), np.log(Z), atol=atol)
    return b


def test_homogeneous():
    ising = Ising(tree(), J=[0.5, 0.5, 0.5], h=[0.2, -0.1, 0.0, 0.3], beta=0.7)
    specs = glauber_factor_specs(ising)
    assert all(isinstance(s, HomogeneousGlauberFactorSpec) for s in specs)
    check_vs_exact(run(ising))


def test_pmj():
    ising = Ising(tree(), J=[0.5, -0.5, 0.5], h=[0.2, -0.1, 0.0, 0.3], beta=0.9)
    specs = glauber_factor_specs(ising)
    assert all(isinstance(s, PMJGlauberFactorSpec) for s in specs)
    check_vs_exact(run(ising))


def test_integer():
    ising = Ising(tree(), J=[1.0, -2.0, 1.0], h=[0.2, -0.1, 0.0, 0.3], beta=0.4)
    specs = glauber_factor_specs(ising)
    assert all(isinstance(s, IntegerGlauberFactorSpec) for s in specs)
    check_vs_exact(run(ising))


def test_generic_real_J():
    ising = Ising(tree(), J=[0.37, -0.81, 1.13], h=[0.2, -0.1, 0.0, 0.3],
                  beta=0.6)
    check_vs_exact(run(ising))


def test_fast_vs_trace_path_agree():
    """Equivalent-implementation pair (reference strategy #2): homogeneous
    recursive path vs exhaustive-trace path on the same model."""
    ising = Ising(tree(), J=[0.5, 0.5, 0.5], h=[0.2, -0.1, 0.0, 0.3], beta=0.7)
    b_fast = np.asarray(mp.beliefs(run(ising)))
    b_slow = np.asarray(mp.beliefs(run(ising, force="generic")))
    assert np.allclose(b_fast, b_slow, atol=1e-8)


def test_pmj_vs_trace_path_agree():
    ising = Ising(tree(), J=[0.5, -0.5, -0.5], h=[0.1, 0.0, -0.2, 0.3],
                  beta=0.8)
    b_fast = np.asarray(mp.beliefs(run(ising)))
    b_slow = np.asarray(mp.beliefs(run(ising, force="generic")))
    assert np.allclose(b_fast, b_slow, atol=1e-8)


def test_observe_everything_likelihood_identity():
    """All cells observed => -F_bethe = log p(X) (reference
    ``glauber_small_tree.jl:74-86``)."""
    ising = Ising(tree(), J=[0.5, 0.5, 0.5], h=[0.2, -0.1, 0.0, 0.3], beta=0.7)
    gl = Glauber(ising, T)
    bp = mpbp_glauber(gl, D=24)
    rng = np.random.default_rng(3)
    N, T1 = bp.N, bp.T + 1
    bp, X, observed = sampling.draw_node_observations(
        bp, nobs=N * T1, rng=rng, softinf=np.inf)
    assert len(observed) == N * T1
    bp, _, _ = mp.iterate(bp, maxiter=12, trunc=TRUNC, tol=1e-13)
    lp = mp.logprob(bp, X)
    assert np.isclose(-float(mp.bethe_free_energy(bp)), lp, atol=1e-7)


def test_magnetization_values():
    """Spin means via value table (potts2spin)."""
    ising = Ising(tree(), J=[0.5, 0.5, 0.5], h=[1.0, 1.0, 1.0, 1.0], beta=1.0)
    bp = run(ising)
    import jax.numpy as jnp
    m = np.asarray(mp.means(bp, values=jnp.array([1.0, -1.0])))
    assert np.all(m[:, 1:] > 0)  # strong positive field -> positive magnetization
