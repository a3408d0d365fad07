"""Factor adapter layer: trace adapter vs direct evaluation, damped factors,
and the table-fold transition probabilities (mirrors the reference's
``test_factors.jl`` cross-validation roles)."""
import jax.numpy as jnp
import numpy as np

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import exact
from matrixproductbp_tpu.factors import (TraceFactorSpec, DampedFactorSpec,
                                         build_tables, transition_probs)
from matrixproductbp_tpu.models import SISFactorSpec, mpbp_sis, SIS


def tree():
    return mp.graph_from_edges(4, [(0, 1), (0, 2), (2, 3)])


def test_trace_adapter_matches_native_fast_path():
    """RecursiveTraceFactor analogue: wrapping SIS into the exhaustive-trace
    encoding must reproduce the native recursive tables
    (``test/sis_small_tree.jl:85-98``)."""
    g = tree()
    lam, rho = 0.3, 0.2
    sis = SIS(g, lam, rho, T=2, gamma=0.4)
    bp1 = mpbp_sis(sis, D=16)
    bp1, _, _ = mp.iterate(bp1, maxiter=15, trunc=mp.TruncThresh(0.0),
                           tol=1e-13)

    spec = SISFactorSpec(lam, rho)
    specs = [TraceFactorSpec(spec.w, 2, int(g.degree[i])) for i in range(g.N)]
    bp2 = mp.mpbp(g, build_tables(g, specs), 2, D=16, phi=bp1.phi)
    bp2, _, _ = mp.iterate(bp2, maxiter=15, trunc=mp.TruncThresh(0.0),
                           tol=1e-13)
    assert np.allclose(np.asarray(mp.beliefs(bp1)),
                       np.asarray(mp.beliefs(bp2)), atol=1e-9)
    assert np.isclose(float(mp.bethe_free_energy(bp1)),
                      float(mp.bethe_free_energy(bp2)), atol=1e-9)


def test_damped_factor_vs_exact():
    """DampedFactor: lazy dynamics vs enumeration
    (``recursive_bp_factor.jl:183-206``)."""
    g = tree()
    inner = SISFactorSpec(0.35, 0.25, alpha=0.02)
    spec = DampedFactorSpec(inner, p=0.3)
    tables = build_tables(g, [spec] * g.N)
    phi = np.ones((g.N, 3, 2))
    phi[:, 0] = [0.6, 0.4]
    bp = mp.mpbp(g, tables, 2, D=16, phi=phi)
    bp, _, _ = mp.iterate(bp, maxiter=15, trunc=mp.TruncThresh(0.0), tol=1e-13)
    p_ex, Z = exact.exact_prob(bp)
    assert np.allclose(np.asarray(mp.beliefs(bp)),
                       exact.exact_marginals(bp, p_ex), atol=1e-8)
    assert np.isclose(-float(mp.bethe_free_energy(bp)), np.log(Z), atol=1e-8)


def test_transition_probs_match_spec_w():
    """The table fold (reference default functor) equals the direct factor
    evaluation for every neighbor configuration."""
    g = tree()
    spec = SISFactorSpec(0.3, 0.2, alpha=0.1)
    tables = build_tables(g, [spec] * g.N)
    mask = jnp.asarray(g.in_mask)
    rng = np.random.default_rng(0)
    for _ in range(20):
        x = rng.integers(0, 2, g.N)
        xn_full = rng.integers(0, 2, (g.N, g.dmax))
        p = np.asarray(transition_probs(tables, mask, jnp.asarray(xn_full),
                                        jnp.asarray(x)))
        for i in range(g.N):
            d = int(g.degree[i])
            cfg = list(xn_full[i, :d])
            for xp in range(2):
                assert np.isclose(p[i, xp], spec.w(xp, cfg, int(x[i])),
                                  atol=1e-12)


def test_logprob_matches_sampled_weight_bookkeeping():
    """logprob of trajectories is finite and consistent with exact_prob."""
    g = tree()
    sis = SIS(g, 0.3, 0.2, T=2, gamma=0.4)
    bp = mpbp_sis(sis, D=8)
    p_ex, Z = exact.exact_prob(bp)
    # the most likely trajectory's probability from logprob vs enumeration
    idx = int(np.argmax(p_ex))
    from matrixproductbp_tpu.exact import _decode_all
    X = _decode_all(len(p_ex), 2, g.N, 3)[idx]     # [N, T1]
    lp = mp.logprob(bp, X)
    assert np.isclose(np.exp(lp) / Z, p_ex[idx], rtol=1e-8)


class _RestrictedTraceFactorSpec(TraceFactorSpec):
    """``RestrictedRecursiveBPFactor`` analogue (``src/test_factors.jl:21-38``):
    hides the specialized ``prob_y_partial`` so ``build_tables`` must take the
    generic fallback sum (``factors.py:292-298``)."""

    @property
    def prob_y_partial(self):
        raise AttributeError("restricted to generic fallback methods")


def test_restricted_fallback_matches_specialized_tables():
    """Generic trait-fallback path == specialized path: the Pyp tables built
    through the explicit prob_y*prob_xy*prob_yy sum must equal those built
    through prob_y_partial, and the converged beliefs must match enumeration
    (reference ``test/sis_small_tree.jl:53-66``)."""
    g = tree()
    lam, rho = 0.3, 0.2
    spec = SISFactorSpec(lam, rho)
    fast = [TraceFactorSpec(spec.w, 2, int(g.degree[i])) for i in range(g.N)]
    slow = [_RestrictedTraceFactorSpec(spec.w, 2, int(g.degree[i]))
            for i in range(g.N)]
    assert all(not hasattr(s, "prob_y_partial") for s in slow)
    tf = build_tables(g, fast)
    ts = build_tables(g, slow)
    for a, b in zip(tf.tree_flatten()[0], ts.tree_flatten()[0]):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    sis = SIS(g, lam, rho, T=2, gamma=0.4)
    bp = mp.mpbp(g, ts, 2, D=16, phi=sis.default_phi())
    bp, _, _ = mp.iterate(bp, maxiter=15, trunc=mp.TruncThresh(0.0), tol=1e-13)
    p_ex, Z = exact.exact_prob(bp)
    assert np.allclose(np.asarray(mp.beliefs(bp)),
                       exact.exact_marginals(bp, p_ex), atol=1e-9)
    assert np.isclose(-float(mp.bethe_free_energy(bp)), np.log(Z), atol=1e-9)


def test_restricted_homogeneous_glauber_matches_specialized():
    """Homogeneous Glauber with ``prob_y_partial`` AND the sum-type tag
    deliberately stripped (``RestrictedFactorSpec``): the explicit-sum Pyp
    fallback + dense-Pyy merge path must give identical messages/beliefs to
    the specialized closed-form + banded path — the
    ``RestrictedRecursiveBPFactor`` gate (``test_factors.jl:21-38``)."""
    from matrixproductbp_tpu.factors import RestrictedFactorSpec
    from matrixproductbp_tpu.models import (Ising, Glauber, mpbp_glauber,
                                            HomogeneousGlauberFactorSpec)

    g = tree()
    rng = np.random.default_rng(5)
    ising = Ising(g, J=0.4 * np.ones(g.E // 2), h=rng.normal(0, 0.3, g.N),
                  beta=1.0)
    gl = Glauber(ising, T=3)
    bp_fast = mpbp_glauber(gl, D=16)
    assert bp_fast.tables.yy_off is not None  # banded fast path in play

    specs = [RestrictedFactorSpec(
        HomogeneousGlauberFactorSpec(0.4, float(ising.h[i]), 1.0))
        for i in range(g.N)]
    assert all(not hasattr(s, "prob_y_partial") for s in specs)
    t_slow = build_tables(g, specs)
    assert t_slow.yy_off is None              # dense-Pyy fallback in play
    bp_slow = mp.mpbp(g, t_slow, 3, D=16, phi=bp_fast.phi)

    for _ in range(6):
        bp_fast = mp.bp_sweep(bp_fast, mp.TruncThresh(0.0))
        bp_slow = mp.bp_sweep(bp_slow, mp.TruncThresh(0.0))
    b_f = np.asarray(mp.beliefs(bp_fast))
    b_s = np.asarray(mp.beliefs(bp_slow))
    assert np.allclose(b_f, b_s, atol=1e-10), np.abs(b_f - b_s).max()
    assert np.isclose(float(mp.bethe_free_energy(bp_fast)),
                      float(mp.bethe_free_energy(bp_slow)), atol=1e-9)

    # and both match enumeration (tree: BP exact)
    p_ex, _ = exact.exact_prob(bp_slow)
    assert np.allclose(b_s, exact.exact_marginals(bp_slow, p_ex), atol=1e-9)
