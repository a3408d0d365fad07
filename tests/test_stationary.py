"""Stationary (T -> infinity) mode: uniform-train spectral ops and the BP
fixed point vs long-horizon finite-T BP (mirrors the stationary blocks of
``test/glauber_small_tree.jl:320-350`` / ``test/sis_small_tree.jl:148-162``)."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import stationary as st
from matrixproductbp_tpu.factors import build_tables
from matrixproductbp_tpu.infinite import infinite_regular_graph, mpbp_infinite_graph
from matrixproductbp_tpu.models import SISFactorSpec


def test_uniform_spectral_ops():
    key = jax.random.PRNGKey(0)
    u = st.rand_uniform(key, 4, (2,))
    E = np.asarray(u.core.sum(axis=2))
    evals, evecs = np.linalg.eig(E)
    lam_ref = evals[np.argmax(np.abs(evals))].real
    lg, sg = st.uniform_lognorm(u)
    assert np.isclose(float(sg) * np.exp(float(lg)), lam_ref, rtol=1e-8)
    un, lgn = st.uniform_normalize(u)
    lg2, _ = st.uniform_lognorm(un)
    assert abs(float(lg2)) < 1e-8
    # marginals via dense power limit
    m = np.asarray(st.uniform_marginals(u))
    En = E / lam_ref
    M = np.linalg.matrix_power(En, 200)
    p = np.array([np.trace(M @ np.asarray(u.core[:, :, x]) @ M)
                  for x in range(2)])
    p /= p.sum()
    assert np.allclose(m, p, atol=1e-8)


def test_uniform_dot_self_is_one():
    u = st.rand_uniform(jax.random.PRNGKey(1), 3, (2, 2))
    assert np.isclose(float(st.uniform_dot(u, u)), 1.0, atol=1e-8)


def test_truncate_vumps_lossless_when_rank_small():
    """A bond-2 train embedded in bond 6, truncated back to 2: the function
    (marginals, two-time correlations) must be preserved."""
    key = jax.random.PRNGKey(2)
    small = st.rand_uniform(key, 2, (2,))
    core = jnp.zeros((6, 6, 2)).at[:2, :2, :].set(small.core)
    u = st.UniformMessage(core, jnp.zeros(()), (2,))
    t = st.truncate_vumps(u, 2)
    assert t.D == 2
    assert np.allclose(np.asarray(st.uniform_marginals(u)),
                       np.asarray(st.uniform_marginals(t)), atol=1e-7)
    assert np.allclose(np.asarray(st.uniform_twovar_marginals(u, 3)),
                       np.asarray(st.uniform_twovar_marginals(t, 3)),
                       atol=1e-6)


def test_variational_truncation_improves_on_crop():
    """The ALS variational fit (reference ``TruncVUMPS`` semantics,
    ``stationary.jl:258``) must not be worse than the canonical-gauge crop it
    starts from, and should strictly improve a generic random message."""
    import jax
    key = jax.random.PRNGKey(3)
    u = st.rand_uniform(key, 12, (2, 2))
    d = 4
    crop = st.truncate_vumps(u, d)
    var = st.truncate_vumps_variational(u, d, refine=8)
    ov_crop = abs(1.0 - float(st.uniform_dot(crop, u)))
    ov_var = abs(1.0 - float(st.uniform_dot(var, u)))
    assert ov_var <= ov_crop + 1e-12, (ov_var, ov_crop)
    # exactness is preserved when no truncation happens
    small = st.rand_uniform(key, 3, (2,))
    same = st.truncate_vumps_variational(small, 4)
    assert np.allclose(np.asarray(same.core), np.asarray(small.core))


def test_stationary_sis_matches_long_horizon_bp():
    """SIS on the infinite 3-regular graph: the stationary fixed point equals
    late-time beliefs of long-horizon finite-T BP.  A small self-infection
    rate removes the absorbing all-susceptible state so the T -> infinity
    limit is unique (without it, stationary BP correctly drifts to
    extinction while mid-horizon finite-T beliefs sit at the metastable
    endemic plateau)."""
    k, lam, rho = 3, 0.1, 0.2
    g = infinite_regular_graph(k)
    spec = SISFactorSpec(lam, rho, alpha=0.05)
    tables = build_tables(g, [spec])

    # finite-T reference; mid-horizon beliefs feel both time boundaries at
    # ~exp(-T/2 * rho), so T = 96 puts that (~7e-5) below the comparison
    # tolerance — the decay analysis that justifies the 3e-4 gate
    T = 96
    phi = np.ones((1, T + 1, 2))
    phi[0, 0] = [0.9, 0.1]
    bp = mpbp_infinite_graph(k, tables, T, D=8, phi=phi)
    bp, _, _ = mp.iterate(bp, maxiter=60, trunc=mp.TruncBond(8), tol=1e-10)
    b_late = np.asarray(mp.beliefs(bp))[0, T // 2]

    sbp = st.mpbp_stationary_infinite_graph(k, tables)
    sbp, iters, deltas, overlaps = st.iterate_stationary(
        sbp, maxiter=120, trunc=st.TruncVUMPS(8, refine=4), tol=1e-10)
    b_stat = st.beliefs_stationary(sbp)[0]
    assert np.allclose(b_stat, b_late, atol=3e-4), (b_stat, b_late)
    assert overlaps[-1] < 1e-5


def test_stationary_sis_golden_fixed_point():
    """Golden-number regression of the stationary SIS fixed point, the
    stationary analogue of the reference's 16-digit finite-T anchor
    (``test/sis_infinite_graph.jl:14-29``).  Anchors (this implementation,
    f64, converged to delta < 1e-13):

        D=12: b_S = 0.5600047320179407
        D=16: b_S = 0.5600046958743625   (truncation-converged to ~4e-8)

    Cross-checks: (a) finite-T mid-horizon belief at T=96 agrees to 1.7e-5
    (boundary decay ~exp(-T/2*rho) = 7e-5); (b) free dynamics => Z = 1 =>
    stationary Bethe free energy is exactly 0."""
    k, lam, rho = 3, 0.1, 0.2
    g = infinite_regular_graph(k)
    tables = build_tables(g, [SISFactorSpec(lam, rho, alpha=0.05)])
    sbp = st.mpbp_stationary_infinite_graph(k, tables)
    sbp, iters, deltas, _ = st.iterate_stationary(
        sbp, maxiter=200, trunc=st.TruncVUMPS(12), tol=1e-14)
    b = st.beliefs_stationary(sbp)[0].reshape(-1)
    assert abs(float(b[0]) - 0.5600047320179407) < 1e-9, b
    # free-dynamics identity: Z = 1 => F = 0 (to truncation error)
    assert abs(st.bethe_free_energy_stationary(sbp)) < 1e-7
