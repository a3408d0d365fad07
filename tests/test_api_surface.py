"""Public API surface parity with the reference export list.

The reference exports its whole user-facing surface flat from the package
root (``src/MatrixProductBP.jl:41-71``, ``src/Models/Models.jl:27-32``).  A
user switching from the reference must find every symbol (or its documented
rename) at our top level; this test pins that contract, plus the semantics of
the small accessors added for parity (reset / is_free_dynamics / expectation /
alternate_correlations).
"""
import numpy as np
import pytest

import matrixproductbp_tpu as mp
from matrixproductbp_tpu.graph import path_graph
from matrixproductbp_tpu.models import SIS, mpbp_sis


# reference export -> our name (identical unless noted; see PARITY.md)
REFERENCE_SURFACE = {
    # truncators (MatrixProductBP.jl:42)
    "SVDTrunc": "SVDTrunc", "TruncBond": "TruncBond",
    "TruncThresh": "TruncThresh", "TruncBondMax": "TruncBondMax",
    "TruncBondThresh": "TruncBondThresh", "TruncVUMPS": "TruncVUMPS",
    # TT surface (:43-47) — MPEM aliases are TensorTrain with phys (q,)/(q,q)
    "normalization": "normalization", "normalize!": "normalize",
    "orthogonalize_right!": "orthogonalize_right",
    "orthogonalize_left!": "orthogonalize_left", "compress!": "compress",
    "twovar_marginals": "twovar_marginals", "evaluate": "evaluate",
    "rand_mpem1": "rand_tt", "rand_mpem2": "rand_tt", "mpem2": "mpem3_to_mpem2",
    # BP core + scheduler (:48-54)
    "MPBP": "MPBP", "mpbp": "mpbp", "periodic_mpbp": "periodic_mpbp",
    "reset_messages!": "reset_messages", "reset_beliefs!": "reset_beliefs",
    "reset_observations!": "reset_observations", "reset!": "reset",
    "is_free_dynamics": "is_free_dynamics", "is_periodic": "is_periodic",
    "onebpiter!": "bp_sweep", "iterate!": "iterate", "CB_BP": "CB_BP",
    "getT": "getT", "nstates": "nstates",
    # observables (:50-54)
    "beliefs": "beliefs", "beliefs_tu": "beliefs_tu",
    "pair_beliefs": "pair_beliefs",
    "pair_beliefs_as_mpem": "pair_beliefs_as_mpem",
    "autocorrelations": "autocorrelations",
    "autocovariances": "autocovariances", "means": "means",
    "pair_correlations": "pair_correlations",
    "alternate_marginals": "alternate_marginals",
    "alternate_correlations": "alternate_correlations",
    "bethe_free_energy": "bethe_free_energy", "logprob": "logprob",
    "expectation": "expectation",
    # infinite graphs (:55-57)
    "mpbp_infinite_graph": "mpbp_infinite_graph",
    "InfiniteRegularGraph": "infinite_regular_graph",
    "InfiniteBipartiteRegularGraph": "infinite_bipartite_graph",
    "mpbp_infinite_bipartite_graph": "mpbp_infinite_bipartite_graph",
    # observation builders (:58-59)
    "pair_observations_directed": "pair_observations_directed",
    "pair_observations_nondirected": "pair_observations_nondirected",
    "pair_obs_undirected_to_directed": "pair_obs_undirected_to_directed",
    # exact oracle (:60-63)
    "exact_prob": "exact_prob", "exact_marginals": "exact_marginals",
    "site_marginals": "site_marginals",
    "exact_autocorrelations": "exact_autocorrelations",
    "exact_autocovariances": "exact_autocovariances",
    "exact_marginal_expectations": "exact_marginal_expectations",
    "exact_pair_marginals": "exact_pair_marginals",
    "exact_pair_marginal_expectations": "exact_pair_marginal_expectations",
    "exact_alternate_marginals": "exact_alternate_marginals",
    "exact_alternate_marginal_expectations":
        "exact_alternate_marginal_expectations",
    # sampler (:64-66); estimator names carry an _mc suffix to avoid
    # clashing with the TT `marginals`
    "SoftMarginSampler": "SoftMarginSampler", "sample": "sample",
    "onesample": "sample_one", "marginals(sms)": "marginals_mc",
    "pair_marginals": "pair_marginals_mc",
    "continuous_sis_sampler": "continuous_sis_sampler",
    "simulate_queue_sis!": "simulate_queue_sis",
    "draw_node_observations!": "draw_node_observations",
    # stationary (:68-70)
    "mpbp_stationary": "mpbp_stationary",
    "mpbp_stationary_infinite_graph": "mpbp_stationary_infinite_graph",
    "mpbp_stationary_infinite_bipartite_graph":
        "mpbp_stationary_infinite_bipartite_graph",
    # misc (:71)
    "mean_with_uncertainty": "mean_with_uncertainty",
}

# Models/Models.jl:27-32 -> matrixproductbp_tpu.models
REFERENCE_MODELS_SURFACE = {
    "Ising": "Ising", "Glauber": "Glauber", "energy": "energy",
    "HomogeneousGlauberFactor": "HomogeneousGlauberFactorSpec",
    "GenericGlauberFactor": "GenericGlauberFactorSpec",
    "PMJGlauberFactor": "PMJGlauberFactorSpec",
    "mpbp(glauber)": "mpbp_glauber", "mpbp_stationary(g)": "mpbp_glauber",
    "equilibrium_magnetization": "equilibrium_magnetization",
    "equilibrium_observables": "equilibrium_observables",
    "RandomRegular": "RandomRegular", "ErdosRenyi": "ErdosRenyi",
    "CB_Pop": "CB_Pop",
    "SIS": "SIS", "SISFactor": "SISFactorSpec",
    "SIRS": "SIRS", "SIRSFactor": "SIRSFactorSpec",
    "SIS_heterogeneous": "SISHeterogeneous",
    "SIS_heterogeneousFactor": "SISHeterogeneousFactorSpec",
    "SUSCEPTIBLE": "SUSCEPTIBLE", "INFECTIOUS": "INFECTIOUS",
    "RECOVERED": "RECOVERED",
    "kl_marginals": "kl_marginals", "l1_marginals": "l1_marginals",
    "roc": "roc", "auc": "auc",
}


def test_every_reference_export_has_a_home():
    missing = [r for r, ours in REFERENCE_SURFACE.items()
               if not hasattr(mp, ours)]
    assert not missing, f"top-level symbols missing: {missing}"
    missing_m = [r for r, ours in REFERENCE_MODELS_SURFACE.items()
                 if not hasattr(mp.models, ours)]
    assert not missing_m, f"models symbols missing: {missing_m}"


def _small_bp(T=2, periodic=False):
    g = path_graph(3)
    sis = SIS(g, lam=0.3, rho=0.2, T=T, gamma=0.4)
    bp = mpbp_sis(sis, D=4)
    if periodic:
        import dataclasses
        bp2 = mp.periodic_mpbp(bp.graph, bp.tables, T, 4, dtype=bp.phi.dtype)
        bp = dataclasses.replace(bp2, phi=bp.phi, psi=bp.psi)
    return bp


def test_reset_combined_matches_individual():
    bp = _small_bp()
    bp = mp.bp_sweep(bp, mp.TruncBond(4))
    r = mp.reset(bp, messages=True, beliefs=True, observations=True)
    assert np.allclose(r.phi, 1.0) and np.allclose(r.psi, 1.0)
    fresh = mp.reset_messages(bp)
    assert np.allclose(r.msg_cores, fresh.msg_cores)
    # reset! default leaves observations in place (mpbp.jl:97)
    r2 = mp.reset(bp)
    assert np.allclose(r2.phi, bp.phi)


def test_is_free_dynamics_and_periodic_flags():
    bp = _small_bp()
    # SIS with gamma!=0.5 reweights t=0 only -> still "free dynamics"
    assert mp.is_free_dynamics(bp)
    assert not mp.is_periodic(bp)
    import dataclasses
    phi = np.asarray(bp.phi).copy()
    phi[0, 1, 0] = 0.3  # a genuine observation at t=1
    bp_obs = dataclasses.replace(bp, phi=np.asarray(phi))
    assert not mp.is_free_dynamics(bp_obs)
    bpp = _small_bp(periodic=True)
    assert mp.is_periodic(bpp)
    assert mp.getT(bp) == 2 and mp.getN(bp) == 3 and mp.nstates(bp) == 2


def test_alternate_correlations_match_exact():
    bp = _small_bp()
    bp, _, _ = mp.iterate(bp, maxiter=10, trunc=mp.TruncThresh(0.0), tol=1e-12)
    spin = np.array([-1.0, 1.0])
    got = np.asarray(mp.alternate_correlations(bp, values=spin))
    am_x = mp.exact_alternate_marginals(bp)  # [(i,j)] -> [T, q, q]
    g = bp.graph
    for e, (i, j) in enumerate(zip(np.asarray(g.edge_src),
                                   np.asarray(g.edge_dst))):
        for t in range(bp.T):
            want = mp.expectation(spin, am_x[e][t])
            assert abs(got[e, t] - want) < 1e-7


def test_pair_beliefs_as_mpem_alias():
    bp = _small_bp()
    c1, z1 = mp.pair_beliefs_as_mpem(bp)
    c2, z2 = mp.pair_beliefs_as_tt(bp)
    assert np.allclose(c1, c2) and np.allclose(z1, z2)


def test_expectation_callable_and_values_agree():
    p = np.array([0.25, 0.75])
    assert mp.expectation(lambda x: 2 * x - 1, p) == pytest.approx(0.5)
    assert mp.expectation(np.array([-1.0, 1.0]), p) == pytest.approx(0.5)
    P = np.array([[0.2, 0.3], [0.1, 0.4]])
    assert mp.expectation(lambda x: 2 * x - 1, P) == pytest.approx(0.2)
