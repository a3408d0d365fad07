"""Per-node heterogeneous state counts (reference ``q`` vector,
``mpbp.jl:60-70``; ``nstates(bp, i)`` ``mpbp.jl:37``).

The TPU design pads every node to ``q = max(qs)`` with zero-probability
states: tables are built in the padded alphabet (specs return 0 for own
next-states ``>= q_i``) and ``mpbp(..., qs=...)`` zeroes ``phi[i, :, x]``
for ``x >= q_i`` — every trajectory through a padded state carries zero
weight at every time step, so the padding is exact.  Gate: BP on a
mixed q=2/q=3 tree == exhaustive enumeration.
"""
import numpy as np

import matrixproductbp_tpu as mp
from matrixproductbp_tpu import exact
from matrixproductbp_tpu.factors import TraceFactorSpec, build_tables


def _mixed_q_model(T=2):
    # T = 2 keeps the exact message bond (<= (q^2)^min(t, T-t) = 9) inside
    # the D = 16 capacity so TruncThresh(0.0) BP is exact on the tree
    # path 0 - 1 - 2 with q = (2, 3, 2)
    g = mp.graph_from_edges(3, [(0, 1), (1, 2)])
    qs = (2, 3, 2)
    qmax = max(qs)

    def fn_for(qi):
        def fn(xp, x_nbrs, x):
            if xp >= qi:
                return 0.0
            target = (int(x) + int(sum(x_nbrs))) % qi
            return 0.3 / qi + 0.7 * (xp == target)
        return fn

    specs = [TraceFactorSpec(fn_for(qs[i]), qmax, int(g.degree[i]))
             for i in range(3)]
    tables = build_tables(g, specs)

    rng = np.random.default_rng(11)
    phi = np.ones((3, T + 1, qmax))
    phi[:, 0, :] = rng.uniform(0.2, 1.0, (3, qmax))   # nontrivial prior
    bp = mp.mpbp(g, tables, T, D=16, phi=phi, qs=qs)
    return bp, qs


def test_nstates_per_node():
    bp, qs = _mixed_q_model()
    assert mp.nstates(bp) == 3
    for i, qi in enumerate(qs):
        assert mp.nstates(bp, i) == qi


def test_mixed_q_matches_enumeration():
    bp, qs = _mixed_q_model()
    bp, _, _ = mp.iterate(bp, maxiter=15, trunc=mp.TruncThresh(0.0),
                          tol=1e-13)
    p_ex, Z = exact.exact_prob(bp)
    b_ex = np.asarray(exact.exact_marginals(bp, p_ex))
    b = np.asarray(mp.beliefs(bp))
    assert np.allclose(b, b_ex, atol=1e-9), np.abs(b - b_ex).max()
    # padded states carry (numerically) zero belief: the zero-prob states
    # survive the gauge/compression round-trips only as f64 dust
    for i, qi in enumerate(qs):
        assert np.all(np.abs(b[i, :, qi:]) < 1e-12)
    # partition-function identity on the tree
    assert np.isclose(-float(mp.bethe_free_energy(bp)), np.log(Z), atol=1e-9)


def test_mixed_q_pair_beliefs_match_enumeration():
    bp, qs = _mixed_q_model(T=2)
    bp, _, _ = mp.iterate(bp, maxiter=15, trunc=mp.TruncThresh(0.0),
                          tol=1e-13)
    p_ex, _ = exact.exact_prob(bp)
    pb_ex = np.asarray(exact.exact_pair_marginals(bp, p_ex))
    pb, _ = mp.pair_beliefs(bp)
    assert np.allclose(np.asarray(pb), pb_ex, atol=1e-9)
