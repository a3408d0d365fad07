"""Golden-number parity gate: SIS on the infinite 3-regular graph.

The reference pins the converged belief trajectory to 16 digits
(``test/sis_infinite_graph.jl:14-29``); BASELINE.md names this as a required
accuracy anchor.  T=6, k=3, gamma=0.1, lam=0.1, rho=0.2, TruncBond(10).
"""
import numpy as np

import matrixproductbp_tpu as mp
from matrixproductbp_tpu.infinite import infinite_regular_graph, mpbp_infinite_graph
from matrixproductbp_tpu.factors import build_tables
from matrixproductbp_tpu.models import SISFactorSpec

GOLDEN = np.array([
    [0.9000000001671186, 0.0999999998328814],
    [0.8932690998131098, 0.10673090018689023],
    [0.8899420329322244, 0.11005796706777556],
    [0.8884643888492034, 0.11153561115079656],
    [0.8880305235706524, 0.1119694764293476],
    [0.8882121515614524, 0.11178784843854758],
    [0.8887717202217936, 0.1112282797782064],
])


def test_sis_infinite_3regular_golden():
    T, k = 6, 3
    gamma, lam, rho = 0.1, 0.1, 0.2
    g = infinite_regular_graph(k)
    tables = build_tables(g, [SISFactorSpec(lam, rho)])
    phi = np.ones((1, T + 1, 2))
    phi[0, 0] = [1 - gamma, gamma]
    bp = mpbp_infinite_graph(k, tables, T, D=10, phi=phi)
    bp, iters, deltas = mp.iterate(bp, maxiter=200, trunc=mp.TruncBond(10),
                                   tol=1e-14)
    b = np.asarray(mp.beliefs(bp))[0]          # [T1, 2]
    assert np.allclose(b, GOLDEN, rtol=2e-8), (b - GOLDEN)
