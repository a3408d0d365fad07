"""SIS on the infinite 3-regular graph — the reference's golden-number
anchor (``test/sis_infinite_graph.jl:14-29``): a single BP message fixed
point stands in for the whole (infinite) graph.

Run:  python examples/sis_infinite_graph.py     (a few seconds on CPU)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import matrixproductbp_tpu as mp
from matrixproductbp_tpu.factors import build_tables
from matrixproductbp_tpu.infinite import infinite_regular_graph
from matrixproductbp_tpu.models import INFECTIOUS, SISFactorSpec

K, T, D = 3, 6, 10
LAM, RHO, GAMMA = 0.1, 0.2, 0.1

g = infinite_regular_graph(K)
tables = build_tables(g, [SISFactorSpec(LAM, RHO)])
phi = np.ones((1, T + 1, 2))
phi[0, 0] = [1 - GAMMA, GAMMA]
bp = mp.mpbp_infinite_graph(K, tables, T, D=D, phi=phi)
bp, iters, _ = mp.iterate(bp, maxiter=50, trunc=mp.TruncBond(D), tol=1e-12)

b = np.asarray(mp.beliefs(bp))[0]           # [T+1, 2] — the single node
print(f"converged in {iters} sweeps")
print("P(infected)(t):", np.round(b[:, INFECTIOUS], 10))
print("golden anchor b(T) = [0.8887717202217936, 0.1112282797782064]")
print("match:", np.allclose(b[-1], [0.8887717202217936, 0.1112282797782064],
                            rtol=1e-8))
