"""SIS epidemic inference on Zachary's karate club — the reference's
representative workload (``notebooks/sis_karate_club_network.ipynb``:
N=34, T=50, bond dim 10, cross-checked against SoftMargin Monte Carlo).

Run (CPU):  python examples/sis_karate_club.py
Scaled-down defaults keep it under ~2 min on a laptop CPU; raise T / D /
NSAMPLES toward the notebook's values (50 / 10 / 2e5) on real hardware.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import matrixproductbp_tpu as mp
from matrixproductbp_tpu.graph import graph_from_edges
from matrixproductbp_tpu.models import SIS, mpbp_sis

# Zachary karate club (public dataset; 34 nodes, 78 undirected edges)
KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2),
    (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3),
    (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32), (3, 7),
    (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16), (6, 16),
    (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]

T, D, NSAMPLES = 8, 6, 2000
LAM, RHO, GAMMA = 0.2, 0.1, 1 / 34  # one expected patient zero

g = graph_from_edges(34, KARATE_EDGES)
sis = SIS(g, lam=LAM, rho=RHO, T=T, gamma=GAMMA)
bp = mpbp_sis(sis, D=D)

# observe a handful of (node, time) infection states drawn from the prior
bp, X_true, observed = mp.draw_node_observations(
    bp, nobs=10, rng=np.random.default_rng(0), softinf=1e3)

bp, iters, deltas = mp.iterate(bp, maxiter=30, trunc=mp.TruncBond(D),
                               tol=1e-5, damp=0.2)
print(f"BP ran {iters} sweeps (last delta {deltas[-1]:.2e})")
bel = np.asarray(mp.beliefs(bp))               # [N, T+1, 2]

sms = mp.sample(bp, NSAMPLES, key=jax.random.PRNGKey(1))
mc, mc_err = mp.marginals_mc(sms)              # [N, T+1, 2] each

l1 = np.abs(bel - mc).mean()
print(f"mean |BP - MC| over all marginals: {l1:.4f} "
      f"(MC stderr ~{np.mean(mc_err):.4f}, {NSAMPLES} samples; the notebook "
      f"uses 2e5 — importance weights concentrate under hard observations)")
print("P(infected at T), first 10 nodes:")
print(np.round(bel[:10, -1, mp.models.INFECTIOUS], 3))
