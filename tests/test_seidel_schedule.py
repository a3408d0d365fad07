"""Gauss–Seidel + shuffled scheduling as a first-class ``iterate`` option
(reference asynchronous semantics: live message updates + per-sweep node
reshuffle, ``mpbp.jl:190-195``).

On loopy frustrated graphs the synchronous (Jacobi) schedule can enter slow
period-2-ish oscillations; Seidel information flow within a sweep breaks
them.  Measured on the K4 antiferromagnet below (f64, D=8): Jacobi is still
at delta ~1e-4 after 25 sweeps while Seidel reaches 1e-7 by sweep ~22.
"""
import numpy as np

import matrixproductbp_tpu as mp
from matrixproductbp_tpu.models import Ising, Glauber, mpbp_glauber


def _frustrated_k4(T=4):
    rng = np.random.default_rng(3)
    n = 4
    g = mp.graph_from_edges(
        n, [(i, j) for i in range(n) for j in range(i + 1, n)])
    ising = Ising(g, J=-1.0 * np.ones(g.E // 2), h=rng.normal(0, 0.2, n),
                  beta=3.0)
    return Glauber(ising, T=T)


def test_seidel_converges_where_jacobi_stalls():
    gl = _frustrated_k4()
    tol = 1e-6

    bp = mpbp_glauber(gl, D=8)
    bp_j, nj, dj = mp.iterate(bp, maxiter=25, trunc=mp.TruncBond(8), tol=tol)
    assert nj == 25 and dj[-1] > tol            # Jacobi: not converged

    bp = mpbp_glauber(gl, D=8)
    bp_s, ns, ds = mp.iterate(bp, maxiter=25, trunc=mp.TruncBond(8), tol=tol,
                              schedule="seidel", shuffle=True, chunk=2)
    assert ns < 25 and ds[-1] < tol             # Seidel: converged
    # same fixed point (Jacobi is near it, just oscillating around it)
    assert np.allclose(np.asarray(mp.beliefs(bp_j)),
                       np.asarray(mp.beliefs(bp_s)), atol=5e-3)


def test_seidel_shuffle_matches_jacobi_on_tree():
    """On a tree both schedules converge to the same (exact) fixed point."""
    g = mp.graph_from_edges(4, [(0, 1), (0, 2), (2, 3)])
    rng = np.random.default_rng(1)
    ising = Ising(g, J=0.5 * np.ones(g.E // 2), h=rng.normal(0, 0.3, g.N),
                  beta=1.0)
    gl = Glauber(ising, T=3)

    bp_j, _, _ = mp.iterate(mpbp_glauber(gl, D=16), maxiter=12,
                            trunc=mp.TruncThresh(0.0), tol=1e-13)
    bp_s, _, _ = mp.iterate(mpbp_glauber(gl, D=16), maxiter=12,
                            trunc=mp.TruncThresh(0.0), tol=1e-13,
                            schedule="seidel", shuffle=True, chunk=1)
    assert np.allclose(np.asarray(mp.beliefs(bp_j)),
                       np.asarray(mp.beliefs(bp_s)), atol=1e-9)
