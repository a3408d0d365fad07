"""SIS epidemic model (discrete time), recursive-BP fast path.

TPU-native counterpart of ``/root/reference/src/Models/epidemics/sis.jl`` and
``sis_bp.jl``.  States are 0-indexed: SUSCEPTIBLE=0, INFECTIOUS=1 (the
reference uses 1/2).  The auxiliary variable y is binary ("at least one
infectious neighbor transmitted"), merged with OR (``sis_bp.jl:74-78``); all
tables are node-independent, so they are built once with a broadcast node axis.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..graph import Graph
from ..factors import FactorSpec, RecursiveFactorTables
from ..bp import MPBP, mpbp

SUSCEPTIBLE = 0
INFECTIOUS = 1

__all__ = ["SIS", "SISFactorSpec", "sis_tables", "mpbp_sis",
           "periodic_mpbp_sis", "mpbp_stationary_sis",
           "SUSCEPTIBLE", "INFECTIOUS"]


class SISFactorSpec(FactorSpec):
    """Behavioural spec (generic/table-builder path, cross-validation).

    Mirrors ``SISFactor`` (``sis_bp.jl:4-41``): infection prob lam per
    infectious neighbor, recovery rho, self-infection alpha.
    """

    q = 2

    def __init__(self, lam: float, rho: float, alpha: float = 0.0):
        assert 0 <= lam <= 1 and 0 <= rho <= 1 and 0 <= alpha <= 1
        self.lam, self.rho, self.alpha = lam, rho, alpha

    def nstates(self, l: int) -> int:
        return 1 if l == 0 else 2

    def prob_y(self, xp, x, y, d):
        lam, rho, alpha = self.lam, self.rho, self.alpha
        w = (1.0 - alpha) * (y == SUSCEPTIBLE)
        if xp == INFECTIOUS:
            return (x == INFECTIOUS) * (1 - rho) + (x == SUSCEPTIBLE) * (1 - w)
        return (x == INFECTIOUS) * rho + (x == SUSCEPTIBLE) * w

    def prob_xy(self, y, xk, xi, k):
        lam = self.lam
        pin = lam * (xk == INFECTIOUS)
        return pin if y == INFECTIOUS else 1.0 - pin

    def prob_yy(self, y, y1, y2, xi, d1, d2):
        return float((y == INFECTIOUS) ==
                     ((y1 == INFECTIOUS) or (y2 == INFECTIOUS)))

    def prob_y0(self, y, xi):
        return 1.0 if y == SUSCEPTIBLE else 0.0

    def w(self, xp, x_nbrs, x):
        lam, rho, alpha = self.lam, self.rho, self.alpha
        if x == INFECTIOUS:
            return rho if xp == SUSCEPTIBLE else 1 - rho
        p = (1 - alpha) * (1 - lam) ** sum(xk == INFECTIOUS for xk in x_nbrs)
        return p if xp == SUSCEPTIBLE else 1 - p


def sis_tables(graph: Graph, lam: float, rho: float, alpha: float = 0.0,
               dtype=np.float64) -> RecursiveFactorTables:
    """Vectorized dense tables; node axis broadcast (size 1) since the SIS
    factor is homogeneous and degree-independent."""
    q, Y = 2, 2
    K = graph.dmax
    spec = SISFactorSpec(lam, rho, alpha)
    Py = np.zeros((1, q, q, Y), dtype)
    for xp in range(q):
        for x in range(q):
            for y in range(Y):
                Py[0, xp, x, y] = spec.prob_y(xp, x, y, 0)
    Pxy = np.zeros((1, 1, Y, q, q), dtype)
    for y in range(Y):
        for xk in range(q):
            for xi in range(q):
                Pxy[0, 0, y, xk, xi] = spec.prob_xy(y, xk, xi, 0)
    Pxy = np.broadcast_to(Pxy, (1, K, Y, q, q)).copy()
    Pyy = np.zeros((1, Y, Y, Y, q), dtype)
    for y in range(Y):
        for a in range(Y):
            for b in range(Y):
                Pyy[0, y, a, b, :] = spec.prob_yy(y, a, b, 0, 1, 1)
    Py0 = np.zeros((1, Y, q), dtype)
    Py0[0, SUSCEPTIBLE, :] = 1.0
    # prob_y_partial = sum_{y, y2} Py(xp, x, y) Pxy(y2, xk, x) Pyy(y, y1, y2)
    Pyp = np.zeros((1, 1, q, q, q, Y), dtype)
    for xp in range(q):
        for x in range(q):
            for xk in range(q):
                for y1 in range(Y):
                    Pyp[0, 0, xp, x, xk, y1] = sum(
                        spec.prob_y(xp, x, y, 0) * spec.prob_xy(y2, xk, x, 0)
                        * spec.prob_yy(y, y1, y2, x, 1, 1)
                        for y in range(Y) for y2 in range(Y))
    Pyp = np.broadcast_to(Pyp, (1, K, q, q, q, Y)).copy()
    Pyy_stack = np.broadcast_to(Pyy[:, None], (1, max(K, 1), Y, Y, Y, q)).copy()
    return RecursiveFactorTables(
        jnp.asarray(Py), jnp.asarray(Pyp), jnp.asarray(Pxy),
        jnp.asarray(Pyy_stack), jnp.asarray(Py0),
    )


@dataclasses.dataclass
class SIS:
    """Model container (reference ``SIS`` struct, ``sis.jl:1-33``)."""
    graph: Graph
    lam: float
    rho: float
    T: int
    gamma: float | np.ndarray = 0.5   # patient-zero probability
    alpha: float = 0.0
    phi: np.ndarray | None = None
    psi: np.ndarray | None = None

    def default_phi(self) -> np.ndarray:
        N, T1 = self.graph.N, self.T + 1
        phi = np.ones((N, T1, 2))
        g = np.broadcast_to(np.asarray(self.gamma), (N,))
        phi[:, 0, SUSCEPTIBLE] = 1 - g
        phi[:, 0, INFECTIOUS] = g
        return phi


def mpbp_sis(sis: SIS, D: int, dtype=jnp.float64,
             periodic: bool = False) -> MPBP:
    """Build the BP state for an SIS model (reference ``mpbp(::SIS)``,
    ``sis_bp.jl:42-47``; ``periodic=True`` mirrors ``periodic_mpbp(::SIS)``,
    ``sis_bp.jl:49-53``)."""
    tables = sis_tables(sis.graph, sis.lam, sis.rho, sis.alpha)
    phi = sis.phi if sis.phi is not None else sis.default_phi()
    return mpbp(sis.graph, tables, sis.T, D, phi=phi, psi=sis.psi, dtype=dtype,
                periodic=periodic)


def periodic_mpbp_sis(sis: SIS, D: int, dtype=jnp.float64) -> MPBP:
    """Reference ``periodic_mpbp(::SIS)`` (``sis_bp.jl:49-53``)."""
    return mpbp_sis(sis, D, dtype=dtype, periodic=True)


def mpbp_stationary_sis(sis: SIS, D: int = 1):
    """Reference ``mpbp_stationary(::SIS)`` (``sis_bp.jl:55-58``): stationary
    (T -> inf uniform) state with the model's t=0 reweighting."""
    from ..stationary import mpbp_stationary
    tables = sis_tables(sis.graph, sis.lam, sis.rho, sis.alpha)
    phi = (sis.phi if sis.phi is not None else sis.default_phi())
    phi0 = np.asarray(phi)[:, 0, :]
    psi0 = None if sis.psi is None else np.asarray(sis.psi)[:, 0]
    return mpbp_stationary(sis.graph, tables, D=D, phi=phi0, psi=psi0)
