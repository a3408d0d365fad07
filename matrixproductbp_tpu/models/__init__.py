"""Model families (L4): Glauber/Ising dynamics, epidemics (SIS/SIRS/
heterogeneous SIS), equilibrium oracles and inference metrics — the TPU-native
counterpart of ``/root/reference/src/Models/``."""

from .sis import SIS, SISFactorSpec, sis_tables, mpbp_sis, SUSCEPTIBLE, INFECTIOUS

__all__ = [
    "SIS", "SISFactorSpec", "sis_tables", "mpbp_sis",
    "SUSCEPTIBLE", "INFECTIOUS",
]
