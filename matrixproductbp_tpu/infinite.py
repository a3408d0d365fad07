"""Infinite regular / bipartite-regular graphs: symmetry-collapsed BP.

TPU-native counterpart of ``/root/reference/src/infinite_graph.jl``: on an
infinite k-regular graph every message is identical, so a single node with k
in-slots all reading the *same* stored edge message runs the usual sweep and
converges to the symmetric fixed point.  The bipartite variant stores two
messages.  No special-cased update code is needed — these are just ``Graph``
instances whose index arrays alias one (or two) edges, which the padded
gather/scatter sweep handles natively.
"""
from __future__ import annotations

import numpy as np

from .graph import Graph
from .bp import MPBP, mpbp

__all__ = ["infinite_regular_graph", "infinite_bipartite_graph",
           "mpbp_infinite_graph", "periodic_mpbp_infinite_graph",
           "mpbp_infinite_bipartite_graph",
           "bethe_free_energy_infinite_bipartite"]


def infinite_regular_graph(k: int) -> Graph:
    """One node, one stored message, k aliased in-slots
    (``InfiniteRegularGraph``, ``infinite_graph.jl:1-17``)."""
    return Graph(
        N=1, E=1, dmax=k,
        edge_src=np.zeros(1, np.int32), edge_dst=np.zeros(1, np.int32),
        rev_edge=np.zeros(1, np.int32),
        in_edges=np.zeros((1, k), np.int32),
        in_mask=np.ones((1, k), bool),
        nbr=np.zeros((1, k), np.int32),
        degree=np.array([k], np.int32),
        infinite=True,
    )


def infinite_bipartite_graph(k1: int, k2: int) -> Graph:
    """Two blocks with degrees (k1, k2); edge i is the message into node i
    (``InfiniteBipartiteRegularGraph``, ``infinite_graph.jl:60-100``)."""
    k = max(k1, k2)
    in_edges = np.zeros((2, k), np.int32)
    in_edges[0, :] = 0
    in_edges[1, :] = 1
    in_mask = np.zeros((2, k), bool)
    in_mask[0, :k1] = True
    in_mask[1, :k2] = True
    nbr = np.zeros((2, k), np.int32)
    nbr[0, :] = 1
    nbr[1, :] = 0
    return Graph(
        N=2, E=2, dmax=k,
        edge_src=np.array([1, 0], np.int32), edge_dst=np.array([0, 1], np.int32),
        rev_edge=np.array([1, 0], np.int32),
        in_edges=in_edges, in_mask=in_mask, nbr=nbr,
        degree=np.array([k1, k2], np.int32),
        infinite=True,
    )


def mpbp_infinite_graph(k: int, tables, T: int, D: int, phi=None, psi=None,
                        dtype=None) -> MPBP:
    """Reference ``mpbp_infinite_graph`` (``infinite_graph.jl:19-32``).
    ``tables`` must be built for the 1-node graph (degree k)."""
    import jax.numpy as jnp
    dtype = jnp.float64 if dtype is None else dtype
    g = infinite_regular_graph(k)
    return mpbp(g, tables, T, D, phi=phi, psi=psi, dtype=dtype)


def periodic_mpbp_infinite_graph(k: int, tables, T: int, D: int, phi=None,
                                 psi=None, dtype=None, bond: int = 1,
                                 seed: int = 0) -> MPBP:
    """Time-periodic (trace-closed) infinite k-regular state (reference
    ``periodic_mpbp_infinite_graph``, ``infinite_graph.jl:46-60``).

    The reference initialises with *random* periodic trains of bond ``d``
    (``rand_periodic_mpem2``) — the flat periodic train can sit on a symmetric
    unstable point — so the message is randomised here too.
    """
    import jax
    import jax.numpy as jnp
    import dataclasses as _dc
    dtype = jnp.float64 if dtype is None else dtype
    g = infinite_regular_graph(k)
    bp = mpbp(g, tables, T, D, phi=phi, psi=psi, dtype=dtype, periodic=True)
    from .ops.tensortrain import rand_tt, normalize
    key = jax.random.PRNGKey(seed)
    q = tables.q
    msg, _ = normalize(rand_tt(key, T + 1, D, (q, q), bond=bond, dtype=dtype,
                               periodic=True))
    return _dc.replace(bp, msg_cores=msg.cores[None],
                       msg_logz=jnp.broadcast_to(msg.logz, (1,)))


def mpbp_infinite_bipartite_graph(k: tuple, tables, T: int, D: int, phi=None,
                                  psi=None, dtype=None) -> MPBP:
    """Reference ``mpbp_infinite_bipartite_graph`` (``infinite_graph.jl:102-121``)."""
    import jax.numpy as jnp
    dtype = jnp.float64 if dtype is None else dtype
    g = infinite_bipartite_graph(*k)
    return mpbp(g, tables, T, D, phi=phi, psi=psi, dtype=dtype)


def bethe_free_energy_infinite_bipartite(bp: MPBP) -> float:
    """Block free energies reweighted by block fractions
    (``infinite_graph.jl:113-121``)."""
    k1, k2 = int(bp.garrays.degree[0]), int(bp.garrays.degree[1])
    f = np.asarray(bp.f)
    return float((f[0] * k2 + f[1] * k1) / (k1 + k2))
