"""Sharding the BP state over a device mesh.

Messages (and psi) shard along the edge axis; node state (phi, beliefs, f)
along the node axis; factor tables and graph index arrays replicate.  The
per-sweep gather ``msg_cores[in_edges]`` then *is* the halo exchange — GSPMD
lowers it to all-to-all/collective-permute over ICI, and the Bethe free-energy
reduction becomes a ``psum`` (SURVEY.md §5 "distributed communication
backend"; BASELINE.json north star).

Shard counts must divide the axis sizes, so ``pad_graph`` appends isolated
dummy nodes and unreferenced dummy edge rows; padded entries are exact no-ops
in the sweep (masked slots / never-gathered rows), and the accessors here mask
them out of observables.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import Graph
from ..bp import MPBP, beliefs as _beliefs

__all__ = ["pad_graph", "shard_mpbp", "sharded_beliefs",
           "sharded_bethe_free_energy"]


def pad_graph(graph: Graph, multiple: int) -> Graph:
    """Pad N and E up to multiples of ``multiple`` with inert entries."""
    def up(x):
        return ((x + multiple - 1) // multiple) * multiple

    Np, Ep = up(graph.N), up(graph.E)
    if Np == graph.N and Ep == graph.E:
        return graph
    K = graph.dmax
    in_edges = np.vstack([graph.in_edges,
                          np.full((Np - graph.N, K), Ep, np.int32)])
    # existing padded slots pointed at old E; keep pointing at a pad row
    in_edges[in_edges == graph.E] = Ep
    in_mask = np.vstack([graph.in_mask, np.zeros((Np - graph.N, K), bool)])
    nbr = np.vstack([graph.nbr, np.full((Np - graph.N, K), Np, np.int32)])
    nbr[nbr == graph.N] = Np
    degree = np.concatenate([graph.degree,
                             np.zeros(Np - graph.N, np.int32)])
    edge_src = np.concatenate([graph.edge_src,
                               np.zeros(Ep - graph.E, np.int32)])
    edge_dst = np.concatenate([graph.edge_dst,
                               np.zeros(Ep - graph.E, np.int32)])
    rev_edge = np.concatenate([graph.rev_edge,
                               np.arange(graph.E, Ep, dtype=np.int32)])
    return Graph(Np, Ep, K, edge_src, edge_dst, rev_edge, in_edges, in_mask,
                 nbr, degree)


def shard_mpbp(bp: MPBP, mesh: Mesh, axis: str = "shard") -> MPBP:
    """Place the state on the mesh: edges/nodes sharded, tables replicated.

    The graph must already be padded so the node/edge axes divide the mesh
    (see ``pad_graph``; build the state on the padded graph)."""
    edge_s = NamedSharding(mesh, P(axis))
    node_s = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return dataclasses.replace(
        bp,
        tables=jax.device_put(bp.tables, repl),
        phi=jax.device_put(bp.phi, node_s),
        psi=jax.device_put(bp.psi, edge_s),
        msg_cores=jax.device_put(bp.msg_cores, edge_s),
        msg_logz=jax.device_put(bp.msg_logz, edge_s),
        bel_cores=jax.device_put(bp.bel_cores, node_s),
        bel_logz=jax.device_put(bp.bel_logz, node_s),
        f=jax.device_put(bp.f, node_s),
        garrays=jax.device_put(bp.garrays, repl),
    )


def sharded_beliefs(bp: MPBP, n_real_nodes: int) -> jax.Array:
    """Beliefs with dummy padding removed."""
    return _beliefs(bp)[:n_real_nodes]


def sharded_bethe_free_energy(bp: MPBP, n_real_nodes: int) -> jax.Array:
    """Bethe free energy over real nodes only (padded nodes carry inert but
    nonzero normalization bookkeeping)."""
    return jnp.sum(bp.f[:n_real_nodes])
