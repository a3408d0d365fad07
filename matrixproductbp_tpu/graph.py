"""Bidirected graph with edge ids, CSR/CSC-style, as flat index arrays.

TPU-native replacement for IndexedGraphs.jl (``IndexedBiDiGraph``), whose
edge-id indirection the reference uses to address messages
(``/root/reference/src/mpbp.jl:40-58``, ``:218-235``).  Here the graph is
preprocessed on the host into dense padded index arrays so that the whole BP
sweep is gather/scatter over static shapes:

* Directed edge ids are ordered by ``(dst, src)`` — the same layout as the
  reference's CSC ``g.X`` walk, so per-edge inputs (``psi``) are ordered
  identically.
* ``in_edges[i]`` is the (padded) list of edge ids ``k->i``; slot order is
  ascending neighbor index, matching how reference models index per-neighbor
  parameters (``Models/glauber/glauber_bp.jl:121-141``,
  ``Models/epidemics/sis_heterogeneous.jl:46``).
* The out-edge ``i->k`` paired with in-slot ``(i, k)`` is ``rev_edge`` of the
  in-edge; padded slots point at the dummy edge id ``E`` so scatters drop.
"""
from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["Graph", "graph_from_edges", "random_regular_graph", "erdos_renyi_graph",
           "random_tree", "star_graph", "path_graph"]


@dataclasses.dataclass(frozen=True, eq=False)  # identity hash: used as jit-static aux
class Graph:
    """Static bidirected graph. All arrays are host numpy; E = #directed edges."""

    N: int
    E: int
    dmax: int
    edge_src: np.ndarray      # i[E]
    edge_dst: np.ndarray      # i[E]
    rev_edge: np.ndarray      # i[E]   id of (dst -> src)
    in_edges: np.ndarray      # i[N, dmax]  padded with E
    in_mask: np.ndarray       # bool[N, dmax]
    nbr: np.ndarray           # i[N, dmax]  neighbor indices, padded with N
    degree: np.ndarray        # i[N]
    #: symmetry-collapsed infinite graph (``infinite.py``): each stored edge
    #: stands for ``degree`` identical incidences; pair-belief logz weights
    #: specialize to ``1/(k-1) - 1/2`` (``infinite_graph.jl:38-44,107-115``)
    infinite: bool = False

    @property
    def out_edges(self) -> np.ndarray:
        """i[N, dmax]: out-edge id for each in-slot (same neighbor), padded E."""
        out = np.full_like(self.in_edges, self.E)
        valid = self.in_mask
        out[valid] = self.rev_edge[self.in_edges[valid]]
        return out

    def undirected_edges(self):
        """[(i, j, dir_id_ij)] with i < j, ordered by directed edge id of i->j."""
        out = []
        for e in range(self.E):
            i, j = int(self.edge_src[e]), int(self.edge_dst[e])
            if i < j:
                out.append((i, j, e))
        return out


def graph_from_edges(N: int, undirected_edges, dmax: int | None = None,
                     native: bool | None = None) -> Graph:
    """Build from a list of undirected pairs (i, j).

    Uses the C++ builder (``native/graphbuild.cpp``) when available — the
    pure-Python path is O(E) interpreter work and dominates setup at the
    1e5-node scale target.  ``native=False`` forces the Python path (used by
    the consistency test)."""
    arr = np.asarray(list(undirected_edges) if not isinstance(
        undirected_edges, np.ndarray) else undirected_edges, dtype=np.int64)
    if arr.size == 0:
        arr = arr.reshape(0, 2)
    if np.any(arr[:, 0] == arr[:, 1]):
        raise ValueError("self loops not supported")
    lo = np.minimum(arr[:, 0], arr[:, 1])
    hi = np.maximum(arr[:, 0], arr[:, 1])
    uniq = np.unique(lo * np.int64(N) + hi)
    pairs_arr = np.stack([uniq // N, uniq % N], axis=1).astype(np.int32)

    if native is not False:
        from . import native as native_mod
        out = native_mod.build_graph_native(N, pairs_arr, dmax)
        if out is not None:
            E, K, edge_src, edge_dst, rev_edge, in_edges, in_mask, nbr, deg = out
            return Graph(N, E, K, edge_src, edge_dst, rev_edge, in_edges,
                         in_mask, nbr, deg)
        if native is True:
            raise RuntimeError("native graph builder unavailable")

    pairs = {(int(a), int(b)) for a, b in pairs_arr}
    directed = []
    for i, j in pairs:
        directed.append((i, j))
        directed.append((j, i))
    # order by (dst, src): reference CSC layout
    directed.sort(key=lambda e: (e[1], e[0]))
    E = len(directed)
    edge_src = np.array([e[0] for e in directed], dtype=np.int32)
    edge_dst = np.array([e[1] for e in directed], dtype=np.int32)
    eid = {e: k for k, e in enumerate(directed)}
    rev_edge = np.array([eid[(int(edge_dst[k]), int(edge_src[k]))] for k in range(E)],
                        dtype=np.int32)
    degree = np.zeros(N, dtype=np.int32)
    for _, j in directed:
        degree[j] += 1
    K = int(degree.max()) if N and E else 0
    if dmax is not None:
        assert dmax >= K
        K = dmax
    K = max(K, 1)
    in_edges = np.full((N, K), E, dtype=np.int32)
    in_mask = np.zeros((N, K), dtype=bool)
    nbr = np.full((N, K), N, dtype=np.int32)
    slot = np.zeros(N, dtype=np.int32)
    for k in range(E):  # (dst, src) sorted => slots are ascending-neighbor order
        j = int(edge_dst[k])
        s = slot[j]
        in_edges[j, s] = k
        in_mask[j, s] = True
        nbr[j, s] = int(edge_src[k])
        slot[j] += 1
    return Graph(N, E, K, edge_src, edge_dst, rev_edge, in_edges, in_mask, nbr, degree)


# -- simple generators -------------------------------------------------------

def path_graph(N: int) -> Graph:
    return graph_from_edges(N, [(i, i + 1) for i in range(N - 1)])


def star_graph(N: int) -> Graph:
    """Node 0 is the hub."""
    return graph_from_edges(N, [(0, i) for i in range(1, N)])


def random_tree(N: int, rng: np.random.Generator) -> Graph:
    edges = [(int(rng.integers(0, i)), i) for i in range(1, N)]
    return graph_from_edges(N, edges)


def random_regular_graph(N: int, k: int, rng: np.random.Generator,
                         max_tries: int = 200) -> Graph:
    """Configuration-model random k-regular simple graph."""
    assert (N * k) % 2 == 0
    for _ in range(max_tries):
        stubs = np.repeat(np.arange(N), k)
        rng.shuffle(stubs)
        pairs = stubs.reshape(-1, 2)
        edges = set()
        ok = True
        for a, b in pairs:
            a, b = int(a), int(b)
            if a == b or (min(a, b), max(a, b)) in edges:
                ok = False
                break
            edges.add((min(a, b), max(a, b)))
        if ok:
            return graph_from_edges(N, list(edges))
    raise RuntimeError("failed to sample a simple regular graph")


def erdos_renyi_graph(N: int, c: float, rng: np.random.Generator) -> Graph:
    """G(N, p) with mean degree c (p = c / (N-1)); keeps the giant component
    as-is (isolated nodes allowed, degree-0 nodes get padded slots only)."""
    p = c / (N - 1)
    edges = []
    for i in range(N):
        js = np.nonzero(rng.random(N - i - 1) < p)[0] + i + 1
        edges.extend((i, int(j)) for j in js)
    return graph_from_edges(N, edges)
