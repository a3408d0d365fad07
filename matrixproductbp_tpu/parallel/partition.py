"""Graph partitioning for multi-chip BP.

The reference has no distributed layer at all (SURVEY.md §2 item 28); this is
a new first-class component.  Partition quality controls how much of the
per-sweep message gather crosses shard boundaries (the halo volume GSPMD
turns into ICI/DCN collectives), so we grow balanced connected parts BFS-wise
instead of hashing.
"""
from __future__ import annotations

import numpy as np

from ..graph import Graph

__all__ = ["partition_nodes", "edge_cut"]


def partition_nodes(graph: Graph, nparts: int,
                    rng: np.random.Generator | None = None,
                    native: bool | None = None) -> np.ndarray:
    """Greedy balanced BFS partitioning: part[N] in [0, nparts).

    Uses the C++ partitioner (``native/graphbuild.cpp``) when available —
    the Python BFS is interpreter-bound at the 1e5-node scale target;
    ``native=False`` forces the Python path (consistency test)."""
    rng = np.random.default_rng(0) if rng is None else rng
    N = graph.N
    if native is not False:
        from .. import native as native_mod
        order = rng.permutation(N).astype(np.int32)
        part = native_mod.partition_native(graph, nparts, order)
        if part is not None:
            return part
        if native is True:
            raise RuntimeError("native partitioner unavailable")
    target = (N + nparts - 1) // nparts
    part = np.full(N, -1, dtype=np.int32)
    nbrs = [graph.nbr[i][graph.in_mask[i]] for i in range(N)]
    order = rng.permutation(N)
    p = 0
    count = 0
    for seed in order:
        if part[seed] >= 0:
            continue
        # BFS from seed into the current part
        queue = [int(seed)]
        while queue and count < target:
            v = queue.pop(0)
            if part[v] >= 0:
                continue
            part[v] = p
            count += 1
            for u in nbrs[v]:
                if part[u] < 0:
                    queue.append(int(u))
        if count >= target:
            p = min(p + 1, nparts - 1)
            count = 0
    part[part < 0] = nparts - 1
    return part


def edge_cut(graph: Graph, part: np.ndarray) -> int:
    """Number of directed edges crossing partitions (the halo volume)."""
    return int(np.sum(part[graph.edge_src] != part[graph.edge_dst]))
