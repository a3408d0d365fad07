from .partition import partition_nodes, edge_cut
from .shard import pad_graph, shard_mpbp, sharded_beliefs, \
    sharded_bethe_free_energy
from .halo import (HaloPlan, HaloState, halo_plan, halo_mpbp, halo_sweep,
                   halo_beliefs, halo_bethe_free_energy, halo_to_mpbp)

__all__ = ["partition_nodes", "edge_cut", "pad_graph", "shard_mpbp",
           "sharded_beliefs", "sharded_bethe_free_energy",
           "HaloPlan", "HaloState", "halo_plan", "halo_mpbp", "halo_sweep",
           "halo_beliefs", "halo_bethe_free_energy", "halo_to_mpbp"]
