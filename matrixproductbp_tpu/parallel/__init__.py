from .partition import partition_nodes, edge_cut
from .shard import pad_graph, shard_mpbp, sharded_beliefs, \
    sharded_bethe_free_energy

__all__ = ["partition_nodes", "edge_cut", "pad_graph", "shard_mpbp",
           "sharded_beliefs", "sharded_bethe_free_energy"]
