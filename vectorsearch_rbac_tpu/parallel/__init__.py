from .mesh import make_mesh
from .sharded import sharded_masked_topk, shard_arena_arrays
from .searcher import ShardedGlobalSearcher
from .tiled_sharded import ShardedTiledSearcher, place_partitions
from .graph_sharded import ShardedGraphSearcher

__all__ = [
    "make_mesh",
    "sharded_masked_topk",
    "shard_arena_arrays",
    "ShardedGlobalSearcher",
    "ShardedTiledSearcher",
    "ShardedGraphSearcher",
    "place_partitions",
]
