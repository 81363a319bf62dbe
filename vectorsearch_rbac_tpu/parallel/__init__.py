from .mesh import make_mesh
from .sharded import sharded_masked_topk, shard_arena_arrays

__all__ = ["make_mesh", "sharded_masked_topk", "shard_arena_arrays"]
