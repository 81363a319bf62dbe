from .base import BuiltPartition, PartitionedSearcher, make_partition_index
from .strategies import (
    build_global_searcher,
    build_role_searcher,
    build_comb_searcher,
    build_searcher,
    STRATEGIES,
)

__all__ = [
    "BuiltPartition",
    "PartitionedSearcher",
    "make_partition_index",
    "build_global_searcher",
    "build_role_searcher",
    "build_comb_searcher",
    "build_searcher",
    "STRATEGIES",
]
