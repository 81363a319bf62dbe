"""Index interface: what a partition's searcher must provide.

Replaces pgvector's access-method interface (amsearch over HNSW/IVFFlat,
reference pgvector/src/hnsw.c) with a batched, device-resident contract:
queries go in as a (Q, d) batch with (Q, W) role masks; arena row ids come
out. All indexes report storage in bytes split into vector payload vs index
structure, mirroring the reference C++ benchmark's graph/vector breakdown
(reference logical_partition_benchmark .../src/role_partition_results.json
"storage" block).
"""

from __future__ import annotations

from typing import Dict, Protocol, Tuple

import numpy as np


class PartitionIndex(Protocol):
    n_rows: int  # valid (unpadded) rows covered by this index

    def search(
        self,
        queries: np.ndarray,      # (Q, d) float32
        query_masks: np.ndarray,  # (Q, W) uint32
        k: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Return (dists (Q, k) ascending true L2^2, arena_row_ids (Q, k)).

        Empty slots: dist=+inf, id=-1. Every returned row must satisfy the
        role-mask permission check — enforcement happens inside the index,
        never as a post-filter on the caller side.
        """
        ...

    def storage_bytes(self) -> Dict[str, int]:
        """{"vectors": payload bytes, "index": structure bytes (graphs,
        centroids, bitsets, row maps)}."""
        ...
