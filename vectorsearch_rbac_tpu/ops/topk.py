"""Host-side top-k merge across partitions with (doc, block) dedupe.

Replaces the reference's Python merge of per-partition SQL results
(reference controller/dynamic_partition/search.py:347 merge_results and
controller/baseline/prefilter/prefilter_role.py per-role merge): results
are sorted by distance and deduplicated. Because every partition reports
*arena row ids* (logical partitions share the one vector arena — reference
shared_vector_table.h semantics), dedupe by (doc, block) reduces to dedupe
by row id.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def merge_topk_host(
    dists_list: Sequence[np.ndarray],  # each (Q, k_i) ascending, +inf = empty
    idx_list: Sequence[np.ndarray],    # each (Q, k_i) arena row ids, -1 = empty
    k: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Merge per-partition top-k result blocks into one (Q, k) result.

    Duplicate row ids (a row replicated into several partitions) keep the
    smallest distance. Empty slots are dist=+inf / idx=-1.
    """
    dists = np.concatenate([np.asarray(d, dtype=np.float64) for d in dists_list], axis=1)
    idx = np.concatenate([np.asarray(i, dtype=np.int64) for i in idx_list], axis=1)
    q, c = dists.shape
    out_d = np.full((q, k), np.inf)
    out_i = np.full((q, k), -1, dtype=np.int64)
    order = np.argsort(dists, axis=1, kind="stable")
    for qi in range(q):
        seen: set = set()
        n = 0
        for j in order[qi]:
            rid = idx[qi, j]
            if rid < 0 or rid in seen:
                continue
            seen.add(rid)
            out_d[qi, n] = dists[qi, j]
            out_i[qi, n] = rid
            n += 1
            if n == k:
                break
    return out_d, out_i
