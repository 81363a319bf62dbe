"""Flat (exact) index: the fused masked scan over a row subset.

Replaces both the reference's exact ground-truth engines (Postgres brute
force with index scans disabled, reference
basic_benchmark/common_function.py:671-747; FAISS IndexFlatL2 :573-650) and
serves as the first per-partition searcher. `mode="approx"` switches the
per-block merge to lax.approx_min_k for the serving path.

Physical vs logical rows: a FlatIndex over a row subset gathers its rows
into contiguous device arrays (a "physical" partition — like the
reference's materialized documentblocks_role_<r> tables); built over the
whole arena it is the global scan (the RLS-baseline analog). Row ids
returned are always *arena* row ids via the device-resident row map, so
cross-partition dedupe works on ids alone.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import numpy as np

from ..core import DeviceArena
from ..ops.scan import scan_topk_aug_fn, scan_topk_fn


import jax as _jax
import jax.numpy as _jnp


@_jax.jit
def _map_rows(i, row_map):
    """Translate local indexes to arena row ids on device. Module-level jit:
    a per-call jax.jit wrapper re-traces every invocation, which through a
    remote-compile tunnel costs ~0.5s per partition dispatch."""
    safe = _jnp.maximum(i, 0)
    return _jnp.where(i < 0, -1, _jnp.take(row_map, safe))


def _pad_to_bucket(n: int, block_rows: int) -> int:
    """Pad row counts to block multiples on a power-of-two bucket schedule so
    the number of distinct compiled scan shapes stays O(log N)."""
    n_blocks = max(1, math.ceil(n / block_rows))
    bucket = 1 << (n_blocks - 1).bit_length()
    return bucket * block_rows


class FlatIndex:
    def __init__(
        self,
        arena: DeviceArena,
        rows: Optional[np.ndarray] = None,   # arena row ids; None = whole arena
        block_rows: int = 16384,
        mode: str = "exact",
        query_batch: int = 256,
        dtype: Optional[str] = None,  # compute dtype of gathered partitions
        recall_target: float = 0.95,  # per-block PartialReduce target (approx mode)
    ):
        import jax
        import jax.numpy as jnp

        self.block_rows = block_rows
        self.mode = mode
        self.query_batch = query_batch
        self.recall_target = recall_target
        self._arena = arena
        self.metric = arena.metric

        self._dim = arena.dim
        if rows is None:
            # whole arena: reuse its device buffers, no copy
            self.n_rows = arena.n
            self._vectors = arena.vectors
            self._norms = arena.norms
            self._bits = arena.role_bits
            self._row_map = None  # identity
            self._gathered = False
            self._vectors_aug = arena.vectors_aug if mode == "approx" else None
        else:
            rows = np.asarray(rows, dtype=np.int64)
            self.n_rows = len(rows)
            npad = _pad_to_bucket(max(self.n_rows, 1), block_rows)
            pad = npad - self.n_rows
            if arena.host_vectors is not None:
                host_vec, host_norm, host_bits = (
                    arena.host_vectors, arena.host_norms, arena.host_bits
                )
            else:  # fall back to a device pull
                host_vec = np.asarray(arena.vectors, dtype=np.float32)
                host_norm = np.asarray(arena.norms)
                host_bits = np.asarray(arena.role_bits)
            vecs = np.concatenate([host_vec[rows], np.zeros((pad, host_vec.shape[1]), np.float32)])
            norms = np.concatenate([host_norm[rows], np.zeros(pad, host_norm.dtype)])
            bits = np.concatenate([host_bits[rows], np.zeros((pad, host_bits.shape[1]), host_bits.dtype)])
            rmap = np.concatenate([rows, np.full(pad, -1, dtype=np.int64)]).astype(np.int32)
            part_dtype = jnp.dtype(dtype) if dtype else arena.vectors.dtype
            self._vectors = jax.device_put(vecs.astype(part_dtype))
            self._norms = jax.device_put(norms)
            self._bits = jax.device_put(bits)
            self._row_map = jax.device_put(rmap)
            self._gathered = True
            if mode == "approx" and self.metric != "l1":
                from ..core import augment_with_norms
                self._vectors_aug = jax.device_put(
                    augment_with_norms(vecs, norms).astype(part_dtype)
                )
            else:
                # l1 (pgvector <+>) has no matmul form — always the
                # broadcast |x-q| scan path (no augmented layout)
                self._vectors_aug = None

    # ------------------------------------------------------------- search

    def search_deferred(self, queries: np.ndarray, query_masks: np.ndarray, k: int):
        """Dispatch without syncing; returns a finalize() -> (dists, ids).
        Lets the engine pipeline many partitions' scans through the device
        queue before paying a single host sync."""
        import jax.numpy as jnp

        q = np.asarray(queries, dtype=np.float32)
        m = np.asarray(query_masks, dtype=np.uint32)
        nq = q.shape[0]
        bs = self.query_batch
        pending = []
        for s in range(0, nq, bs):
            e = min(s + bs, nq)
            qb = np.zeros((bs, q.shape[1]), dtype=np.float32)
            mb = np.zeros((bs, m.shape[1]), dtype=np.uint32)
            qb[: e - s] = q[s:e]
            mb[: e - s] = m[s:e]
            if self._vectors_aug is not None:
                d, i = scan_topk_aug_fn(
                    jnp.asarray(qb), self._vectors_aug, self._bits,
                    jnp.asarray(mb), self._dim, k, self.block_rows,
                    self.mode, self.recall_target, metric=self.metric,
                )
            else:
                d, i = scan_topk_fn(
                    jnp.asarray(qb), self._vectors, self._norms, self._bits,
                    jnp.asarray(mb), k, self.block_rows, self.mode,
                    self.recall_target, metric=self.metric,
                )
            if self._row_map is not None:
                i = _map_rows(i, self._row_map)
            pending.append((s, e, d, i))

        def finalize():
            out_d = np.empty((nq, k), dtype=np.float32)
            out_i = np.empty((nq, k), dtype=np.int64)
            for s, e, d, i in pending:
                out_d[s:e] = np.asarray(d)[: e - s]
                out_i[s:e] = np.asarray(i)[: e - s]
            return out_d, out_i

        return finalize

    def search(
        self, queries: np.ndarray, query_masks: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        return self.search_deferred(queries, query_masks, k)()

    # ------------------------------------------------------------ storage

    def storage_bytes(self) -> Dict[str, int]:
        if not self._gathered:
            # whole-arena index adds no storage beyond the shared arena
            return {"vectors": 0, "index": 0}
        d = self._vectors.shape[1]
        w = self._bits.shape[1]
        npad = self._vectors.shape[0]
        vec_bytes = npad * d * self._vectors.dtype.itemsize
        aux = npad * (4 + 4 * w + 4)  # norms + bitsets + row map
        return {"vectors": int(vec_bytes), "index": int(aux)}
