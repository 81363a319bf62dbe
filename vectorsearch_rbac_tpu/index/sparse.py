"""Sparse flat index: fused RBAC-masked sparse scan over a row subset.

The serving surface for pgvector's `sparsevec` columns (reference
pgvector/src/sparsevec.c operator family; pgvector indexes sparsevec with
HNSW only — here the padded-CSR flat scan IS the fast path, because the
whole corpus's support fits in one gather-fused device pass; a graph is
unnecessary at pgvector's sparsevec scales).

Queries may arrive sparse (cols, vals) — the native form — or dense
(Q, d), which is converted host-side. Query densification is per batch:
one (Q, d+1) float32 buffer uploaded per dispatch (d ~ vocabulary size;
at d=32k and Q=1024 that is 128 MB/s-class traffic, amortized by the
corpus-side scan).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..data.sparse import SparseCorpus
from ..ops.sparse_scan import (
    densify_queries, masked_sparse_topk, pad_sparse_rows, sparse_topk_fn,
)
from ..rbac.world import RBACWorld



from .flat import _map_rows as _map_rows_sp, _pad_to_bucket  # noqa: E402


class SparseFlatIndex:
    """PartitionIndex over a SparseCorpus (or a row subset of one)."""

    def __init__(
        self,
        corpus: SparseCorpus,
        world: RBACWorld,
        rows: Optional[np.ndarray] = None,
        block_rows: int = 2048,
        mode: str = "exact",
        query_batch: int = 256,
        metric: str = "l2",      # l2 | ip | cosine | l1 (sparsevec.c family)
        recall_target: float = 0.95,
    ):
        import jax

        assert metric in ("l2", "ip", "cosine", "l1"), metric
        self.block_rows = block_rows
        self.mode = mode
        self.query_batch = query_batch
        self.metric = metric
        self.recall_target = recall_target
        self.dim = corpus.dim

        if rows is None:
            sel = np.arange(corpus.n, dtype=np.int64)
        else:
            sel = np.asarray(rows, dtype=np.int64)
        self.n_rows = len(sel)
        npad = _pad_to_bucket(max(self.n_rows, 1), block_rows)

        # slice the CSR rows we serve, then pad to the block layout
        counts = np.diff(corpus.indptr)[sel]
        indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        if len(sel):
            # vectorized gather of the selected rows' nnz ranges
            starts = corpus.indptr[sel].astype(np.int64)
            take = np.repeat(starts - indptr[:-1], counts) + \
                np.arange(indptr[-1], dtype=np.int64)
        else:
            take = np.empty(0, np.int64)
        indices = corpus.indices[take]
        data = corpus.data[take].astype(np.float32)
        if metric == "cosine":
            # normalize rows at ingest (cosine rides the ip score path)
            nrm = np.sqrt(np.maximum(corpus.norms[sel], 1e-30))
            data = data / np.repeat(nrm, counts).astype(np.float32)
        cols, vals, self.nnz_pad = pad_sparse_rows(
            indptr, indices, data, corpus.dim, npad)
        norms = np.zeros(npad, dtype=np.float32)
        norms[: self.n_rows] = (np.ones(self.n_rows)
                                if metric == "cosine"
                                else corpus.norms[sel])
        host_bits = corpus.vector_role_bits(world)
        rbits = np.zeros((npad, host_bits.shape[1]), np.uint32)
        rbits[: self.n_rows] = host_bits[sel]
        rmap = np.concatenate(
            [sel, np.full(npad - self.n_rows, -1, np.int64)]).astype(np.int32)

        self._cols = jax.device_put(cols)
        self._vals = jax.device_put(vals)
        self._norms = jax.device_put(norms)
        self._bits = jax.device_put(rbits)
        self._row_map = jax.device_put(rmap)

    # ------------------------------------------------------------- search

    def search_sparse(
        self,
        q_cols: np.ndarray,       # (Q, qnnz) int32 padded with self.dim
        q_vals: np.ndarray,       # (Q, qnnz) float32, 0 on padding
        query_masks: np.ndarray,  # (Q, W) uint32
        k: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        qd = densify_queries(np.asarray(q_cols), np.asarray(q_vals), self.dim)
        return self._search_dense_buffer(qd, query_masks, k)

    def search(self, queries: np.ndarray, query_masks: np.ndarray,
               k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Dense (Q, d) queries — the PartitionIndex protocol form."""
        q = np.asarray(queries, dtype=np.float32)
        qd = np.concatenate(
            [q, np.zeros((q.shape[0], 1), np.float32)], axis=1)
        return self._search_dense_buffer(qd, query_masks, k)

    def _search_dense_buffer(self, qd, query_masks, k):
        import jax.numpy as jnp

        m = np.asarray(query_masks, dtype=np.uint32)
        nq = qd.shape[0]
        bs = self.query_batch
        out_d = np.empty((nq, k), dtype=np.float32)
        out_i = np.empty((nq, k), dtype=np.int64)
        for s in range(0, nq, bs):
            e = min(s + bs, nq)
            qb = np.zeros((bs, qd.shape[1]), dtype=np.float32)
            mb = np.zeros((bs, m.shape[1]), dtype=np.uint32)
            qb[: e - s] = qd[s:e]
            mb[: e - s] = m[s:e]
            d, i = sparse_topk_fn(
                jnp.asarray(qb), self._cols, self._vals, self._norms,
                self._bits, jnp.asarray(mb), k, self.block_rows, self.mode,
                self.recall_target, metric=self.metric)
            i = _map_rows_sp(i, self._row_map)
            out_d[s:e] = np.asarray(d)[: e - s]
            out_i[s:e] = np.asarray(i)[: e - s]
        return out_d, out_i

    # ------------------------------------------------------------ storage

    def storage_bytes(self) -> Dict[str, int]:
        npad = self._cols.shape[0]
        payload = npad * self.nnz_pad * (4 + 4)     # cols + vals
        aux = npad * (4 + 4 * self._bits.shape[1] + 4)  # norms+bits+rowmap
        return {"vectors": int(payload), "index": int(aux)}
