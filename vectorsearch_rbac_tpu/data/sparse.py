"""Sparse corpora: the pgvector `sparsevec` data model.

Host-side CSR storage of sparse document-block vectors (learned-sparse /
SPLADE-style embeddings, bag-of-words weights), mirroring Corpus's
(doc, block) identity columns so the whole RBAC layer — generators,
per-row role bitsets, routers — applies unchanged (reference
pgvector/src/sparsevec.c stores per-row CSR inside the varlena).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import numpy as np

from ..rbac.world import RBACWorld


@dataclass(frozen=True)
class SparseCorpus:
    """CSR sparse corpus with (doc, block) identity columns."""

    indptr: np.ndarray    # (N+1,) int64 row pointers
    indices: np.ndarray   # (nnz,) int32 column ids, sorted within a row
    data: np.ndarray      # (nnz,) float32 values (non-zero)
    dim: int              # dimensionality (pgvector: up to 1e9 dims)
    doc_ids: np.ndarray   # (N,) int32
    block_ids: np.ndarray  # (N,) int32

    def __post_init__(self):
        assert self.indptr.ndim == 1 and self.indptr[0] == 0
        assert self.indices.shape == self.data.shape
        assert self.doc_ids.shape == (self.n,)

    @property
    def n(self) -> int:
        return len(self.indptr) - 1

    @cached_property
    def num_docs(self) -> int:
        return int(self.doc_ids.max()) + 1 if self.n else 0

    @cached_property
    def norms(self) -> np.ndarray:
        """(N,) float64 squared L2 norms."""
        out = np.zeros(self.n, dtype=np.float64)
        sq = self.data.astype(np.float64) ** 2
        np.add.at(out, np.repeat(np.arange(self.n),
                                 np.diff(self.indptr)), sq)
        return out

    def row_dense(self, i: int) -> np.ndarray:
        """One row densified (test/debug helper)."""
        out = np.zeros(self.dim, dtype=np.float32)
        s, e = self.indptr[i], self.indptr[i + 1]
        out[self.indices[s:e]] = self.data[s:e]
        return out

    def vector_role_bits(self, world: RBACWorld) -> np.ndarray:
        return world.doc_role_bits[self.doc_ids]


def synthetic_sparse_corpus(
    num_docs: int,
    blocks_per_doc: int = 4,
    dim: int = 4096,
    nnz_low: int = 16,
    nnz_high: int = 48,
    num_topics: int = 32,
    seed: int = 0,
) -> SparseCorpus:
    """Clustered synthetic sparse corpus: each document draws a topic; a
    topic owns a preferred column subset, so rows of the same topic share
    support (the structure learned-sparse encoders produce — without it,
    nearest-neighbor search over random sparse rows is degenerate)."""
    rng = np.random.default_rng(seed)
    n = num_docs * blocks_per_doc
    topic_of_doc = rng.integers(0, num_topics, num_docs)
    # each topic prefers 4x the max nnz worth of columns
    topic_cols = [rng.choice(dim, size=min(dim, 4 * nnz_high), replace=False)
                  for _ in range(num_topics)]
    indptr = [0]
    indices = []
    data = []
    doc_ids = np.repeat(np.arange(num_docs, dtype=np.int32), blocks_per_doc)
    block_ids = np.tile(np.arange(blocks_per_doc, dtype=np.int32), num_docs)
    for i in range(n):
        t = topic_of_doc[doc_ids[i]]
        nnz = int(rng.integers(nnz_low, min(nnz_high, dim) + 1))
        # 80% of support from the topic's columns, 20% anywhere (capped by
        # the topic pool so replace=False sampling cannot overdraw)
        n_topic = min(max(1, int(0.8 * nnz)), len(topic_cols[t]))
        cols = np.concatenate([
            rng.choice(topic_cols[t], size=n_topic, replace=False),
            rng.choice(dim, size=nnz - n_topic, replace=False),
        ])
        cols = np.unique(cols)  # sorted + dedup
        vals = np.abs(rng.standard_normal(len(cols))).astype(np.float32) + 0.05
        indices.append(cols.astype(np.int32))
        data.append(vals)
        indptr.append(indptr[-1] + len(cols))
    return SparseCorpus(
        indptr=np.asarray(indptr, dtype=np.int64),
        indices=np.concatenate(indices) if indices else np.empty(0, np.int32),
        data=np.concatenate(data) if data else np.empty(0, np.float32),
        dim=dim,
        doc_ids=doc_ids,
        block_ids=block_ids,
    )
