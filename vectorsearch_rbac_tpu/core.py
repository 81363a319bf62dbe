"""Corpus: the single shared vector arena.

Replaces the reference's `documentblocks` Postgres table (reference
controller/initialize_main_tables.py:40-55) and the C++ SharedVectorTable
(reference logical_partition_benchmark/benchmark/src/shared_vector_table.h:18-90):
one (N, d) array of vectors plus parallel (doc_id, block_id) columns. Every
partition strategy addresses rows of this one arena by index — the
"logical/pointer partition" design the reference's C++ benchmark shows wins
on storage (SURVEY.md section 2.4 N2) — and may optionally materialize
gathered copies ("physical" partitions) to trade HBM for scan locality.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Optional

import numpy as np

from .rbac.world import RBACWorld


@dataclass(frozen=True)
class Corpus:
    """Host-side corpus: vectors plus (doc, block) identity columns.

    Rows are "document blocks": a document owns one or more vector rows,
    mirroring the reference's block grouping (100 SIFT vectors per synthetic
    document, reference services/read_dataset_function.py:27).
    """

    vectors: np.ndarray   # (N, d) float32
    doc_ids: np.ndarray   # (N,) int32, 0-based document index
    block_ids: np.ndarray  # (N,) int32, block index within the document

    def __post_init__(self):
        assert self.vectors.ndim == 2
        assert self.doc_ids.shape == (self.vectors.shape[0],)
        assert self.block_ids.shape == (self.vectors.shape[0],)

    @property
    def n(self) -> int:
        return self.vectors.shape[0]

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]

    @cached_property
    def num_docs(self) -> int:
        return int(self.doc_ids.max()) + 1 if self.n else 0

    @cached_property
    def avg_blocks_per_doc(self) -> float:
        """Average blocks per document (reference hnsw/helper.py:74-77)."""
        return self.n / max(1, self.num_docs)

    @cached_property
    def doc_row_index(self) -> np.ndarray:
        """CSR-ish: row ids sorted by doc id, plus offsets per doc."""
        order = np.argsort(self.doc_ids, kind="stable")
        return order

    @cached_property
    def doc_row_offsets(self) -> np.ndarray:
        counts = np.bincount(self.doc_ids, minlength=self.num_docs)
        return np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    def rows_for_docs(self, doc_ids: np.ndarray) -> np.ndarray:
        """All arena row indexes belonging to the given documents."""
        order, offs = self.doc_row_index, self.doc_row_offsets
        parts = [order[offs[d]:offs[d + 1]] for d in np.asarray(doc_ids, dtype=np.int64)]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.sort(np.concatenate(parts))

    def vector_role_bits(self, world: RBACWorld) -> np.ndarray:
        """(N, W) uint32: per-row role bitset, gathered from the per-document
        bitsets. This is the device-side permission table that the fused
        scan kernels AND against the query's user mask."""
        return world.doc_role_bits[self.doc_ids]


def pad_rows(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


@dataclass(frozen=True)
class DeviceArena:
    """Device-resident arena: vectors + squared norms + role bitsets, padded
    to a block multiple. Padding rows have role_bits == 0, so the fused
    permission mask rejects them for every query — no separate validity mask
    is needed on the hot path.
    """

    vectors: object     # jax.Array (Npad, d), compute dtype
    norms: object       # jax.Array (Npad,) float32, squared L2 norms
    role_bits: object   # jax.Array (Npad, W) uint32
    n: int              # valid rows
    doc_ids: np.ndarray   # host (N,) for result translation
    block_ids: np.ndarray
    # host mirrors (float32) so partition builds gather without device pulls
    host_vectors: Optional[np.ndarray] = None   # (Npad, d) float32
    host_norms: Optional[np.ndarray] = None
    host_bits: Optional[np.ndarray] = None
    # augmented layout: [x, norm_hi, norm_lo, 0-pad] — the squared-norm term
    # folds into the distance matmul itself (scores = q_aug . x_aug), saving
    # a full (Q, N) elementwise pass per scan; hi/lo split keeps ~1e-5
    # relative norm precision in bf16
    vectors_aug: Optional[object] = None        # jax.Array (Npad, d_aug)

    @property
    def n_padded(self) -> int:
        return self.vectors.shape[0]

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]


def build_device_arena(
    corpus: Corpus,
    world: RBACWorld,
    block_rows: int = 16384,
    dtype: str = "float32",
    device=None,
    with_aug: bool = True,   # False saves HBM when only the exact
                             # (non-augmented) path is needed, e.g. the
                             # ground-truth oracle arena at 10M scale
) -> DeviceArena:
    """Upload the corpus once into HBM, padded to a block multiple."""
    import jax
    import jax.numpy as jnp

    n, d = corpus.n, corpus.dim
    npad = pad_rows(max(n, 1), block_rows)
    vecs = np.zeros((npad, d), dtype=np.float32)
    vecs[:n] = corpus.vectors
    norms = np.zeros(npad, dtype=np.float32)
    norms[:n] = np.einsum("nd,nd->n", corpus.vectors, corpus.vectors, dtype=np.float64)
    bits = np.zeros((npad, world.words), dtype=np.uint32)
    bits[:n] = corpus.vector_role_bits(world)

    put = (lambda x: jax.device_put(x, device)) if device is not None else jax.device_put
    return DeviceArena(
        vectors=put(vecs.astype(jnp.dtype(dtype))),
        norms=put(norms),
        role_bits=put(bits),
        n=n,
        doc_ids=corpus.doc_ids,
        block_ids=corpus.block_ids,
        host_vectors=vecs,
        host_norms=norms,
        host_bits=bits,
        vectors_aug=(
            put(augment_with_norms(vecs, norms).astype(jnp.dtype(dtype)))
            if with_aug else None
        ),
    )


def augment_with_norms(vecs: np.ndarray, norms: np.ndarray) -> np.ndarray:
    """[x | norm_hi | norm_lo | 0-pad to 8] so q_aug . x_aug computes
    ||x||^2 - 2 q.x in one matmul. hi/lo is a bf16 two-float split of the
    norm (bf16 alone has ~0.4% relative error — enough to reorder close
    neighbors)."""
    n, d = vecs.shape
    hi = norms.astype(np.dtype("bfloat16")).astype(np.float32)
    lo = norms - hi
    d_aug = ((d + 2 + 7) // 8) * 8
    out = np.zeros((n, d_aug), dtype=np.float32)
    out[:, :d] = vecs
    out[:, d] = hi
    out[:, d + 1] = lo
    return out


def augment_queries(q: np.ndarray, d_aug: int) -> np.ndarray:
    """[-2q | 1 | 1 | 0-pad]: the matching query-side augmentation."""
    nq, d = q.shape
    out = np.zeros((nq, d_aug), dtype=np.float32)
    out[:, :d] = -2.0 * q
    out[:, d] = 1.0
    out[:, d + 1] = 1.0
    return out
