"""Sparse vectors: the pgvector sparsevec analog.

Covers: padded-CSR layout, all four operator distances vs a dense numpy
oracle, RBAC mask enforcement, sparse-query entry, subset (partition)
row mapping, and storage accounting.
"""

import numpy as np
import pytest

from vectorsearch_rbac_tpu.data.sparse import (
    SparseCorpus, synthetic_sparse_corpus,
)
from vectorsearch_rbac_tpu.index.sparse import SparseFlatIndex
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator


@pytest.fixture(scope="module")
def world():
    return TreeRBACGenerator(
        num_users=60, num_roles=12, num_docs=120, h=3, b0=2, b1=2, seed=9
    ).generate()


@pytest.fixture(scope="module")
def corpus():
    return synthetic_sparse_corpus(num_docs=120, blocks_per_doc=3, dim=512,
                                   nnz_low=8, nnz_high=24, num_topics=8,
                                   seed=11)


def _dense(corpus: SparseCorpus) -> np.ndarray:
    return np.stack([corpus.row_dense(i) for i in range(corpus.n)])


def _oracle(dense, bits, q, mask, k, metric):
    adm = (bits & mask).any(axis=1)
    v = dense.astype(np.float64)
    if metric == "l2":
        dist = ((v - q) ** 2).sum(axis=1)
    elif metric == "l1":
        dist = np.abs(v - q).sum(axis=1)
    elif metric == "ip":
        dist = -(v @ q)
    else:
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        dist = 1.0 - vn @ (q / max(np.linalg.norm(q), 1e-30))
    dist[~adm] = np.inf
    order = np.argsort(dist, kind="stable")[:k]
    return [int(i) for i in order if np.isfinite(dist[i])], dist


def _sparse_queries(corpus, nq, seed=0):
    """Queries = perturbed corpus rows (realistic learned-sparse regime)."""
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, corpus.n, nq)
    qnnz = 32
    q_cols = np.full((nq, qnnz), corpus.dim, np.int32)
    q_vals = np.zeros((nq, qnnz), np.float32)
    for i, r in enumerate(rows):
        s, e = corpus.indptr[r], corpus.indptr[r + 1]
        take = min(e - s, qnnz)
        q_cols[i, :take] = corpus.indices[s:s + take]
        q_vals[i, :take] = corpus.data[s:s + take] * \
            (1.0 + 0.1 * rng.standard_normal(take)).astype(np.float32)
    return q_cols, q_vals


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine", "l1"])
def test_sparse_scan_matches_dense_oracle(corpus, world, metric):
    idx = SparseFlatIndex(corpus, world, None, block_rows=128,
                          query_batch=16, metric=metric)
    dense = _dense(corpus)
    bits = corpus.vector_role_bits(world)
    q_cols, q_vals = _sparse_queries(corpus, 12, seed=3)
    rng = np.random.default_rng(4)
    users = rng.integers(0, world.num_users, 12)
    masks = world.user_masks[users].astype(np.uint32)

    k = 6
    d, ids = idx.search_sparse(q_cols, q_vals, masks, k)
    from vectorsearch_rbac_tpu.ops.sparse_scan import densify_queries
    qd = densify_queries(q_cols, q_vals, corpus.dim)[:, :-1]
    for qi in range(12):
        want, dist = _oracle(dense, bits, qd[qi].astype(np.float64),
                             masks[qi], k, metric)
        got = [int(x) for x in ids[qi] if x >= 0]
        assert set(got) == set(want), f"{metric} q{qi}"
        for j, r in enumerate(got):
            assert abs(d[qi, j] - dist[r]) < 1e-3 + 1e-3 * abs(dist[r])
        for r in got:  # permission enforcement
            assert (bits[r] & masks[qi]).any()


def test_sparse_dense_query_entry(corpus, world):
    """The PartitionIndex-protocol dense entry gives the same results."""
    idx = SparseFlatIndex(corpus, world, None, block_rows=128,
                          query_batch=16, metric="ip")
    q_cols, q_vals = _sparse_queries(corpus, 6, seed=5)
    from vectorsearch_rbac_tpu.ops.sparse_scan import densify_queries
    qd = densify_queries(q_cols, q_vals, corpus.dim)[:, :-1]
    masks = np.full((6, world.words), 0xFFFFFFFF, np.uint32)
    d1, i1 = idx.search_sparse(q_cols, q_vals, masks, 5)
    d2, i2 = idx.search(qd, masks, 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_sparse_subset_rows_map_to_corpus_ids(corpus, world):
    rows = np.arange(0, corpus.n, 2, dtype=np.int64)
    idx = SparseFlatIndex(corpus, world, rows, block_rows=128, metric="ip")
    q_cols, q_vals = _sparse_queries(corpus, 5, seed=6)
    masks = np.full((5, world.words), 0xFFFFFFFF, np.uint32)
    _, ids = idx.search_sparse(q_cols, q_vals, masks, 6)
    valid = ids[ids >= 0]
    assert len(valid) and (valid % 2 == 0).all()


def test_sparse_zero_role_user_gets_nothing(corpus, world):
    idx = SparseFlatIndex(corpus, world, None, block_rows=128, metric="l2")
    q_cols, q_vals = _sparse_queries(corpus, 3, seed=7)
    masks = np.zeros((3, world.words), np.uint32)
    d, ids = idx.search_sparse(q_cols, q_vals, masks, 4)
    assert (ids == -1).all() and np.isinf(d).all()


def test_sparse_storage_reports_padded_csr(corpus, world):
    idx = SparseFlatIndex(corpus, world, None, block_rows=128)
    st = idx.storage_bytes()
    assert st["vectors"] > 0 and st["index"] > 0
    # padded CSR beats dense storage at this sparsity (24/512 max density)
    npad = idx._cols.shape[0]
    assert st["vectors"] < npad * corpus.dim * 4
