import numpy as np

from vectorsearch_rbac_tpu.core import Corpus, build_device_arena, pad_rows
from vectorsearch_rbac_tpu.data import synthetic_corpus, sift_like_corpus


def test_synthetic_corpus_shapes():
    c = synthetic_corpus(num_docs=50, blocks_per_doc=3, dim=16, seed=1)
    assert c.n == 150 and c.dim == 16
    assert c.num_docs == 50
    assert c.avg_blocks_per_doc == 3.0
    # deterministic
    c2 = synthetic_corpus(num_docs=50, blocks_per_doc=3, dim=16, seed=1)
    np.testing.assert_array_equal(c.vectors, c2.vectors)


def test_sift_like_corpus():
    c, queries = sift_like_corpus(num_vectors=1000, dim=16, blocks_per_doc=10, seed=2)
    assert c.n == 1000 and queries.shape == (10000, 16)
    assert c.vectors.min() >= 0 and c.vectors.max() <= 255
    assert np.all(c.vectors == np.floor(c.vectors))


def test_rows_for_docs(small_corpus):
    rows = small_corpus.rows_for_docs(np.array([0, 5]))
    assert len(rows) == 8  # 4 blocks per doc
    assert set(small_corpus.doc_ids[rows].tolist()) == {0, 5}


def test_device_arena(small_world, small_corpus):
    arena = build_device_arena(small_corpus, small_world, block_rows=256)
    assert arena.n == small_corpus.n
    assert arena.n_padded == pad_rows(small_corpus.n, 256)
    # padding rows have zero role bits -> always masked out
    bits = np.asarray(arena.role_bits)
    assert bits[arena.n:].sum() == 0
    # norms match
    norms = np.asarray(arena.norms)[: arena.n]
    expect = np.einsum("nd,nd->n", small_corpus.vectors, small_corpus.vectors)
    np.testing.assert_allclose(norms, expect, rtol=1e-5)
    # role bits gathered per row from per-doc bitsets
    np.testing.assert_array_equal(
        bits[: arena.n], small_world.doc_role_bits[small_corpus.doc_ids]
    )
