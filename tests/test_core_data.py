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


def test_load_embedding_dump_npy(tmp_path):
    """Real-file loader for cohere/wikipedia-shaped embedding dumps
    (reference services/read_dataset_function.py:516): npy with implicit
    query holdout, npy with a sibling _queries file, and resolve_dataset
    dispatch with synthetic fallback."""
    import os

    from vectorsearch_rbac_tpu.data import load_embedding_dump, resolve_dataset

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    path = str(tmp_path / "cohere.npy")
    np.save(path, vecs)

    corpus, queries = load_embedding_dump(path, blocks_per_doc=10,
                                          query_holdout=50)
    # holdout is capped at len//10 so tiny corpora keep most rows
    assert corpus.n == 270 and queries.shape == (30, 16)
    # rows are interleaved across docs; identity travels with the vector
    orig = corpus.doc_ids.astype(np.int64) * 10 + corpus.block_ids
    np.testing.assert_array_equal(corpus.vectors, vecs[orig])
    np.testing.assert_array_equal(queries, vecs[270:])

    # explicit query file wins over holdout
    qf = rng.standard_normal((7, 16)).astype(np.float32)
    np.save(str(tmp_path / "cohere_queries.npy"), qf)
    corpus2, queries2 = load_embedding_dump(path, blocks_per_doc=10)
    assert corpus2.n == 300
    np.testing.assert_array_equal(queries2, qf)

    # resolve_dataset finds the file by name in the directory...
    corpus3, q3 = resolve_dataset("cohere", dataset_path=str(tmp_path),
                                  num_vectors=200)
    assert corpus3.n == 200 and q3.shape == (7, 16)
    # ...and falls back to the synthetic twin when absent
    corpus4, _ = resolve_dataset("wikipedia", dataset_path="/nonexistent",
                                 num_vectors=3000)
    assert corpus4.dim == 768


def test_load_embedding_dump_npz(tmp_path):
    from vectorsearch_rbac_tpu.data import load_embedding_dump

    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((120, 8)).astype(np.float32)
    path = str(tmp_path / "wiki.npz")
    np.savez(path, embeddings=vecs)
    corpus, queries = load_embedding_dump(path, blocks_per_doc=4,
                                          query_holdout=20)
    assert corpus.n == 108 and len(queries) == 12  # holdout = len//10


def test_load_arxiv_categories(tmp_path):
    """arXiv metadata JSON-lines -> primary-category ids feeding the
    business RBAC generator (reference arxiv_generator_business.py:20)."""
    import json

    from vectorsearch_rbac_tpu.data import load_arxiv_categories
    from vectorsearch_rbac_tpu.rbac.generators.arxiv_business import (
        ArxivBusinessRBACGenerator,
    )

    path = str(tmp_path / "arxiv-metadata.json")
    records = [
        {"id": "1", "categories": "cs.DB cs.IR"},
        {"id": "2", "categories": "math.CO"},
        {"id": "3", "categories": "cs.DB"},
        {"id": "4", "categories": "physics.optics math.CO"},
        {"id": "5", "categories": "math.CO cs.DB"},
        {"id": "6", "categories": "cs.LG"},
    ]
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")

    cats = load_arxiv_categories(path)
    # primary categories: cs.DB, math.CO, cs.DB, physics.optics, math.CO, cs.LG
    assert cats.tolist() == [0, 1, 0, 2, 1, 3]
    assert load_arxiv_categories(path, max_docs=3).tolist() == [0, 1, 0]

    world = ArxivBusinessRBACGenerator(
        num_users=20, num_docs=len(cats), num_categories=int(cats.max()) + 1,
        doc_categories=cats, n_broles=8, m_froles=2, seed=3,
    ).generate()
    world.validate()
