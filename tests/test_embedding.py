"""Text embedding service + text-corpus ingestion (reference
services/embedding_service.py, read_dataset_function.py text path)."""
import numpy as np

from vectorsearch_rbac_tpu.data import HashingEmbedder, ingest_text_corpus


def test_hashing_embedder_deterministic_normalized():
    e = HashingEmbedder(dim=64, seed=3)
    texts = ["the quick brown fox", "the quick brown fox", "lazy dog"]
    v = e.embed(texts)
    assert v.shape == (3, 64) and v.dtype == np.float32
    np.testing.assert_array_equal(v[0], v[1])      # deterministic
    assert abs(np.linalg.norm(v[0]) - 1.0) < 1e-5  # unit rows
    # different text -> different vector
    assert not np.allclose(v[0], v[2])
    # similar texts land closer than dissimilar ones
    sim = e.embed(["the quick brown fox jumps"])[0]
    assert v[0] @ sim > v[0] @ v[2]


def test_ingest_text_corpus_block_structure():
    docs = [
        " ".join(f"w{i}" for i in range(150)),   # 3 blocks at 64 words
        "short document",                         # 1 block
        " ".join(f"x{i}" for i in range(64)),     # exactly 1 block
    ]
    corpus = ingest_text_corpus(docs, HashingEmbedder(dim=32),
                                words_per_block=64)
    assert corpus.num_docs == 3
    assert corpus.n == 3 + 1 + 1
    np.testing.assert_array_equal(corpus.doc_ids, [0, 0, 0, 1, 2])
    np.testing.assert_array_equal(corpus.block_ids, [0, 1, 2, 0, 0])
    assert corpus.dim == 32
    # rows are the embeddings of the chunks
    e = HashingEmbedder(dim=32)
    np.testing.assert_allclose(
        corpus.vectors[3], e.embed(["short document"])[0], atol=1e-6)


def test_ingest_feeds_full_pipeline():
    """The text path must produce a Corpus the rest of the framework
    accepts: RBAC world + arena + fused scan, end to end."""
    from vectorsearch_rbac_tpu.core import build_device_arena
    from vectorsearch_rbac_tpu.index.flat import FlatIndex
    from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
    from vectorsearch_rbac_tpu.rbac.world import query_masks_for

    rng = np.random.default_rng(0)
    docs = [" ".join(rng.choice(["alpha", "beta", "gamma", "delta", "eps"],
                                size=40).tolist()) for _ in range(30)]
    corpus = ingest_text_corpus(docs, HashingEmbedder(dim=32),
                                words_per_block=16)
    world = TreeRBACGenerator(num_users=20, num_roles=6,
                              num_docs=corpus.num_docs, h=2, b0=2, b1=2,
                              seed=1).generate()
    arena = build_device_arena(corpus, world, block_rows=128)
    idx = FlatIndex(arena, None, block_rows=128, mode="exact",
                    query_batch=32)
    q = corpus.vectors[:4]
    masks = query_masks_for(world.user_masks, np.arange(4))
    d, ids = idx.search(q, masks, 5)
    bits = corpus.vector_role_bits(world)
    for qi in range(4):
        for r in ids[qi]:
            if r >= 0:
                assert (bits[r] & masks[qi]).any()
