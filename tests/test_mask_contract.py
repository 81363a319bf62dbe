"""The user-mask contract: search_batch takes the (num_users, W) TABLE and
always indexes it by user_ids — never per-query masks disguised by shape.

Regression for the round-1 advisory: a (num_users, W) table was silently
treated as per-query masks whenever num_users == num_queries, filtering
query i with user i's permissions instead of user_ids[i]'s.
"""

import numpy as np
import pytest

from vectorsearch_rbac_tpu.rbac.world import query_masks_for


def test_table_indexed_by_user_ids_even_when_counts_collide():
    # 4 users, 4 queries — the old heuristic would have treated the table
    # as per-query masks and ignored user_ids entirely
    table = np.arange(4 * 2, dtype=np.uint32).reshape(4, 2) + 1
    user_ids = np.array([3, 3, 0, 1])
    out = query_masks_for(table, user_ids)
    np.testing.assert_array_equal(out, table[user_ids])


def test_out_of_range_user_id_rejected():
    table = np.ones((4, 2), dtype=np.uint32)
    with pytest.raises(AssertionError):
        query_masks_for(table, np.array([4]))


def test_searcher_enforces_user_identity(small_corpus, small_world):
    """Two queries with identical vectors but different users must get
    (potentially) different results — and each result must be admissible
    for ITS user, under num_queries == num_users collision conditions."""
    from vectorsearch_rbac_tpu.core import build_device_arena
    from vectorsearch_rbac_tpu.partition import build_searcher
    from vectorsearch_rbac_tpu.utils.config import FrameworkConfig

    world, corpus = small_world, small_corpus
    arena = build_device_arena(corpus, world, block_rows=256)
    cfg = FrameworkConfig()
    cfg.search.block_rows = 256
    searcher = build_searcher("rls", corpus, world, arena, cfg)

    # num_queries == num_users: the collision case
    nq = world.num_users
    rng = np.random.default_rng(0)
    q = np.tile(rng.standard_normal((1, corpus.dim)).astype(np.float32), (nq, 1))
    user_ids = (np.arange(nq) + 1) % world.num_users  # shifted identity
    d, ids = searcher.search_batch(q, user_ids, world.user_masks, k=5)

    bits = corpus.vector_role_bits(world)
    for qi in range(0, nq, 7):
        mask = world.user_masks[user_ids[qi]]
        for row in ids[qi]:
            if row >= 0:
                assert np.any(bits[int(row)] & mask), (
                    f"query {qi} (user {user_ids[qi]}) got inadmissible row {row}"
                )


def test_ivf_graph_spill_keeps_all_rows():
    """_device_knn_graph_ivf must place every row in exactly one inverted
    list even under heavy skew (regression: spilled rows were silently
    truncated out of the inverted file)."""
    from vectorsearch_rbac_tpu.index.hnsw import _device_knn_graph_ivf

    rng = np.random.default_rng(1)
    # heavy skew: 90% of rows in one tight cluster so its list overflows
    n, d = 3000, 16
    tight = rng.standard_normal((int(n * 0.9), d)).astype(np.float32) * 0.01
    rest = rng.standard_normal((n - tight.shape[0], d)).astype(np.float32) + 5.0
    vec = np.concatenate([tight, rest])
    # internal assert fires if any row is dropped; also sanity-check output
    knn = _device_knn_graph_ivf(vec, k=8, seed=0)
    assert knn.shape == (n, 9)
    assert (knn >= -1).all() and (knn < n).all()
    # every row should have at least one real neighbor
    assert (knn >= 0).any(axis=1).all()
