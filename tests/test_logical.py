"""Logical (no-copy) partition serving: graph search and flat scans over
the SHARED arena via row_map indirection must return the same results as
the gathered physical copies, at a fraction of the per-partition storage.

Mirrors the reference's pointer-vs-physical partition experiment
(logical_partition_benchmark/benchmark/src/pointer_hnsw_index.cpp:77
add_from_storage_ids over shared_vector_table.h; results committed at
src/role_partition_results.json).
"""

import numpy as np
import pytest

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator


@pytest.fixture(scope="module")
def world():
    return TreeRBACGenerator(
        num_users=80, num_roles=16, num_docs=120, h=3, b0=2, b1=2, seed=5
    ).generate()


@pytest.fixture(scope="module")
def corpus():
    c, _ = sift_like_corpus(num_vectors=1200, dim=32, blocks_per_doc=10, seed=4)
    return c


@pytest.fixture(scope="module")
def arena(corpus, world):
    return build_device_arena(corpus, world, block_rows=256, dtype="int8")


def _partition_rows(corpus, world, role=3):
    docs = np.fromiter(world.role_to_docs[role], dtype=np.int64)
    return np.nonzero(np.isin(corpus.doc_ids, docs))[0].astype(np.int64)


def test_hnsw_logical_matches_physical(corpus, world, arena):
    from vectorsearch_rbac_tpu.index.hnsw import HNSWIndex

    rows = _partition_rows(corpus, world)
    assert len(rows) >= 50
    phys = HNSWIndex(arena, rows, m=8, ef_construction=48, seed=3)
    logi = HNSWIndex(arena, rows, m=8, ef_construction=48, seed=3,
                     logical=True)
    # identical build (same seed) -> identical graphs
    np.testing.assert_array_equal(
        np.asarray(phys._graph), np.asarray(logi._graph))

    rng = np.random.default_rng(0)
    nq, k = 12, 5
    q = rng.integers(0, 256, (nq, corpus.dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, nq)
    masks = world.user_masks[users]
    for kwargs in ({}, {"iterative": True, "sampled_entry": True},
                   {"filtered_traversal": True}):
        dp, ip = phys.search(q, masks, k, ef_search=32, **kwargs)
        dl, il = logi.search(q, masks, k, ef_search=32, **kwargs)
        np.testing.assert_array_equal(ip, il)
        np.testing.assert_allclose(dp, dl, rtol=1e-2, atol=1.0)

    sp, sl = phys.storage_bytes(), logi.storage_bytes()
    assert sl["vectors"] == 0
    assert sl["index"] < sp["index"]
    assert sp["vectors"] > 0


def test_hnsw_logical_insert(corpus, world, arena):
    from vectorsearch_rbac_tpu.index.hnsw import HNSWIndex

    rows = _partition_rows(corpus, world)
    half = len(rows) // 2
    idx = HNSWIndex(arena, rows[:half], m=8, ef_construction=48, seed=3,
                    logical=True)
    idx.insert_rows(arena, rows[half:])
    assert idx.n_rows == len(rows)

    rng = np.random.default_rng(1)
    q = rng.integers(0, 256, (8, corpus.dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, 8)
    masks = world.user_masks[users]
    d, i = idx.search(q, masks, 5, ef_search=32, iterative=True,
                      sampled_entry=True)
    # inserted rows are findable; all results admissible
    bits = corpus.vector_role_bits(world)
    found_new = False
    for qi in range(8):
        for r in i[qi]:
            if r >= 0:
                assert (bits[int(r)] & masks[qi]).any()
                if int(r) in set(rows[half:].tolist()):
                    found_new = True
    assert found_new


def test_int8flat_logical_matches_physical(corpus, world, arena):
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex

    rows = _partition_rows(corpus, world)
    phys = Int8FlatIndex(arena, rows, query_batch=32, q_tile=16,
                         block_rows=256, group=8)
    logi = Int8FlatIndex(arena, rows, query_batch=32, q_tile=16,
                         block_rows=256, group=8, logical=True)
    rng = np.random.default_rng(2)
    nq, k = 16, 5
    q = rng.integers(0, 256, (nq, corpus.dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, nq)
    masks = world.user_masks[users]
    dp, ip = phys.search(q, masks, k)
    dl, il = logi.search(q, masks, k)
    np.testing.assert_array_equal(ip, il)
    np.testing.assert_allclose(dp[np.isfinite(dp)], dl[np.isfinite(dl)],
                               rtol=1e-2)

    sp, sl = phys.storage_bytes(), logi.storage_bytes()
    assert sl["vectors"] == 0 and sp["vectors"] > 0
    assert sl["index"] < sp["index"] + sp["vectors"]


def test_tiled_big_logical_parity(corpus, world, arena):
    """big_logical=True (big tier served from the shared arena by row
    gather) must return the same results as the gathered-copy big tier."""
    import numpy as np

    from vectorsearch_rbac_tpu.partition.tiled import TiledSearcher

    partition_rows = {}
    for role, docs in sorted(world.role_to_docs.items()):
        rows = corpus.rows_for_docs(
            np.fromiter(docs, dtype=np.int64, count=len(docs)))
        if len(rows):
            partition_rows[role] = rows
    u2r = world.user_to_roles

    def router(uid):
        return tuple(r for r in u2r.get(uid, ()) if r in partition_rows)

    # big_chunks=0 forces EVERY partition into the big tier
    kw = dict(chunk_rows=128, q_tile=8, num_roles=world.num_roles,
              big_chunks=0, big_group=8, scan_group=0)
    phys = TiledSearcher(arena, partition_rows, router, name="t", **kw)
    logi = TiledSearcher(arena, partition_rows, router, name="t",
                         big_logical=True, **kw)
    assert len(phys._big) == len(partition_rows)

    rng = np.random.default_rng(4)
    q = rng.standard_normal((16, corpus.dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, 16)
    dp, ip = phys.search_batch(q, users, world.user_masks, k=6)
    dl, il = logi.search_batch(q, users, world.user_masks, k=6)
    np.testing.assert_array_equal(ip, il)
    np.testing.assert_allclose(dp, dl, rtol=1e-3, atol=1e-1)
