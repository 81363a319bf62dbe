"""BatchingServer: concurrent single-query clients coalesced into device
batches (the TPU-shaped replacement for the reference's per-user connection
pools, services/config.py:47-131)."""

import threading

import numpy as np
import pytest

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.partition import build_searcher
from vectorsearch_rbac_tpu.serving import BatchingServer
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig


@pytest.fixture(scope="module")
def served(small_world, small_corpus):
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    cfg = FrameworkConfig()
    cfg.search.block_rows = 128
    cfg.index.kind = "flat"
    searcher = build_searcher("rls", small_corpus, small_world, arena, cfg)
    return small_world, small_corpus, arena, searcher


def test_serving_matches_direct_batch(served):
    world, corpus, arena, searcher = served
    rng = np.random.default_rng(0)
    nq = 64
    q = rng.standard_normal((nq, corpus.dim)).astype(np.float32)
    uids = rng.integers(0, world.num_users, nq)
    want_d, want_i = searcher.search_batch(q, uids, world.user_masks, k=5)

    with BatchingServer(searcher, world.user_masks, max_batch=16,
                        max_wait_ms=5.0) as srv:
        results = [None] * nq
        errors = []

        def client(lo, hi):
            try:
                tickets = [srv.submit(q[j], uids[j], 5) for j in range(lo, hi)]
                for j, t in zip(range(lo, hi), tickets):
                    results[j] = t.result(timeout=60)
            except BaseException as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=client, args=(s, min(s + 16, nq)))
                   for s in range(0, nq, 16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        stats = srv.stats()

    for j in range(nq):
        np.testing.assert_array_equal(results[j].row_ids, want_i[j])
        np.testing.assert_allclose(results[j].dists, want_d[j],
                                   rtol=1e-5, atol=1e-5)
    assert stats["served"] == nq
    # coalescing happened: fewer dispatches than requests
    assert stats["dispatches"] < nq
    assert stats["avg_batch"] > 1.0


def test_serving_mixed_k_and_close_drains(served):
    world, corpus, arena, searcher = served
    rng = np.random.default_rng(1)
    q = rng.standard_normal((8, corpus.dim)).astype(np.float32)
    uids = rng.integers(0, world.num_users, 8)

    srv = BatchingServer(searcher, world.user_masks, max_batch=8,
                         max_wait_ms=50.0)
    tickets = [srv.submit(q[j], uids[j], 3 if j % 2 else 7)
               for j in range(8)]
    srv.close()  # must serve everything queued before stopping
    for j, t in enumerate(tickets):
        r = t.result(timeout=1)
        k = 3 if j % 2 else 7
        assert r.row_ids.shape == (k,)
        # permission check: every returned row readable by the user
        bits = np.asarray(arena.role_bits)
        for rid in r.row_ids:
            if rid >= 0:
                assert (bits[rid] & world.user_masks[uids[j]]).any()
    with pytest.raises(RuntimeError):
        srv.submit(q[0], int(uids[0]), 3)


def test_serving_over_sharded_searcher(small_world, small_corpus):
    """The front-end is searcher-agnostic: it composes with the multi-chip
    engines (here the 8-virtual-device sharded global searcher)."""
    from vectorsearch_rbac_tpu.parallel.searcher import ShardedGlobalSearcher

    s = ShardedGlobalSearcher(small_corpus, small_world, n_devices=8,
                              n_replicas=2, block_rows=64, mode="exact")
    rng = np.random.default_rng(4)
    nq = 24
    q = rng.standard_normal((nq, small_corpus.dim)).astype(np.float32)
    uids = rng.integers(0, small_world.num_users, nq)
    want_d, want_i = s.search_batch(q, uids, small_world.user_masks, k=6)

    with BatchingServer(s, small_world.user_masks, max_batch=8,
                        max_wait_ms=10.0) as srv:
        tickets = [srv.submit(q[j], uids[j], 6) for j in range(nq)]
        for j, t in enumerate(tickets):
            r = t.result(timeout=120)
            np.testing.assert_array_equal(r.row_ids, want_i[j])
        stats = srv.stats()
    assert stats["served"] == nq and stats["avg_batch"] > 1.0
