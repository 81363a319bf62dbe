import numpy as np
import pytest

from vectorsearch_rbac_tpu.parallel.searcher import ShardedGlobalSearcher


def test_sharded_global_searcher(small_world, small_corpus):
    s = ShardedGlobalSearcher(
        small_corpus, small_world, n_devices=8, n_replicas=2,
        block_rows=64, mode="exact",
    )
    rng = np.random.default_rng(2)
    q = rng.standard_normal((10, small_corpus.dim)).astype(np.float32)
    users = rng.integers(0, small_world.num_users, 10)
    d, ids = s.search_batch(q, users, small_world.user_masks, k=8)
    assert d.shape == (10, 8)
    for qi in range(10):
        docs = small_world.user_docs(int(users[qi]))
        rows = small_corpus.rows_for_docs(
            np.fromiter(docs, dtype=np.int64, count=len(docs)))
        dd = ((small_corpus.vectors[rows] - q[qi]) ** 2).sum(axis=1)
        want = set(rows[np.argsort(dd, kind="stable")[:8]].tolist())
        got = set(int(x) for x in ids[qi] if x >= 0)
        assert len(want - got) <= 1  # near-tie tolerance
    rep = s.storage_report()
    assert rep["num_partitions"] == 4  # 8 devices / 2 replicas
