import numpy as np
import pytest

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.partition import build_searcher
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig


@pytest.fixture(scope="module")
def setup(small_world, small_corpus):
    cfg = FrameworkConfig()
    cfg.search.block_rows = 128
    cfg.search.batch_size = 16
    arena = build_device_arena(small_corpus, small_world, block_rows=cfg.search.block_rows)
    return small_corpus, small_world, arena, cfg


def _oracle_ids(corpus, world, q, user, k):
    docs = world.user_docs(user)
    rows = corpus.rows_for_docs(np.fromiter(docs, dtype=np.int64, count=len(docs)))
    d = ((corpus.vectors[rows] - q) ** 2).sum(axis=1)
    return set(rows[np.argsort(d, kind="stable")[:k]].tolist())


@pytest.mark.parametrize("strategy", ["rls", "role", "user"])
def test_strategies_exact_recall(setup, strategy):
    corpus, world, arena, cfg = setup
    searcher = build_searcher(strategy, corpus, world, arena, cfg)
    rng = np.random.default_rng(1)
    q = rng.standard_normal((12, corpus.dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, 12)
    d, ids = searcher.search_batch(q, users, world.user_masks, k=10)
    for qi in range(12):
        want = _oracle_ids(corpus, world, q[qi], int(users[qi]), 10)
        got = set(int(x) for x in ids[qi] if x >= 0)
        assert got == want, f"{strategy} query {qi} mismatch"
    # distances ascending
    for row in d:
        vals = row[~np.isinf(row)]
        assert np.all(np.diff(vals) >= -1e-6)


def test_role_strategy_storage_exceeds_arena(setup):
    """Per-role physical partitions duplicate docs shared through inheritance."""
    corpus, world, arena, cfg = setup
    searcher = build_searcher("role", corpus, world, arena, cfg)
    rep = searcher.storage_report()
    assert rep["num_partitions"] == world.num_roles
    assert rep["partition_vectors_mb"] > 0


def test_rls_strategy_no_extra_storage(setup):
    corpus, world, arena, cfg = setup
    searcher = build_searcher("rls", corpus, world, arena, cfg)
    rep = searcher.storage_report()
    assert rep["partition_vectors_mb"] == 0
    assert rep["num_partitions"] == 1


def test_comb_routing_single_partition(setup):
    corpus, world, arena, cfg = setup
    searcher = build_searcher("user", corpus, world, arena, cfg)
    for uid in range(0, world.num_users, 17):
        pids = searcher.router(uid)
        assert len(pids) == 1
