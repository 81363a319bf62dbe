import numpy as np
import pytest

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.index.hnsw import HNSWIndex
from vectorsearch_rbac_tpu import native


@pytest.fixture(scope="module")
def hnsw_setup(small_world, small_corpus):
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    idx = HNSWIndex(arena, rows=None, m=8, ef_construction=48, ef_search=64,
                    query_batch=16, builder="classic", seed=0)
    return small_world, small_corpus, arena, idx


def _recall_against_oracle(idx, world, corpus, arena, k, ef, n_q=16, seed=4):
    rng = np.random.default_rng(seed)
    pick = rng.integers(0, corpus.n, n_q)
    q = corpus.vectors[pick] + 0.01 * rng.standard_normal((n_q, corpus.dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, n_q)
    masks = world.user_masks[users]
    d, ids = idx.search(q, masks, k=k, ef_search=ef)
    bits = np.asarray(arena.role_bits)
    hits = total = 0
    for qi in range(n_q):
        for rid in ids[qi]:
            if rid >= 0:
                assert (bits[rid] & masks[qi]).any(), "permission violation"
        allowed = (bits[: corpus.n] & masks[qi]).any(axis=1)
        dd = ((corpus.vectors - q[qi]) ** 2).sum(axis=1)
        dd[~allowed] = np.inf
        order = np.argsort(dd, kind="stable")[:k]
        want = set(order[np.isfinite(dd[order])].tolist())
        got = set(int(x) for x in ids[qi] if x >= 0)
        hits += len(want & got)
        total += len(want)
    return hits / max(total, 1)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_hnsw_classic_recall(hnsw_setup):
    world, corpus, arena, idx = hnsw_setup
    recall = _recall_against_oracle(idx, world, corpus, arena, k=10, ef=64)
    assert recall > 0.85, f"classic HNSW recall too low: {recall}"


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_hnsw_ef_monotone(hnsw_setup):
    """Higher ef must not reduce recall materially (the ef knob semantics
    the cost model fits)."""
    world, corpus, arena, idx = hnsw_setup
    r_small = _recall_against_oracle(idx, world, corpus, arena, k=10, ef=16)
    r_big = _recall_against_oracle(idx, world, corpus, arena, k=10, ef=96)
    assert r_big >= r_small - 0.05
    assert r_big > 0.9


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_hnsw_tpu_builder(small_world, small_corpus):
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    idx = HNSWIndex(arena, rows=None, m=8, ef_search=64, query_batch=16,
                    builder="tpu", knn_k=16, seed=0)
    recall = _recall_against_oracle(idx, small_world, small_corpus, arena, k=10, ef=64)
    assert recall > 0.85, f"tpu-built graph recall too low: {recall}"


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_hnsw_subset_rows(small_world, small_corpus):
    """Graph over a row subset returns only those rows (partition use)."""
    rows = np.arange(0, small_corpus.n, 2)
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    idx = HNSWIndex(arena, rows=rows, m=8, ef_search=48, query_batch=16,
                    builder="classic", seed=0)
    rng = np.random.default_rng(1)
    q = rng.standard_normal((4, small_corpus.dim)).astype(np.float32)
    masks = np.full((4, small_world.words), 0xFFFFFFFF, dtype=np.uint32)
    d, ids = idx.search(q, masks, k=5)
    row_set = set(rows.tolist())
    for row in ids.ravel():
        if row >= 0:
            assert int(row) in row_set
