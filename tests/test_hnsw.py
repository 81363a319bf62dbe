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


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_tpu_builder_navigable_on_clustered_data():
    """Regression: a pruned kNN graph alone is NOT navigable from a medoid
    entry on clustered data (cluster islands gave recall 0.0 at 30k rows).
    The Vamana construction (random long-range candidates + search-based
    refinement, index/hnsw.py _vamana_refine) must keep the graph navigable:
    unfiltered medoid-entry search must find the true nearest neighbors."""
    from vectorsearch_rbac_tpu.data import sift_like_corpus
    from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator

    corpus, qpool = sift_like_corpus(num_vectors=12_000, blocks_per_doc=100,
                                     dim=32, seed=11)
    world = TreeRBACGenerator(num_users=40, num_roles=12, num_docs=120,
                              h=2, b0=3, b1=4, seed=2).generate()
    arena = build_device_arena(corpus, world, block_rows=1024)
    idx = HNSWIndex(arena, rows=None, m=12, ef_search=64, query_batch=16,
                    builder="tpu", knn_k=24, seed=0)
    rng = np.random.default_rng(3)
    nq = 16
    q = qpool[rng.choice(len(qpool), nq, replace=False)].astype(np.float32)
    allmask = np.full((nq, world.words), 0xFFFFFFFF, dtype=np.uint32)
    d, ids = idx.search(q, allmask, k=10, ef_search=96)
    vec = corpus.vectors
    d2 = np.einsum("nd,nd->n", vec, vec)[None, :] - 2 * q @ vec.T
    truth = np.argsort(d2, axis=1, kind="stable")[:, :10]
    hits = sum(
        len(set(int(x) for x in ids[i] if x >= 0) & set(truth[i].tolist()))
        for i in range(nq))
    recall = hits / (nq * 10)
    assert recall > 0.9, f"tpu-built graph not navigable: recall {recall}"


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_iterative_rescan_low_selectivity():
    """pgvector iterative_scan analog: at ~6% uniform selectivity the
    iterative rescan with 2-hop harvest must recover what the fixed-budget
    traversal misses (ops/graph_search.graph_beam_search_iterative)."""
    import jax.numpy as jnp

    from vectorsearch_rbac_tpu.data import sift_like_corpus
    from vectorsearch_rbac_tpu.ops.graph_search import (
        graph_search_fn, graph_search_iterative_fn)

    corpus, qpool = sift_like_corpus(num_vectors=8192, blocks_per_doc=1,
                                     dim=32, seed=5)
    vec = corpus.vectors.astype(np.float32)
    n = len(vec)
    rng = np.random.default_rng(9)
    adm = rng.random(n) < 0.06
    bits = np.zeros((n, 1), dtype=np.uint32)
    bits[adm, 0] = 1
    nbr, levels, entry, _ = native.hnsw_build(vec, m=16, ef_construction=64,
                                              seed=0)
    nq, k = 32, 10
    q = qpool[rng.choice(len(qpool), nq, replace=False)].astype(np.float32)
    masks = np.ones((nq, 1), dtype=np.uint32)
    norms = np.einsum("nd,nd->n", vec, vec).astype(np.float32)
    d2 = norms[None, :] - 2 * q @ vec.T
    d2[:, ~adm] = np.inf
    truth = np.argsort(d2, axis=1, kind="stable")[:, :k]

    args = (jnp.asarray(q), jnp.asarray(vec), jnp.asarray(norms),
            jnp.asarray(bits), jnp.asarray(nbr), jnp.asarray(masks))
    ents = jnp.full((nq,), int(entry), dtype=jnp.int32)

    def recall(ids):
        ids = np.asarray(ids)
        return sum(
            len(set(ids[i][ids[i] >= 0].tolist()) & set(truth[i].tolist()))
            for i in range(nq)) / (nq * k)

    _, i_fixed = graph_search_fn(*args, int(entry), k, 40)
    _, i_iter = graph_search_iterative_fn(*args, ents, k, 64, 1024, True)
    r_fixed, r_iter = recall(i_fixed), recall(i_iter)
    assert r_iter > 0.9, f"iterative rescan recall {r_iter}"
    assert r_iter >= r_fixed, (r_iter, r_fixed)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_online_insert_rows(small_world, small_corpus):
    """pgvector hnswinsert analog: rows inserted into a live graph become
    searchable at the same recall as built-in rows."""
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    half = small_corpus.n // 2
    idx = HNSWIndex(arena, rows=np.arange(half, dtype=np.int64), m=8,
                    ef_search=64, query_batch=16, builder="classic", seed=0)
    new_rows = np.arange(half, small_corpus.n, dtype=np.int64)
    idx.insert_rows(arena, new_rows)
    assert idx.n_rows == small_corpus.n

    rng = np.random.default_rng(5)
    nq = 12
    pick = rng.integers(half, small_corpus.n, nq)  # query near INSERTED rows
    q = small_corpus.vectors[pick] + 0.01 * rng.standard_normal(
        (nq, small_corpus.dim)).astype(np.float32)
    allmask = np.full((nq, small_world.words), 0xFFFFFFFF, dtype=np.uint32)
    d, ids = idx.search(q, allmask, k=5, ef_search=96)
    vec = small_corpus.vectors
    d2 = np.einsum("nd,nd->n", vec, vec)[None, :] - 2 * q @ vec.T
    truth = np.argsort(d2, axis=1, kind="stable")[:, :5]
    hits = sum(
        len(set(int(x) for x in ids[i] if x >= 0) & set(truth[i].tolist()))
        for i in range(nq))
    recall = hits / (nq * 5)
    assert recall > 0.8, f"post-insert recall {recall}"
    # inserted rows must be reachable: the nearest row to an inserted
    # vector is itself
    assert any(int(x) >= half for row in ids for x in row)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_sampled_entry_search(small_world, small_corpus):
    """Sampled per-query entries (the hierarchy-descent replacement) must
    not lose recall vs the medoid entry."""
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    idx = HNSWIndex(arena, rows=None, m=8, ef_search=48, query_batch=16,
                    builder="classic", seed=0)
    rng = np.random.default_rng(7)
    nq = 12
    q = (small_corpus.vectors[rng.integers(0, small_corpus.n, nq)]
         + 0.01 * rng.standard_normal((nq, small_corpus.dim)).astype(np.float32))
    allmask = np.full((nq, small_world.words), 0xFFFFFFFF, dtype=np.uint32)
    d1, i1 = idx.search(q, allmask, k=5, ef_search=48)
    d2, i2 = idx.search(q, allmask, k=5, ef_search=48, sampled_entry=True)
    vec = small_corpus.vectors
    dd = np.einsum("nd,nd->n", vec, vec)[None, :] - 2 * q @ vec.T
    truth = np.argsort(dd, axis=1, kind="stable")[:, :5]

    def rec(ids):
        return sum(len(set(int(x) for x in ids[i] if x >= 0)
                       & set(truth[i].tolist())) for i in range(nq)) / (nq * 5)

    assert rec(i2) >= rec(i1) - 0.05, (rec(i2), rec(i1))
    assert rec(i2) > 0.8


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_acorn_dense_build_contract():
    """ACORN-gamma build-side densification (native.hnsw_build_acorn,
    reference acorn_benchmark/src/index_creation.cpp:105): layer-0 lists
    carry a navigable heuristic core plus nearest pruned fill. Asserted
    contract: requested density, unfiltered navigability preserved, and
    filtered (2-hop harvest) recall in the same band as the classic build.

    Measured A/B (PERF.md): on clustered SIFT at 8% selectivity the
    2-hop-harvest search over the CLASSIC graph already dominates
    (0.897 vs 0.841 recall@10) — the harvest supplies admissible coverage
    without paying dense-list beam dilution, so the classic builder stays
    the default and the dense builder remains available via
    cfg.index.hnsw_m_beta for admissible-only traversal regimes."""
    import jax.numpy as jnp

    from vectorsearch_rbac_tpu.data import sift_like_corpus
    from vectorsearch_rbac_tpu.ops.graph_search import (
        graph_search_fn, graph_search_filtered_fn)

    corpus, qpool = sift_like_corpus(num_vectors=8192, blocks_per_doc=1,
                                     dim=32, seed=5)
    vec = corpus.vectors.astype(np.float32)
    n = len(vec)
    rng = np.random.default_rng(11)
    adm = rng.random(n) < 0.08
    bits = np.zeros((n, 1), dtype=np.uint32)
    bits[adm, 0] = 1

    nbr_c, _, ent_c, _ = native.hnsw_build(vec, m=8, ef_construction=48,
                                           seed=0)
    nbr_a, _, ent_a, _ = native.hnsw_build_acorn(vec, m=8, m_beta=48,
                                                 ef_construction=48, seed=0)
    assert nbr_a.shape[1] == 48
    # dense graph really is denser
    assert (nbr_a >= 0).sum() > 1.5 * (nbr_c >= 0).sum()

    nq, k = 32, 10
    q = qpool[rng.choice(len(qpool), nq, replace=False)].astype(np.float32)
    masks = np.ones((nq, 1), dtype=np.uint32)
    norms = np.einsum("nd,nd->n", vec, vec).astype(np.float32)
    d2 = norms[None, :] - 2 * q @ vec.T
    d2[:, ~adm] = np.inf
    truth = np.argsort(d2, axis=1, kind="stable")[:, :k]

    def recall(fn, nbr, ent):
        _, ids = fn(
            jnp.asarray(q), jnp.asarray(vec), jnp.asarray(norms),
            jnp.asarray(bits), jnp.asarray(nbr), jnp.asarray(masks),
            int(ent), k, 48)
        ids = np.asarray(ids)
        return sum(
            len(set(ids[i][ids[i] >= 0].tolist()) & set(truth[i].tolist()))
            for i in range(nq)) / (nq * k)

    r_c2 = recall(graph_search_filtered_fn, nbr_c, ent_c)
    r_a2 = recall(graph_search_filtered_fn, nbr_a, ent_a)
    assert r_a2 > 0.75 and r_c2 > 0.75, (r_a2, r_c2)
    assert abs(r_a2 - r_c2) < 0.15, (r_a2, r_c2)
    # unfiltered navigability preserved on the dense graph (top-1 found)
    ones = np.ones((n, 1), dtype=np.uint32)
    _, ids_all = graph_search_fn(
        jnp.asarray(q), jnp.asarray(vec), jnp.asarray(norms),
        jnp.asarray(ones), jnp.asarray(nbr_a), jnp.asarray(masks),
        int(ent_a), k, 48)
    d_all = norms[None, :] - 2 * q @ vec.T
    t1 = np.argmin(d_all, axis=1)
    hit = np.mean([t1[i] in set(np.asarray(ids_all)[i].tolist())
                   for i in range(nq)])
    assert hit >= 0.85, hit


def test_refine_rows_after_bulk_insert(small_world, small_corpus):
    """refine_rows (the insert-path Vamana refinement): re-pruning inserted
    rows against the FINAL graph never loses recall and keeps the graph
    well-formed (no self-edges, degrees within M0, permissions intact)."""
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    half = small_corpus.n // 2
    idx = HNSWIndex(arena, rows=np.arange(half, dtype=np.int64), m=8,
                    ef_search=64, query_batch=16, builder="classic", seed=0)
    new_rows = np.arange(half, small_corpus.n, dtype=np.int64)
    idx.insert_rows(arena, new_rows)

    rng = np.random.default_rng(9)
    nq = 16
    pick = rng.integers(half, small_corpus.n, nq)
    q = small_corpus.vectors[pick] + 0.01 * rng.standard_normal(
        (nq, small_corpus.dim)).astype(np.float32)
    allmask = np.full((nq, small_world.words), 0xFFFFFFFF, dtype=np.uint32)
    vec = small_corpus.vectors
    d2 = np.einsum("nd,nd->n", vec, vec)[None, :] - 2 * q @ vec.T
    truth = np.argsort(d2, axis=1, kind="stable")[:, :5]

    def recall():
        _, ids = idx.search(q, allmask, k=5, ef_search=96)
        hits = sum(
            len(set(int(x) for x in ids[i] if x >= 0) & set(truth[i].tolist()))
            for i in range(nq))
        return hits / (nq * 5)

    before = recall()
    idx.refine_rows(arena, new_rows)
    after = recall()
    assert after >= before - 0.05, (before, after)

    # graph invariants: no self edges, no out-of-range ids, host mirror
    # matches the device graph
    g = np.asarray(idx._graph)
    np.testing.assert_array_equal(g, idx._hgraph)
    for nid in range(idx.n_rows):
        row = g[nid]
        assert nid not in row[row >= 0]
        assert (row < idx.n_rows).all()


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_insert_update_parity(small_world, small_corpus, monkeypatch):
    """vsr_insert_update (C++ edge loop) vs the numpy fallback: same
    semantics — equal recall band, identical invariants — on the same
    insert workload."""
    def build_and_insert(force_python):
        arena = build_device_arena(small_corpus, small_world, block_rows=128)
        half = small_corpus.n // 2
        idx = HNSWIndex(arena, rows=np.arange(half, dtype=np.int64), m=8,
                        ef_search=64, query_batch=16, builder="classic",
                        seed=0)
        if force_python:
            monkeypatch.setattr(
                "vectorsearch_rbac_tpu.native.available", lambda: False)
        else:
            monkeypatch.setattr(
                "vectorsearch_rbac_tpu.native.available", native.available)
        new = np.arange(half, small_corpus.n, dtype=np.int64)
        idx.insert_rows(arena, new)
        idx.refine_rows(arena, new)
        return idx

    rng = np.random.default_rng(11)
    nq = 16
    half = small_corpus.n // 2
    pick = rng.integers(half, small_corpus.n, nq)
    q = small_corpus.vectors[pick] + 0.01 * rng.standard_normal(
        (nq, small_corpus.dim)).astype(np.float32)
    allmask = np.full((nq, small_world.words), 0xFFFFFFFF, dtype=np.uint32)
    vec = small_corpus.vectors
    d2 = np.einsum("nd,nd->n", vec, vec)[None, :] - 2 * q @ vec.T
    truth = np.argsort(d2, axis=1, kind="stable")[:, :5]

    recalls = []
    for force_python in (False, True):
        idx = build_and_insert(force_python)
        g = np.asarray(idx._graph)
        np.testing.assert_array_equal(g, idx._hgraph)
        for nid in range(idx.n_rows):
            row = g[nid]
            assert nid not in row[row >= 0]
            assert (row < idx.n_rows).all()
        _, ids = idx.search(q, allmask, k=5, ef_search=96)
        hits = sum(
            len(set(int(x) for x in ids[i] if x >= 0)
                & set(truth[i].tolist())) for i in range(nq))
        recalls.append(hits / (nq * 5))
    native_r, python_r = recalls
    assert abs(native_r - python_r) <= 0.1, recalls
    assert native_r > 0.8, recalls


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_hnsw_packed_row_parity(small_world):
    """Round-5 packed-row gather (ops/graph_search packed_rows): on a
    LOSSLESS int8 arena the packed iterative search must match the
    legacy three-gather path — same admissibility, same oracle recall
    band, and finalized distances equal to true squared-L2."""
    from vectorsearch_rbac_tpu.data import sift_like_corpus

    corpus, qpool = sift_like_corpus(num_vectors=800, blocks_per_doc=4,
                                     seed=5)
    arena = build_device_arena(corpus, small_world, block_rows=128,
                               dtype="int8")
    assert arena.quant is not None and arena.quant.lossless

    idx_p = HNSWIndex(arena, rows=None, m=8, ef_construction=48,
                      ef_search=64, query_batch=16, builder="classic",
                      seed=0)
    assert idx_p.use_packed, "auto packed mode should be on (lossless int8)"
    idx_l = HNSWIndex(arena, rows=None, m=8, ef_construction=48,
                      ef_search=64, query_batch=16, builder="classic",
                      seed=0, use_packed=False)

    rng = np.random.default_rng(9)
    nq = 16
    q = qpool[rng.integers(0, len(qpool), nq)].astype(np.float32)
    users = rng.integers(0, small_world.num_users, nq)
    masks = small_world.user_masks[users]
    dp, ip_ = idx_p.search(q, masks, k=8, ef_search=48, sampled_entry=True)
    dl, il = idx_l.search(q, masks, k=8, ef_search=48, sampled_entry=True)
    assert idx_p._packed is not None

    bits = np.asarray(arena.role_bits)
    overlap = hits_p = hits_l = total = 0
    for qi in range(nq):
        got_p = set(int(x) for x in ip_[qi] if x >= 0)
        got_l = set(int(x) for x in il[qi] if x >= 0)
        for rid in got_p:
            assert (bits[rid] & masks[qi]).any(), "permission violation"
        # packed distances are true squared-L2 of the dequant (= exact) rows
        for rank, rid in enumerate(ip_[qi]):
            if rid >= 0:
                true = float(((corpus.vectors[rid] - q[qi]) ** 2).sum())
                assert abs(dp[qi][rank] - true) <= 1e-2 + 1e-4 * true
        allowed = (bits[: corpus.n] & masks[qi]).any(axis=1)
        dd = ((corpus.vectors - q[qi]) ** 2).sum(axis=1)
        dd[~allowed] = np.inf
        order = np.argsort(dd, kind="stable")[:8]
        want = set(order[np.isfinite(dd[order])].tolist())
        hits_p += len(want & got_p)
        hits_l += len(want & got_l)
        total += len(want)
        overlap += len(got_p & got_l) / max(len(got_p | got_l), 1)
    # same engine semantics: recall parity and heavy result overlap
    assert abs(hits_p - hits_l) / max(total, 1) <= 0.1, (hits_p, hits_l)
    assert hits_p / max(total, 1) > 0.75, hits_p / max(total, 1)
    assert overlap / nq > 0.8, overlap / nq
