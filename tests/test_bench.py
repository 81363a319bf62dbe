import numpy as np
import pytest

from vectorsearch_rbac_tpu.bench import (
    GroundTruthOracle,
    generate_query_workload,
    run_benchmark,
)
from vectorsearch_rbac_tpu.bench.ground_truth import compute_recall
from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.partition import build_searcher
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig


def test_workload_generation(small_world, small_corpus):
    wl = generate_query_workload(small_corpus, small_world, num_queries=20,
                                 topk=5, zipf_param=0, seed=4)
    assert wl.num_queries == 20
    assert wl.vectors.shape == (20, small_corpus.dim)
    assert np.all((wl.selectivities > 0) & (wl.selectivities <= 1))
    wl2 = generate_query_workload(small_corpus, small_world, num_queries=20,
                                  topk=5, zipf_param=0, seed=4)
    np.testing.assert_array_equal(wl.user_ids, wl2.user_ids)
    np.testing.assert_array_equal(wl.vectors, wl2.vectors)


def test_workload_repetitions(small_world, small_corpus):
    wl = generate_query_workload(small_corpus, small_world, num_queries=5,
                                 topk=5, repetitions=3, seed=1)
    assert wl.num_queries == 15
    np.testing.assert_array_equal(wl.repetitions[:3], [0, 1, 2])
    np.testing.assert_array_equal(wl.vectors[0], wl.vectors[1])


def test_workload_json_roundtrip(tmp_path, small_world, small_corpus):
    wl = generate_query_workload(small_corpus, small_world, num_queries=8, topk=5, seed=2)
    p = tmp_path / "query_dataset.json"
    wl.save_json(str(p))
    wl2 = wl.load_json(str(p))
    np.testing.assert_allclose(wl.vectors, wl2.vectors, rtol=1e-6)
    np.testing.assert_array_equal(wl.user_ids, wl2.user_ids)


def test_compute_recall():
    got = np.array([[1, 2, 3], [4, 5, -1]])
    want = np.array([[1, 2, 9], [4, 5, 6]])
    assert compute_recall(got, want) == pytest.approx((2 / 3 + 2 / 3) / 2)


def test_ground_truth_cache(tmp_path, small_world, small_corpus):
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    oracle = GroundTruthOracle(arena, cache_dir=str(tmp_path), block_rows=128,
                               query_batch=16)
    wl = generate_query_workload(small_corpus, small_world, num_queries=6, topk=5, seed=3)
    t1 = oracle.compute(small_corpus, small_world, wl, 5)
    files = list(tmp_path.glob("gt_*.npy"))
    assert len(files) == 1
    t2 = oracle.compute(small_corpus, small_world, wl, 5)
    np.testing.assert_array_equal(t1, t2)


def test_run_benchmark_end_to_end(tmp_path, small_world, small_corpus):
    cfg = FrameworkConfig()
    cfg.search.block_rows = 128
    cfg.search.batch_size = 16
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    oracle = GroundTruthOracle(arena, cache_dir=str(tmp_path), block_rows=128, query_batch=16)
    wl = generate_query_workload(small_corpus, small_world, num_queries=12, topk=5, seed=5)
    searcher = build_searcher("role", small_corpus, small_world, arena, cfg)
    res = run_benchmark(searcher, small_corpus, small_world, wl, oracle,
                        warmup_runs=1, timed_batches=3)
    assert res.avg_recall == 1.0  # exact index -> perfect recall
    assert res.qps > 0
    assert res.storage["num_partitions"] == small_world.num_roles
    assert "avg_recall" in res.to_json()


def test_per_query_dump(tmp_path, small_world, small_corpus):
    cfg = FrameworkConfig()
    cfg.search.block_rows = 128
    cfg.search.batch_size = 16
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    oracle = GroundTruthOracle(arena, cache_dir=str(tmp_path), block_rows=128,
                               query_batch=16)
    wl = generate_query_workload(small_corpus, small_world, num_queries=6,
                                 topk=5, seed=6)
    searcher = build_searcher("rls", small_corpus, small_world, arena, cfg)
    import json as _json
    p = str(tmp_path / "per_query.json")
    run_benchmark(searcher, small_corpus, small_world, wl, oracle,
                  warmup_runs=0, timed_batches=2, per_query_path=p)
    with open(p) as f:
        recs = _json.load(f)
    assert len(recs) == 6
    assert all(0 <= r["recall"] <= 1 for r in recs)
    assert all("result_rows" in r for r in recs)


def test_per_role_workload(small_world, small_corpus):
    """Role-targeted query workload: every target role contributes queries
    issued by a user actually holding that role (reference
    generate_query_dataset_for_roles, read_dataset_function.py:821)."""
    from vectorsearch_rbac_tpu.bench import generate_query_workload_for_roles

    wl = generate_query_workload_for_roles(
        small_corpus, small_world, queries_per_role=3, topk=5, seed=1)
    assert wl.num_queries == 3 * small_world.num_roles
    # each chunk of 3 queries belongs to users holding the same role
    role_ids = sorted(small_world.role_to_docs.keys())
    for j, r in enumerate(role_ids):
        for qi in range(3 * j, 3 * j + 3):
            u = int(wl.user_ids[qi])
            assert r in small_world.user_to_roles[u]


def test_per_role_workload_repetitions(small_world, small_corpus):
    from vectorsearch_rbac_tpu.bench import generate_query_workload_for_roles

    wl = generate_query_workload_for_roles(
        small_corpus, small_world, queries_per_role=2, topk=5,
        repetitions=3, seed=2)
    assert wl.num_queries == 2 * small_world.num_roles * 3
    assert wl.repetitions.max() == 2
    # repeated queries share vectors
    assert np.allclose(wl.vectors[0], wl.vectors[1])


# ---- adaptive stream sampling (weather protocol, no device needed) ----

COLLAPSED = [17.4, 0.3, 0.3, 0.3, 0.3, 9.9, 0.3, 1.5]   # 2026-08-19 capture
CLEAN = [1.0, 0.9, 1.0, 1.1, 1.0, 0.9, 1.0, 1.1]


def _sampler(script):
    """Drive adaptive_stream_sampling over scripted per-stream walls."""
    from vectorsearch_rbac_tpu.bench.harness import adaptive_stream_sampling

    it = iter(script)
    sleeps = []
    t = [0.0]

    def clock():
        t[0] += 1.0
        return t[0]

    def run_stream():
        return list(next(it)), np.zeros((1, 1), np.int64)

    walls, means, ratios, ids = adaptive_stream_sampling(
        run_stream, sleep=sleeps.append, clock=clock)
    return walls, means, ratios, sleeps


def test_stall_ratio_discriminates():
    from vectorsearch_rbac_tpu.bench.harness import STALL_LIMIT, stall_ratio

    assert stall_ratio(CLEAN) < 1.5            # good-weather stream
    assert stall_ratio(COLLAPSED) > STALL_LIMIT  # collapsed-link stream


def test_sampling_clear_weather_stops_at_four():
    walls, means, ratios, sleeps = _sampler([CLEAN] * 10)
    assert len(means) == 4                     # patience-3 stop, no extension
    assert all(r < 3.0 for r in ratios)
    assert len(walls) == 4 * len(CLEAN)
    assert all(s == 25.0 for s in sleeps)      # normal decorrelation gaps


def test_sampling_extends_through_collapse():
    # four collapsed windows would previously record the collapsed mean;
    # the extension keeps sampling until a clean window lands
    walls, means, ratios, sleeps = _sampler([COLLAPSED] * 4 + [CLEAN] * 8)
    assert len(means) == 5                     # stopped AT the clean stream
    assert ratios[-1] < 3.0
    assert min(means) == pytest.approx(np.mean(CLEAN))
    assert 45.0 in sleeps                      # extension uses wider gaps


def test_sampling_extension_is_bounded():
    # collapse that never clears: stop at the +8-stream extension cap
    walls, means, ratios, sleeps = _sampler([COLLAPSED] * 30)
    assert len(means) == 4 + 8
    assert min(ratios) > 3.0                   # honestly records the collapse


def test_sampling_smoke_single_stream():
    walls, means, ratios, sleeps = _sampler([[0.01] * 8] + [CLEAN] * 5)
    assert len(means) == 1                     # tiny runs: one stream
    assert sleeps == []
