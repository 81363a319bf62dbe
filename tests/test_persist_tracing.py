import numpy as np
import pytest

from vectorsearch_rbac_tpu import native
from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.index.hnsw import HNSWIndex
from vectorsearch_rbac_tpu.models.cost import CostModelParams
from vectorsearch_rbac_tpu.utils.persist import (
    load_npz, load_params, load_pickle, save_npz, save_params, save_pickle,
)
from vectorsearch_rbac_tpu.utils.tracing import StageTimer


def test_pickle_roundtrip(tmp_path, small_world):
    p = str(tmp_path / "w.pkl")
    save_pickle(small_world, p)
    w2 = load_pickle(p)
    assert w2.user_to_roles == small_world.user_to_roles


def test_npz_roundtrip(tmp_path):
    p = str(tmp_path / "s.npz")
    save_npz({"a": np.arange(5), "b": np.eye(2)}, p, kind="test", m=8)
    state, meta = load_npz(p)
    np.testing.assert_array_equal(state["a"], np.arange(5))
    assert meta == {"kind": "test", "m": 8}


def test_params_roundtrip(tmp_path):
    p = str(tmp_path / "params.json")
    save_params(CostModelParams(k=0.9, beta=0.5, a=2.0, b=3.0, join_time=1.0), p)
    got = load_params(p)
    assert got.k == 0.9 and got.beta == 0.5 and got.join_time == 1.0


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_hnsw_graph_persist(tmp_path, small_world, small_corpus):
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    idx = HNSWIndex(arena, m=8, ef_search=48, query_batch=16,
                    builder="classic", seed=0)
    p = str(tmp_path / "graph.npz")
    save_npz(idx.graph_state(), p, m=8)
    state, meta = load_npz(p)
    idx2 = HNSWIndex(arena, m=meta["m"], ef_search=48, query_batch=16,
                     graph_state=state)
    assert idx2.entry == idx.entry
    q = np.random.default_rng(0).standard_normal((4, small_corpus.dim)).astype(np.float32)
    masks = np.full((4, small_world.words), 0xFFFFFFFF, dtype=np.uint32)
    d1, i1 = idx.search(q, masks, k=5)
    d2, i2 = idx2.search(q, masks, k=5)
    np.testing.assert_array_equal(i1, i2)


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2 and rep["b"]["count"] == 1
    assert rep["a"]["total_s"] >= 0
    t.reset()
    assert t.report() == {}


def test_engine_reports_stages(small_world, small_corpus):
    from vectorsearch_rbac_tpu.partition import build_searcher
    from vectorsearch_rbac_tpu.utils.config import FrameworkConfig

    cfg = FrameworkConfig()
    cfg.search.block_rows = 128
    cfg.search.batch_size = 16
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    s = build_searcher("role", small_corpus, small_world, arena, cfg)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((8, small_corpus.dim)).astype(np.float32)
    users = rng.integers(0, small_world.num_users, 8)
    s.search_batch(q, users, small_world.user_masks, k=5)
    rep = s.timer.report()
    assert {"route", "device_scan", "merge"} <= set(rep)
