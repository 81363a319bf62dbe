import numpy as np
import pytest

from vectorsearch_rbac_tpu.bench import generate_query_workload
from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.models.cost import CostModelParams
from vectorsearch_rbac_tpu.partition import build_searcher
from vectorsearch_rbac_tpu.partition.dynamic import (
    PlannerInputs,
    build_dynamic_searcher,
    comb_weights_from_workload,
    plan_dynamic_partitions,
    single_role_weights_from_workload,
    split_comb_roles,
    validate_partition_coverage,
)
from vectorsearch_rbac_tpu.rbac.generators import RandomRBACGenerator, TreeRBACGenerator
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig


def _inputs(world, alpha=2.0, weights=None, single=None):
    return PlannerInputs(
        role_to_docs=world.role_to_docs,
        combs=world.combs,
        comb_weights=weights or world.comb_weights,
        single_role_weights=single or {r: 1.0 for r in range(world.num_roles)},
        params=CostModelParams(),
        alpha=alpha,
        topk=10,
    )


@pytest.fixture(scope="module")
def multi_role_world():
    """Random RBAC gives multi-role users (combination mode gets exercised)."""
    return RandomRBACGenerator(num_users=60, num_roles=10, num_docs=120,
                               m_roles=3, m_perms=30, seed=5).generate()


def test_split_respects_storage_budget(small_world):
    inputs = _inputs(small_world, alpha=1.5)
    plan = split_comb_roles(inputs)
    total = sum(len(d) for d in plan.assignment.values())
    # budget may be exceeded by at most the last split's documents
    assert total <= 1.5 * small_world.num_docs + max(
        len(d) for d in plan.assignment.values()
    )
    assert len(plan.assignment) >= 1


def test_split_produces_multiple_partitions(small_world):
    inputs = _inputs(small_world, alpha=2.5)
    plan = split_comb_roles(inputs)
    assert len(plan.assignment) > 1, "expected at least one split at alpha=2.5"


def test_plan_coverage_invariant(small_world):
    inputs = _inputs(small_world, alpha=2.0)
    plan = plan_dynamic_partitions(small_world, inputs)
    validate_partition_coverage(plan, inputs)  # must not raise
    # reindexed pids are contiguous
    assert sorted(plan.assignment.keys()) == list(range(len(plan.assignment)))


def test_plan_coverage_multi_role(multi_role_world):
    inputs = _inputs(multi_role_world, alpha=2.0)
    plan = plan_dynamic_partitions(multi_role_world, inputs)
    validate_partition_coverage(plan, inputs)
    # every comb has at least one partition
    for comb in multi_role_world.combs:
        assert plan.trackers.get(comb), f"comb {comb} lost its partitions"


def test_weights_from_workload(small_world, small_corpus):
    wl = generate_query_workload(small_corpus, small_world, num_queries=30,
                                 topk=5, seed=9)
    cw = comb_weights_from_workload(small_world, wl)
    sw = single_role_weights_from_workload(small_world, wl)
    assert sum(cw.values()) > 0
    assert all(w >= 0 for w in cw.values())
    assert set(sw) == {r for c in small_world.combs for r in c}


def test_dynamic_searcher_end_to_end(small_world, small_corpus):
    cfg = FrameworkConfig()
    cfg.search.block_rows = 128
    cfg.search.batch_size = 16
    cfg.optimizer.storage_alpha = 2.0
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    searcher = build_searcher("dynamic", small_corpus, small_world, arena, cfg)
    assert searcher.name == "dynamic"

    rng = np.random.default_rng(3)
    q = rng.standard_normal((8, small_corpus.dim)).astype(np.float32)
    users = rng.integers(0, small_world.num_users, 8)
    d, ids = searcher.search_batch(q, users, small_world.user_masks, k=10)

    # exact per-user oracle (dynamic partitions + exact index = full recall)
    for qi in range(8):
        uid = int(users[qi])
        docs = small_world.user_docs(uid)
        rows = small_corpus.rows_for_docs(np.fromiter(docs, dtype=np.int64, count=len(docs)))
        dd = ((small_corpus.vectors[rows] - q[qi]) ** 2).sum(axis=1)
        want = set(rows[np.argsort(dd, kind="stable")[:10]].tolist())
        got = set(int(x) for x in ids[qi] if x >= 0)
        assert got == want


def test_dynamic_hnsw_selectivity_scaled_ef(small_world, small_corpus):
    """Graph-indexed dynamic partitions serve iterative rescans with
    selectivity-scaled expansion budgets and per-comb admissible entries
    (the pgvector hnsw.iterative_scan analog)."""
    import vectorsearch_rbac_tpu.native as native
    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    cfg = FrameworkConfig()
    cfg.search.block_rows = 128
    cfg.search.batch_size = 16
    cfg.search.ef_search = 16
    cfg.index.kind = "hnsw"
    cfg.index.hnsw_m = 8
    cfg.optimizer.storage_alpha = 2.0
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    s = build_searcher("dynamic", small_corpus, small_world, arena, cfg)
    assert hasattr(s, "probe_params")
    # scaled ef must be >= base and pow2-bucketed
    uid = 0
    pids = s.router(uid)
    kws = [s.probe_params(uid, pid) for pid in pids]
    assert all(kw["ef_search"] >= 16 and (kw["ef_search"] & (kw["ef_search"] - 1)) == 0
               for kw in kws)
    assert all(kw["iterative"] for kw in kws)
    assert all(kw["max_steps"] >= kw["ef_search"] for kw in kws)
    assert all("entry_local" in kw for kw in kws)  # admissible entry found

    rng = np.random.default_rng(4)
    q = rng.standard_normal((12, small_corpus.dim)).astype(np.float32)
    users = rng.integers(0, small_world.num_users, 12)
    d, ids = s.search_batch(q, users, small_world.user_masks, k=5)
    hits = tot = 0
    for qi in range(12):
        docs = small_world.user_docs(int(users[qi]))
        rows = small_corpus.rows_for_docs(np.fromiter(docs, dtype=np.int64, count=len(docs)))
        dd = ((small_corpus.vectors[rows] - q[qi]) ** 2).sum(axis=1)
        want = set(rows[np.argsort(dd, kind="stable")[:5]].tolist())
        got = set(int(x) for x in ids[qi] if x >= 0)
        hits += len(want & got); tot += 5
    assert hits / tot > 0.7, f"scaled-ef dynamic hnsw recall {hits/tot}"


def test_graph_batcher_parity(small_world, small_corpus):
    """The slab-batched multi-graph dispatch path (partition/graph_batch.py)
    must return the same results as per-(comb,partition) dispatches on the
    same partitions — dispatch batching is an execution detail, not a
    semantic change."""
    from vectorsearch_rbac_tpu.core import build_device_arena
    from vectorsearch_rbac_tpu.partition.dynamic import build_dynamic_searcher

    cfg = FrameworkConfig()
    cfg.index.kind = "hnsw"
    cfg.index.hnsw_m = 8
    cfg.index.hnsw_ef_construction = 48
    cfg.search.ef_search = 32
    cfg.optimizer.storage_alpha = 1.5
    arena = build_device_arena(small_corpus, small_world, block_rows=128,
                               dtype="int8")
    s = build_dynamic_searcher(small_corpus, small_world, arena, cfg,
                               packed=False)
    assert hasattr(s, "graph_batcher")
    n_classes = len(s.graph_batcher.slabs)
    assert n_classes <= 4  # slabs bound dispatch shapes

    rng = np.random.default_rng(6)
    nq, k = 48, 8
    q = rng.standard_normal((nq, small_corpus.dim)).astype(np.float32)
    users = rng.integers(0, small_world.num_users, nq)
    db, ib = s.search_batch(q, users, small_world.user_masks, k)

    batcher = s.graph_batcher
    del s.graph_batcher          # fall back to per-group dispatches
    du, iu = s.search_batch(q, users, small_world.user_masks, k)
    s.graph_batcher = batcher

    bits = small_corpus.vector_role_bits(small_world)
    masks = small_world.user_masks[users]
    agree = 0
    for qi in range(nq):
        got_b = [int(x) for x in ib[qi] if x >= 0]
        got_u = [int(x) for x in iu[qi] if x >= 0]
        for r in got_b:
            assert (bits[r] & masks[qi]).any()
        # identical probe parameters + identical graphs -> identical sets
        assert set(got_b) == set(got_u), (qi, sorted(got_b), sorted(got_u))
        agree += 1
    assert agree == nq


def test_dynamic_mesh_graph_serving(small_world, small_corpus):
    """build_dynamic_searcher(mesh=...) swaps the single-chip slab batcher
    for the partition-per-chip ShardedGraphSearcher; same plan, same probe
    params => identical result sets (the executor is run()-compatible)."""
    from vectorsearch_rbac_tpu.core import build_device_arena
    from vectorsearch_rbac_tpu.parallel import make_mesh
    from vectorsearch_rbac_tpu.parallel.graph_sharded import (
        ShardedGraphSearcher,
    )
    from vectorsearch_rbac_tpu.partition.dynamic import build_dynamic_searcher

    cfg = FrameworkConfig()
    cfg.index.kind = "hnsw"
    cfg.index.hnsw_m = 8
    cfg.index.hnsw_ef_construction = 48
    cfg.search.ef_search = 32
    cfg.optimizer.storage_alpha = 1.5
    arena = build_device_arena(small_corpus, small_world, block_rows=128,
                               dtype="int8")
    s1 = build_dynamic_searcher(small_corpus, small_world, arena, cfg,
                                packed=False)
    mesh = make_mesh(8, n_replicas=1)
    s2 = build_dynamic_searcher(small_corpus, small_world, arena, cfg,
                                plan=s1.plan, packed=False, mesh=mesh)
    assert isinstance(s2.graph_batcher, ShardedGraphSearcher)
    assert s2.graph_batcher.n_devices == 8

    rng = np.random.default_rng(9)
    nq, k = 32, 8
    q = rng.standard_normal((nq, small_corpus.dim)).astype(np.float32)
    users = rng.integers(0, small_world.num_users, nq)
    d1, i1 = s1.search_batch(q, users, small_world.user_masks, k)
    d2, i2 = s2.search_batch(q, users, small_world.user_masks, k)
    for qi in range(nq):
        assert (set(int(x) for x in i1[qi] if x >= 0)
                == set(int(x) for x in i2[qi] if x >= 0)), qi
