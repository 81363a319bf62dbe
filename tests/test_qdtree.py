import numpy as np
import pytest

from vectorsearch_rbac_tpu.bench import generate_query_workload
from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.partition import build_searcher
from vectorsearch_rbac_tpu.partition.qdtree import (
    QDTree,
    build_qd_tree,
    validate_qdtree_partitions,
)
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig


@pytest.fixture(scope="module")
def qd_setup(small_world, small_corpus):
    cfg = FrameworkConfig()
    cfg.search.block_rows = 128
    cfg.search.batch_size = 16
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    wl = generate_query_workload(small_corpus, small_world, num_queries=20,
                                 topk=5, seed=8)
    searcher = build_searcher("qdtree", small_corpus, small_world, arena, cfg,
                              workload=wl, min_leaf=16, max_depth=6)
    return small_world, small_corpus, arena, cfg, searcher


def test_qdtree_leaves_partition_docs(qd_setup):
    world, corpus, arena, cfg, searcher = qd_setup
    validate_qdtree_partitions(searcher.tree, world)
    assert len(searcher.tree.leaf_docs) > 1


def test_qdtree_exact_recall_without_pruning(qd_setup):
    """Role-reachability routing + exact leaf scans -> perfect recall."""
    world, corpus, arena, cfg, searcher = qd_setup
    rng = np.random.default_rng(5)
    q = rng.standard_normal((10, corpus.dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, 10)
    d, ids = searcher.search_batch(q, users, world.user_masks, k=8)
    for qi in range(10):
        docs = world.user_docs(int(users[qi]))
        rows = corpus.rows_for_docs(np.fromiter(docs, dtype=np.int64, count=len(docs)))
        dd = ((corpus.vectors[rows] - q[qi]) ** 2).sum(axis=1)
        want = set(rows[np.argsort(dd, kind="stable")[:8]].tolist())
        got = set(int(x) for x in ids[qi] if x >= 0)
        assert got == want


def test_qdtree_save_load(tmp_path, qd_setup):
    world, corpus, arena, cfg, searcher = qd_setup
    p = str(tmp_path / "tree.pkl")
    searcher.tree.save(p)
    tree2 = QDTree.load(p)
    assert len(tree2.leaf_docs) == len(searcher.tree.leaf_docs)
    # rebuilding a searcher from the loaded tree works
    s2 = build_searcher("qdtree", corpus, world, arena, cfg, tree=tree2)
    assert len(s2.partitions) == len(searcher.partitions)


def test_qdtree_centroid_pruning_reduces_leaves(qd_setup):
    world, corpus, arena, cfg, searcher = qd_setup
    rng = np.random.default_rng(6)
    q = rng.standard_normal(corpus.dim).astype(np.float32)
    uid = 3
    full = searcher.vector_router(uid, None)
    # with pruning enabled the visited set can only shrink
    searcher_pruned = build_searcher("qdtree", corpus, world, arena, cfg,
                                     tree=searcher.tree, prune_by_centroid=True)
    pruned = searcher_pruned.vector_router(uid, q)
    assert set(pruned) <= set(full)


def test_qdtree_debug_tooling(small_world, small_corpus):
    """dot export / structure dump / per-query trace / role listing
    (reference controller/baseline/HQI/debug/ analogs)."""
    import numpy as np

    from vectorsearch_rbac_tpu.partition.qdtree import build_qd_tree
    from vectorsearch_rbac_tpu.partition.qdtree_debug import (
        dump_structure, export_dot, list_role_partitions, trace_query)

    docsets = [small_world.comb_docs(c) for c in small_world.combs[:16]]
    tree = build_qd_tree(small_corpus, small_world, docsets,
                         min_leaf=16, max_depth=5, seed=0)

    dot = export_dot(tree)
    assert dot.startswith("digraph qdtree {") and dot.endswith("}")
    assert dot.count("leaf") >= len(tree.leaf_docs)

    txt = dump_structure(tree)
    assert txt.count("leaf") == len(tree.leaf_docs)

    q = np.zeros(small_corpus.dim, dtype=np.float32)
    tr = trace_query(tree, small_world, user_id=0, qvec=q)
    assert tr["visited_leaves"], "user 0 must reach at least one leaf"
    # every visited leaf holds at least one accessible doc
    acc = set(small_world.user_docs(0))
    for lid in tr["visited_leaves"]:
        assert tree.leaf_docs[lid] & acc

    rp = list_role_partitions(tree, small_world)
    assert set(rp) == set(small_world.role_to_docs)
    for r, leaves in rp.items():
        union = set()
        for lid in leaves:
            union |= tree.leaf_docs[lid]
        assert set(small_world.role_to_docs[r]) <= union


def test_batch_router_matches_route(qd_setup):
    """The vectorized batch router must make IDENTICAL decisions to the
    per-query tree walk (route()): same leaves per (user, query vector),
    including the prune-margin both-sides rule and doc reachability."""
    world, corpus, arena, cfg, searcher = qd_setup
    rng = np.random.default_rng(11)
    q = rng.standard_normal((40, corpus.dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, 40)
    got = searcher.batch_router(q, users)
    for qi in range(40):
        want = set(searcher.vector_router(int(users[qi]), q[qi]))
        assert set(got[qi]) == want, (qi, sorted(got[qi]), sorted(want))
