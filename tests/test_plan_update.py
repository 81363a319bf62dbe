import numpy as np
import pytest

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.models.cost import CostModelParams
from vectorsearch_rbac_tpu.partition import build_searcher
from vectorsearch_rbac_tpu.partition.dynamic import (
    PlannerInputs, apply_plan_update, delete_role, insert_role,
)
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig


def test_insert_role_end_to_end(small_world, small_corpus):
    """Plan -> insert a new role -> incremental rebuild -> search correctly
    for a user holding the new role (the reference's online insertion flow,
    insertion.py:166 + update_database_for_new_role)."""
    cfg = FrameworkConfig()
    cfg.search.block_rows = 128
    cfg.search.batch_size = 16
    cfg.optimizer.storage_alpha = 2.0
    world = small_world
    arena = build_device_arena(small_corpus, world, block_rows=128)
    searcher = build_searcher("dynamic", small_corpus, world, arena, cfg)
    n_before = len(searcher.partitions)

    # new role over a fresh doc slice; grant it to user 0
    new_docs = set(range(0, 40))
    world2, new_role = world.with_new_role(new_docs, users=[0])
    inputs2 = PlannerInputs(
        role_to_docs=world2.role_to_docs,
        combs=world2.combs,
        comb_weights=world2.comb_weights,
        single_role_weights={r: 1.0 for r in range(world2.num_roles)},
        params=CostModelParams(),
        alpha=2.0, topk=10,
    )
    comb_u0 = tuple(world2.user_to_roles[0])
    plan2, pid = insert_role(searcher.plan, inputs2, new_role, new_docs,
                             combs_with_role={comb_u0, (new_role,)})
    # arena role bits are per-world: rebuild the arena so the fused mask
    # knows the new role, re-materialize the OLD plan on it, then apply
    # the updated plan incrementally
    arena2 = build_device_arena(small_corpus, world2, block_rows=128)
    searcher_mid = build_searcher("dynamic", small_corpus, world2, arena2, cfg,
                                  plan=searcher.plan)
    searcher2 = apply_plan_update(searcher_mid, small_corpus, world2, cfg, plan2)

    q = np.random.default_rng(0).standard_normal((1, small_corpus.dim)).astype(np.float32)
    d, ids = searcher2.search_batch(q, np.array([0]), world2.user_masks, k=10)
    # user 0 can now reach docs 0..39 plus their old docs
    docs = world2.user_docs(0)
    rows = small_corpus.rows_for_docs(np.fromiter(docs, dtype=np.int64, count=len(docs)))
    dd = ((small_corpus.vectors[rows] - q[0]) ** 2).sum(axis=1)
    want = set(rows[np.argsort(dd, kind="stable")[:10]].tolist())
    got = set(int(x) for x in ids[0] if x >= 0)
    assert got == want


def test_apply_plan_update_reuses_unchanged(small_world, small_corpus):
    cfg = FrameworkConfig()
    cfg.search.block_rows = 128
    cfg.search.batch_size = 16
    cfg.optimizer.storage_alpha = 2.0
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    searcher = build_searcher("dynamic", small_corpus, small_world, arena, cfg,
                              packed=False)
    inputs = PlannerInputs(
        role_to_docs=small_world.role_to_docs, combs=small_world.combs,
        comb_weights=small_world.comb_weights,
        single_role_weights={r: 1.0 for r in range(small_world.num_roles)},
        params=CostModelParams(), alpha=2.0, topk=10,
    )
    victim = small_world.combs[-1][0]
    plan2 = delete_role(searcher.plan, inputs, victim)
    searcher2 = apply_plan_update(searcher, small_corpus, small_world, cfg, plan2)
    # unchanged partitions share the same index object
    shared = sum(
        1 for pid, p in searcher2.partitions.items()
        if searcher.partitions.get(pid) is p
    )
    assert shared > 0
    # deleted role's users no longer route to anything via that role alone
    for comb, parts in plan2.trackers.items():
        assert victim not in comb
