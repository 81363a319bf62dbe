"""The three baseline strategies: global scan (RLS), per-role partitions
(ROLE), combination-role partitions (USER).

Strategy semantics mirror the reference's CLI algorithms
(basic_benchmark/test_all.py:34 --algorithm {RLS, ROLE, USER, AnonySys,
QDTree}):

- RLS: one global index, permission enforced per row (reference
  controller/baseline/pg_row_security/row_level_security.py:193
  search_documents_rls). Here the RLS policy compiles to the fused bitmask
  check — no post-filtering, no per-user DB roles.
- ROLE: one partition per role holding exactly that role's documents
  (reference controller/baseline/prefilter/initialize_partitions.py:350
  initialize_role_partitions); a user's query fans out over their roles and
  merges (reference prefilter_role.py:22-195).
- USER (comb): one partition per distinct user role-combination
  (reference initialize_partitions.py:534 initialize_combination_partitions);
  a query hits exactly one partition (reference
  prefilter_combination_role.py:22-166).

The AnonySys dynamic strategy lives in partition/dynamic/; the qd-tree
baseline in partition/qdtree.py.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..core import Corpus, DeviceArena
from ..rbac.world import RBACWorld
from ..utils.config import FrameworkConfig
from .base import BuiltPartition, PartitionedSearcher, make_partition_index


def build_global_searcher(
    corpus: Corpus, world: RBACWorld, arena: DeviceArena, cfg: FrameworkConfig
) -> PartitionedSearcher:
    """RLS analog: one index over the whole arena, fused mask enforcement."""
    part = BuiltPartition(pid=0, rows=None, index=make_partition_index(arena, None, cfg),
                          label="global")
    return PartitionedSearcher(arena, {0: part}, router=lambda uid: (0,), name="rls")


def build_role_searcher(
    corpus: Corpus, world: RBACWorld, arena: DeviceArena, cfg: FrameworkConfig,
    packed: bool = True,
) -> PartitionedSearcher:
    """ROLE prefilter: a physical partition per role. With packed=True all
    same-sized role partitions answer in one dispatch (partition/packed.py)."""
    partition_rows: Dict[int, np.ndarray] = {}
    for role, docs in sorted(world.role_to_docs.items()):
        rows = corpus.rows_for_docs(np.fromiter(docs, dtype=np.int64, count=len(docs)))
        if len(rows):
            partition_rows[role] = rows

    user_to_roles = world.user_to_roles

    def router(uid: int):
        return tuple(r for r in user_to_roles.get(uid, ()) if r in partition_rows)

    if packed and cfg.index.kind in ("flat", "flat_approx"):
        if arena.quant is not None and arena.metric == "l2":
            from .tiled import TiledSearcher
            return TiledSearcher(arena, partition_rows, router, name="role",
                                 num_roles=world.num_roles,
                                 scan_group=cfg.search.scan_group)
        from .packed import PackedSearcher
        return PackedSearcher(arena, partition_rows, router, name="role",
                              mode="exact" if cfg.index.kind == "flat" else "approx")

    partitions = {
        pid: BuiltPartition(pid=pid, rows=rows,
                            index=make_partition_index(arena, rows, cfg),
                            label=f"role_{pid}")
        for pid, rows in partition_rows.items()
    }
    return PartitionedSearcher(arena, partitions, router, name="role")


def build_comb_searcher(
    corpus: Corpus, world: RBACWorld, arena: DeviceArena, cfg: FrameworkConfig,
    packed: bool = True,
) -> PartitionedSearcher:
    """USER prefilter: a physical partition per distinct role combination."""
    partition_rows: Dict[int, np.ndarray] = {}
    comb_to_pid: Dict[tuple, int] = {}
    for pid, comb in enumerate(world.combs):
        docs = world.comb_docs(comb)
        rows = corpus.rows_for_docs(np.fromiter(docs, dtype=np.int64, count=len(docs)))
        if len(rows) == 0:
            continue
        comb_to_pid[comb] = pid
        partition_rows[pid] = rows

    user_to_roles = world.user_to_roles

    def router(uid: int):
        pid = comb_to_pid.get(tuple(user_to_roles.get(uid, ())))
        return (pid,) if pid is not None else ()

    if packed and cfg.index.kind in ("flat", "flat_approx"):
        if arena.quant is not None and arena.metric == "l2":
            from .tiled import TiledSearcher
            return TiledSearcher(arena, partition_rows, router, name="user",
                                 num_roles=world.num_roles,
                                 scan_group=cfg.search.scan_group)
        from .packed import PackedSearcher
        return PackedSearcher(arena, partition_rows, router, name="user",
                              mode="exact" if cfg.index.kind == "flat" else "approx")

    partitions = {
        pid: BuiltPartition(pid=pid, rows=rows,
                            index=make_partition_index(arena, rows, cfg),
                            label=f"comb_{pid}")
        for pid, rows in partition_rows.items()
    }
    return PartitionedSearcher(arena, partitions, router, name="user")


STRATEGIES = {
    "rls": build_global_searcher,
    "role": build_role_searcher,
    "user": build_comb_searcher,
}


def build_searcher(
    name: str, corpus: Corpus, world: RBACWorld, arena: DeviceArena, cfg: FrameworkConfig,
    **kwargs,
) -> PartitionedSearcher:
    """Build a strategy by name (one registry replaces CONDITION_CONFIG,
    reference basic_benchmark/condition_config.py:12-38). Strategies with
    extra state (dynamic, qdtree) accept kwargs."""
    if name in STRATEGIES:
        return STRATEGIES[name](corpus, world, arena, cfg)
    if name in ("dynamic", "anonysys"):
        from .dynamic import build_dynamic_searcher
        return build_dynamic_searcher(corpus, world, arena, cfg, **kwargs)
    if name == "qdtree":
        from .qdtree import build_qdtree_searcher
        return build_qdtree_searcher(corpus, world, arena, cfg, **kwargs)
    raise ValueError(f"unknown strategy {name}")
