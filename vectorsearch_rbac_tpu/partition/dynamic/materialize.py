"""Materialize a PartitionPlan into a PartitionedSearcher.

Replaces the reference's database loading (reference
controller/dynamic_partition/load_result_to_database.py:672
load_result_to_database: drop stale documentblocks_partition_* tables,
populate new ones, write CombRolePartitions, build per-partition indexes,
attach RLS policies where a partition leaks beyond a comb's documents):
partitions become gathered device arrays; the comb -> partitions mapping
becomes the router; and "RLS where needed" is unconditional here because
the fused bitmask check costs nothing extra.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Set, Tuple

import numpy as np

from ...core import Corpus, DeviceArena
from ...models.cost import CostModelParams
from ...rbac.world import Comb, RBACWorld
from ...utils.config import FrameworkConfig
from ...utils.logger import get_logger
from ..base import BuiltPartition, PartitionedSearcher, make_partition_index
from .optimizer import PartitionPlan, PlannerInputs, split_comb_roles
from .refine import rebalance_heavy_partition

logger = get_logger("dynamic.materialize")


def clean_and_reindex(plan: PartitionPlan) -> PartitionPlan:
    """Drop empty partitions and renumber 0..c-1 (reference
    hnsw/helper.py:20-43 clean_empty_partitions + reorganize_partitions),
    remapping tracker pids accordingly."""
    non_empty = {pid: docs for pid, docs in plan.assignment.items() if docs}
    mapping = {old: new for new, old in enumerate(sorted(non_empty))}
    assignment = {mapping[old]: docs for old, docs in non_empty.items()}
    trackers = {}
    for comb, parts in plan.trackers.items():
        new_parts = {mapping[pid]: roles for pid, roles in parts.items()
                     if pid in mapping and roles}
        trackers[comb] = new_parts
    return PartitionPlan(assignment=assignment, trackers=trackers,
                         split_log=plan.split_log)


def validate_partition_coverage(plan: PartitionPlan, inputs: PlannerInputs) -> None:
    """Every comb's documents must be covered by its tracked partitions
    (reference load_result_to_database.py:35-55 validate_partition_coverage)."""
    for comb, parts in plan.trackers.items():
        docs = inputs.comb_docs(comb)
        covered: Set[int] = set()
        for pid in parts:
            covered |= plan.assignment.get(pid, set())
        missing = docs - covered
        assert not missing, (
            f"comb {comb}: {len(missing)} documents uncovered by partitions "
            f"{sorted(parts)}"
        )


def plan_dynamic_partitions(
    world: RBACWorld,
    inputs: PlannerInputs,
    refine_heavy: bool = True,
) -> PartitionPlan:
    """Full planning pipeline: greedy split -> heavy-partition refinement ->
    cleanup/renumber -> coverage validation (the __main__ flow of reference
    AnonySys_dynamic_partition.py:730-919)."""
    t0 = time.perf_counter()
    plan = split_comb_roles(inputs)
    logger.info("split_comb_roles: %d partitions, %d splits, %.2fs",
                len(plan.assignment), len(plan.split_log), time.perf_counter() - t0)

    if refine_heavy and plan.assignment:
        largest = max(plan.assignment, key=lambda pid: len(plan.assignment[pid]))
        if len(plan.assignment[largest]) > 0:
            plan = rebalance_heavy_partition(plan, inputs, target_pid=largest)

    plan = clean_and_reindex(plan)
    validate_partition_coverage(plan, inputs)
    return plan


def build_dynamic_searcher(
    corpus: Corpus,
    world: RBACWorld,
    arena: DeviceArena,
    cfg: FrameworkConfig,
    plan: Optional[PartitionPlan] = None,
    inputs: Optional[PlannerInputs] = None,
    comb_weights: Optional[Dict[Comb, float]] = None,
    single_role_weights: Optional[Dict[int, float]] = None,
    packed: bool = True,
) -> PartitionedSearcher:
    """Build the AnonySys strategy searcher; plans first if no plan given."""
    if plan is None:
        if inputs is None:
            inputs = PlannerInputs(
                role_to_docs=world.role_to_docs,
                combs=world.combs,
                comb_weights=comb_weights or world.comb_weights,
                single_role_weights=single_role_weights or {
                    r: 1.0 / max(world.num_roles, 1) for r in range(world.num_roles)
                },
                params=CostModelParams(
                    k=cfg.optimizer.recall_k, beta=cfg.optimizer.recall_beta,
                    a=cfg.optimizer.qps_a, b=cfg.optimizer.qps_b,
                    join_time=cfg.optimizer.join_time,
                ),
                alpha=cfg.optimizer.storage_alpha,
                topk=cfg.optimizer.topk,
                target_recall=cfg.optimizer.target_recall,
                avg_blocks_per_doc=corpus.avg_blocks_per_doc,
            )
        plan = plan_dynamic_partitions(world, inputs)

    partition_rows: Dict[int, np.ndarray] = {}
    for pid, docs in sorted(plan.assignment.items()):
        rows = corpus.rows_for_docs(np.fromiter(docs, dtype=np.int64, count=len(docs)))
        if len(rows):
            partition_rows[pid] = rows

    comb_to_pids: Dict[Comb, Tuple[int, ...]] = {
        comb: tuple(sorted(p for p in parts if p in partition_rows))
        for comb, parts in plan.trackers.items()
    }
    user_to_roles = world.user_to_roles

    def router(uid: int):
        comb = tuple(user_to_roles.get(uid, ()))
        pids = comb_to_pids.get(comb)
        if pids:
            return pids
        # unseen comb: union of each single role's partitions
        acc = []
        for r in comb:
            acc.extend(comb_to_pids.get((r,), ()))
        return tuple(sorted(set(acc)))

    if packed and cfg.index.kind in ("flat", "flat_approx"):
        if arena.quant is not None:
            from ..tiled import TiledSearcher
            searcher = TiledSearcher(arena, partition_rows, router,
                                     name="dynamic", num_roles=world.num_roles)
            searcher.plan = plan
            return searcher
        from ..packed import PackedSearcher
        searcher = PackedSearcher(
            arena, partition_rows, router, name="dynamic",
            mode="exact" if cfg.index.kind == "flat" else "approx",
        )
        searcher.plan = plan
        return searcher

    partitions: Dict[int, BuiltPartition] = {
        pid: BuiltPartition(pid=pid, rows=rows,
                            index=make_partition_index(arena, rows, cfg),
                            label=f"dynamic_{pid}")
        for pid, rows in partition_rows.items()
    }
    searcher = PartitionedSearcher(arena, partitions, router, name="dynamic")
    searcher.plan = plan  # keep for maintenance ops (insert/delete roles)

    if cfg.index.kind == "hnsw":
        # per-(comb, partition) probe parameters: a dynamic partition holds
        # a whole combination's documents, so one user's within-partition
        # selectivity is partial; a fixed-ef unfiltered graph search
        # under-delivers where pgvector's iterative scan would keep going
        # (reference pgvector/src/hnsw.c:90 hnsw.iterative_scan). The cost
        # model's ef ~ 1/sel (models/cost.py ef_for_recall) scales each
        # probe (pow2-bucketed to bound compiles), and low-selectivity
        # probes switch to the ACORN-style 2-hop-harvest traversal
        # (ops/graph_search.py graph_beam_search_filtered).
        base_ef = max(cfg.search.ef_search, 16)
        param_cache: Dict[tuple, dict] = {}

        def probe_params(uid: int, pid: int) -> dict:
            comb = tuple(user_to_roles.get(uid, ()))
            key = (comb, pid)
            kw = param_cache.get(key)
            if kw is None:
                pdocs = plan.assignment.get(pid, set())
                cdocs = set()
                for r in comb:
                    cdocs.update(world.role_to_docs.get(r, ()))
                sel = len(cdocs & pdocs) / max(len(pdocs), 1)
                raw = base_ef / max(sel, 0.05)
                ef = min(1 << int(np.ceil(np.log2(max(raw, base_ef)))), 2048)
                kw = {"ef_search": ef, "filtered_traversal": sel < 0.5}
                param_cache[key] = kw
            return kw

        searcher.probe_params = probe_params
    return searcher


def apply_plan_update(
    searcher: PartitionedSearcher,
    corpus: Corpus,
    world: RBACWorld,
    cfg: FrameworkConfig,
    new_plan: PartitionPlan,
) -> PartitionedSearcher:
    """Incremental re-materialization after a plan change (role insert or
    delete): rebuild only partitions whose document sets changed (the
    reference's incremental reload skips unchanged documentblocks_partition_*
    tables, load_result_to_database.py:114-188)."""
    old_plan: PartitionPlan = searcher.plan
    arena = searcher.arena
    if hasattr(searcher, "buckets") or hasattr(searcher, "part_chunks"):
        # packed/tiled layout: stacked chunk arrays are rebuilt wholesale
        # (host stacking + one upload — cheap next to index builds);
        # incremental per-partition reuse applies to the unpacked layout
        return build_dynamic_searcher(corpus, world, arena, cfg,
                                      plan=new_plan, packed=True)
    partitions: Dict[int, BuiltPartition] = {}
    rebuilt = 0
    for pid, docs in sorted(new_plan.assignment.items()):
        if not docs:
            continue
        old = searcher.partitions.get(pid)
        if old is not None and old_plan.assignment.get(pid) == docs:
            partitions[pid] = old  # unchanged: reuse device arrays + index
            continue
        rows = corpus.rows_for_docs(np.fromiter(docs, dtype=np.int64, count=len(docs)))
        if len(rows) == 0:
            continue
        partitions[pid] = BuiltPartition(
            pid=pid, rows=rows,
            index=make_partition_index(arena, rows, cfg),
            label=f"dynamic_{pid}",
        )
        rebuilt += 1
    logger.info("plan update: %d partitions rebuilt, %d reused",
                rebuilt, len(partitions) - rebuilt)

    comb_to_pids = {
        comb: tuple(sorted(p for p in parts if p in partitions))
        for comb, parts in new_plan.trackers.items()
    }
    user_to_roles = world.user_to_roles

    def router(uid: int):
        comb = tuple(user_to_roles.get(uid, ()))
        pids = comb_to_pids.get(comb)
        if pids:
            return pids
        acc = []
        for r in comb:
            acc.extend(comb_to_pids.get((r,), ()))
        return tuple(sorted(set(acc)))

    out = PartitionedSearcher(arena, partitions, router, name="dynamic")
    out.plan = new_plan
    return out
