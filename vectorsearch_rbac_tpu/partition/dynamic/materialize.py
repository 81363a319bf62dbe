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
    graph_states: Optional[Dict[int, dict]] = None,
    mesh=None,
) -> PartitionedSearcher:
    """Build the AnonySys strategy searcher; plans first if no plan given.

    graph_states: optional {pid: HNSWIndex.graph_state()} map — partitions
    found here skip graph construction and resume from the persisted graph
    (the reference's per-partition .faiss index files reloaded by
    load_result_to_database.py; pair with utils.persist.save_npz).

    mesh: optional 1D device mesh (parallel.mesh SHARD_AXIS) — the
    strategy's logical HNSW partitions shard across it (graph slabs per
    chip, arena replicated; parallel/graph_sharded.py) instead of the
    single-chip slab batcher. Probe-group routing/merging is identical:
    ShardedGraphSearcher is run()-compatible with GraphProbeBatcher."""
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
                    ef_offset=cfg.optimizer.ef_offset,
                    n_ref=cfg.optimizer.n_ref,
                    gamma_n=cfg.optimizer.gamma_n,
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
        if arena.quant is not None and arena.metric == "l2":
            from ..tiled import TiledSearcher
            searcher = TiledSearcher(arena, partition_rows, router,
                                     name="dynamic", num_roles=world.num_roles,
                                     scan_group=cfg.search.scan_group,
                                     big_logical=cfg.index.big_logical)
            searcher.plan = plan
            return searcher
        from ..packed import PackedSearcher
        searcher = PackedSearcher(
            arena, partition_rows, router, name="dynamic",
            mode="exact" if cfg.index.kind == "flat" else "approx",
        )
        searcher.plan = plan
        return searcher

    # hybrid executor: serve a partition from its HNSW graph only when every
    # comb routed to it keeps within-partition selectivity above threshold;
    # mixed partitions (the alpha-budget remainder holding many roles' docs)
    # serve from the fused flat scan instead — graph traversal under partial
    # filters structurally under-delivers (results/anonysys_hnsw_1m.json:
    # admissible docs are a uniform sample of a clustered space, beyond graph
    # locality). This is the TPU answer to pgvector's iterative_scan blowup:
    # the reference keeps scanning a graph for 100s of hops; the MXU scans
    # the whole partition in one fused pass at higher QPS.
    hybrid = cfg.index.kind == "hybrid"
    graph_pids: Optional[set] = None
    if hybrid:
        import copy

        sel_min = {pid: 1.0 for pid in partition_rows}
        for comb, parts in plan.trackers.items():
            cdocs: Set[int] = set()
            for r in comb:
                cdocs.update(world.role_to_docs.get(r, ()))
            for pid in parts:
                pdocs = plan.assignment.get(pid, set())
                if pid in sel_min and pdocs:
                    sel_min[pid] = min(sel_min[pid],
                                       len(cdocs & pdocs) / len(pdocs))
        thr = cfg.index.hybrid_sel_threshold
        graph_pids = {pid for pid, s in sel_min.items() if s >= thr}
        cfg_graph = copy.deepcopy(cfg)
        cfg_graph.index.kind = "hnsw"
        # graph partitions serve from the shared arena (logical mode) so
        # the GraphProbeBatcher can stack them into slab dispatches
        cfg_graph.index.hnsw_logical = True
        cfg_flat = copy.deepcopy(cfg)
        cfg_flat.index.kind = "flat_approx"
        logger.info(
            "hybrid dynamic: %d/%d partitions serve graphs (min comb sel >= %.2f)",
            len(graph_pids), len(partition_rows), thr,
        )

    if cfg.index.kind == "hnsw" and not cfg.index.hnsw_logical:
        import copy as _copy

        cfg = _copy.deepcopy(cfg)
        cfg.index.hnsw_logical = True   # batchable + no vector duplication

    def _pid_cfg(pid: int) -> FrameworkConfig:
        if not hybrid:
            return cfg
        return cfg_graph if pid in graph_pids else cfg_flat

    def _mk_index(pid: int, rows: np.ndarray):
        c = _pid_cfg(pid)
        if (graph_states is not None and pid in graph_states
                and c.index.kind == "hnsw"):
            from ...index.hnsw import HNSWIndex
            return HNSWIndex(
                arena, rows,
                m=c.index.hnsw_m,
                ef_search=c.search.ef_search,
                query_batch=c.search.batch_size,
                graph_state=graph_states[pid],
                logical=c.index.hnsw_logical,
            )
        return make_partition_index(arena, rows, c)

    partitions: Dict[int, BuiltPartition] = {
        pid: BuiltPartition(pid=pid, rows=rows,
                            index=_mk_index(pid, rows),
                            label=f"dynamic_{pid}")
        for pid, rows in partition_rows.items()
    }
    searcher = PartitionedSearcher(arena, partitions, router, name="dynamic")
    searcher.plan = plan  # keep for maintenance ops (insert/delete roles)

    if cfg.index.kind in ("hnsw", "hybrid"):
        # per-(comb, partition) probe parameters: a dynamic partition holds
        # a whole combination's documents, so one user's within-partition
        # selectivity is partial. The round-1 fixed-budget traversal
        # plateaued at 0.51 recall at 1M (results/anonysys_hnsw_1m.json);
        # the fix is the pgvector analog — ITERATIVE rescan (reference
        # pgvector/src/hnsw.c:90 hnsw.iterative_scan, hnswscan.c: keep
        # expanding until k rows survive the filter) — plus predicate-aware
        # ENTRY POINTS: traversal starts at the admissible row nearest the
        # (comb inter partition) centroid, inside the admissible region,
        # instead of the global partition medoid. Expansion budget scales
        # ~ k/sel (pow2-bucketed to bound compiles); very low selectivity
        # additionally harvests the 2-hop ring (ACORN-gamma's density
        # analog, reference acorn_benchmark/src/index_creation.cpp:105).
        base_ef = max(cfg.search.ef_search, 16)
        topk = max(cfg.optimizer.topk, 10)
        param_cache: Dict[tuple, dict] = {}

        def _pow2(x: float) -> int:
            return 1 << int(np.ceil(np.log2(max(x, 1))))

        def probe_params(uid: int, pid: int) -> Optional[dict]:
            if graph_pids is not None and pid not in graph_pids:
                return None  # hybrid flat partition: plain fused scan
            comb = tuple(user_to_roles.get(uid, ()))
            key = (comb, pid)
            kw = param_cache.get(key)
            if kw is None:
                pdocs = plan.assignment.get(pid, set())
                cdocs = set()
                for r in comb:
                    cdocs.update(world.role_to_docs.get(r, ()))
                adocs = cdocs & pdocs
                sel = len(adocs) / max(len(pdocs), 1)
                ef = min(_pow2(max(base_ef, 2 * topk)), 512)
                max_steps = int(min(_pow2(4 * topk / max(sel, 0.01)), 4096))
                kw = {
                    "iterative": True,
                    "ef_search": ef,
                    "max_steps": max_steps,
                    "harvest_2hop": sel < 0.15,
                }
                rows = partition_rows.get(pid)
                if rows is not None and adocs:
                    adm = np.isin(
                        corpus.doc_ids[rows],
                        np.fromiter(adocs, dtype=np.int64, count=len(adocs)),
                    )
                    local = np.nonzero(adm)[0]
                    if len(local):
                        sub = corpus.vectors[rows[local]]
                        mean = sub.mean(axis=0, keepdims=True)
                        kw["entry_local"] = int(
                            local[np.argmin(((sub - mean) ** 2).sum(axis=1))]
                        )
                param_cache[key] = kw
            return kw

        searcher.probe_params = probe_params

        # slab-batch the graph probes: one dispatch per (class, ef bucket)
        # instead of one per (comb, partition) — round-2 verdict item 2
        from ...index.hnsw import HNSWIndex
        from ..graph_batch import GraphProbeBatcher

        gparts = {pid: p.index for pid, p in partitions.items()
                  if isinstance(p.index, HNSWIndex) and p.index.logical}
        if gparts and mesh is not None:
            from ...parallel.graph_sharded import ShardedGraphSearcher

            states = {pid: {"neighbors": np.asarray(ix._graph),
                            "entry": int(ix.entry),
                            "row_map": np.asarray(ix._row_map)}
                      for pid, ix in gparts.items()}
            weights = {pid: float(len(partitions[pid].rows))
                       for pid in gparts}
            searcher.graph_batcher = ShardedGraphSearcher(
                arena, states, mesh, partition_weights=weights)
        elif gparts:
            searcher.graph_batcher = GraphProbeBatcher(arena, gparts)
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
    if cfg.index.kind == "hybrid":
        # per-partition index KIND depends on the plan's selectivity map,
        # which the update may change — rebuild through the hybrid chooser
        return build_dynamic_searcher(corpus, world, arena, cfg,
                                      plan=new_plan, packed=False)
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
