"""Partitioned search: partitions as data + a batched multi-tenant engine.

Replaces the reference's per-strategy search functions
(search_documents_* in controller/*, dispatched by dotted path through
CONDITION_CONFIG, reference basic_benchmark/condition_config.py:12-38) with
one engine: a strategy is just (partitions over the shared arena, a router
from user to partition ids). The engine groups a query batch by partition
so every device dispatch is a large batched scan — the TPU-native analog of
the reference's per-user connection pools and per-partition SQL queries
(SURVEY.md section 2.5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core import DeviceArena
from ..index.base import PartitionIndex
from ..index.flat import FlatIndex
from ..ops.topk import merge_topk_host
from ..utils.config import FrameworkConfig


def make_partition_index(
    arena: DeviceArena,
    rows: Optional[np.ndarray],
    cfg: FrameworkConfig,
) -> PartitionIndex:
    """Index factory (replaces CREATE INDEX ... USING hnsw/ivfflat dispatch,
    reference controller/initialize_main_tables.py:82)."""
    kind = cfg.index.kind
    if kind == "flat_approx" and arena.quant is not None:
        # quantized arena: the int8 fused kernel is the fastest flat path.
        # ("flat" = the exact oracle keeps the f32 scan: the int8 kernel's
        # group-min epilogue is approximate even when quantization is
        # lossless.)
        from ..index.flat_int8 import Int8FlatIndex
        return Int8FlatIndex(
            arena, rows,
            query_batch=cfg.search.batch_size,
            block_rows=min(cfg.search.block_rows, 8192),
            # compressed wire for the single global index only; partition
            # tiers feed cross-partition merges, which must compare exact
            # f32 distances
            wire=cfg.search.wire_dist if rows is None else "f32",
        )
    if kind == "flat":
        return FlatIndex(
            arena, rows,
            block_rows=cfg.search.block_rows,
            mode="exact",
            query_batch=cfg.search.batch_size,
        )
    if kind == "flat_approx":
        return FlatIndex(
            arena, rows,
            block_rows=cfg.search.block_rows,
            mode="approx",
            query_batch=cfg.search.batch_size,
            recall_target=cfg.search.recall_target,
        )
    if kind == "ivf":
        from ..index.ivf import IVFIndex
        return IVFIndex(
            arena, rows,
            nlist=cfg.index.ivf_nlist,
            nprobe=cfg.search.nprobe,
            kmeans_iters=cfg.index.ivf_kmeans_iters,
            query_batch=cfg.search.batch_size,
            seed=cfg.seed,
        )
    if kind == "binary":
        from ..index.binary import BinaryQuantIndex
        return BinaryQuantIndex(
            arena, rows,
            query_batch=cfg.search.batch_size,
            rerank_mult=cfg.index.binary_rerank_mult,
            rerank=cfg.index.binary_rerank,
            bit_metric=cfg.index.binary_bit_metric,
        )
    if kind == "hnsw":
        from ..index.hnsw import HNSWIndex
        return HNSWIndex(
            arena, rows,
            m=cfg.index.hnsw_m,
            ef_construction=cfg.index.hnsw_ef_construction,
            ef_search=cfg.search.ef_search,
            query_batch=cfg.search.batch_size,
            builder="acorn" if cfg.index.hnsw_m_beta else "auto",
            m_beta=cfg.index.hnsw_m_beta or 64,
            logical=cfg.index.hnsw_logical,
        )
    raise ValueError(f"unknown index kind {kind}")


@dataclass
class BuiltPartition:
    pid: int
    rows: Optional[np.ndarray]   # arena row ids; None = whole arena
    index: PartitionIndex
    label: str = ""


class PartitionedSearcher:
    """A strategy instance: partitions + a user->partitions router."""

    def __init__(
        self,
        arena: DeviceArena,
        partitions: Dict[int, BuiltPartition],
        router: Callable[[int], Sequence[int]],
        name: str,
    ):
        from ..utils.tracing import StageTimer

        self.arena = arena
        self.partitions = partitions
        self.router = router
        self.name = name
        self.timer = StageTimer()

    # ------------------------------------------------------------- search

    def search_batch(
        self,
        queries: np.ndarray,   # (Q, d) float32
        user_ids: np.ndarray,  # (Q,)
        user_masks: np.ndarray,  # the (num_users, W) table, indexed by user_ids
        k: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Return (dists (Q, k), arena_row_ids (Q, k)); -1/inf pads."""
        from ..rbac.world import query_masks_for

        queries = np.asarray(queries, dtype=np.float32)
        user_ids = np.asarray(user_ids)
        nq = queries.shape[0]
        qmasks = query_masks_for(user_masks, user_ids)

        # group queries by partition (batched multi-tenant execution);
        # strategies with vector-dependent routing (qd-tree centroid
        # predicates) expose vector_router(uid, qvec)
        vrouter = getattr(self, "vector_router", None)
        pid_to_queries: Dict[int, List[int]] = {}
        per_query_pids: List[Sequence[int]] = []
        with self.timer.stage("route"):
            for qi in range(nq):
                if vrouter is not None:
                    pids = vrouter(int(user_ids[qi]), queries[qi])
                else:
                    pids = self.router(int(user_ids[qi]))
                per_query_pids.append(pids)
                for pid in pids:
                    pid_to_queries.setdefault(pid, []).append(qi)

        # run each touched partition once over all its queries; partitions
        # supporting deferred dispatch are all enqueued before the first
        # sync so their device scans pipeline back-to-back. Strategies may
        # expose probe_params(uid, pid) -> search kwargs (selectivity-scaled
        # ef, ACORN-style filtered traversal — replacing pgvector's
        # iterative rescans): queries then sub-group by those kwargs.
        probe_params = getattr(self, "probe_params", None)
        # graph_batcher (partition/graph_batch.py): probe groups on
        # logical-mode HNSW partitions collapse into slotted multi-graph
        # dispatches instead of one device call per (comb, partition)
        batcher = getattr(self, "graph_batcher", None)
        part_results: Dict[int, Tuple[np.ndarray, np.ndarray, Dict[int, int]]] = {}
        deferred: Dict[int, object] = {}
        graph_jobs: List[Tuple[int, List[int], dict]] = []
        with self.timer.stage("device_scan"):
            for pid, qidx in pid_to_queries.items():
                part = self.partitions[pid]
                # probe_params may return None for a (user, partition) pair
                # to mean "no per-probe kwargs" (e.g. hybrid strategies whose
                # flat partitions take the plain deferred path below)
                by_kw: Optional[Dict[Optional[tuple], List[int]]] = None
                if probe_params is not None:
                    by_kw = {}
                    for qi in qidx:
                        kw = probe_params(int(user_ids[qi]), pid)
                        key = None if kw is None else tuple(sorted(kw.items()))
                        by_kw.setdefault(key, []).append(qi)
                    if set(by_kw) == {None}:
                        by_kw = None  # whole partition probe-free
                if by_kw is not None and batcher is not None \
                        and pid in batcher.pids:
                    pos = {qi: j for j, qi in enumerate(qidx)}
                    part_results[pid] = (
                        np.full((len(qidx), k), np.inf, dtype=np.float32),
                        np.full((len(qidx), k), -1, dtype=np.int64),
                        pos,
                    )
                    for kw_items, qsub in by_kw.items():
                        graph_jobs.append(
                            (pid, qsub, dict(kw_items) if kw_items else {}))
                elif by_kw is not None:
                    d = np.full((len(qidx), k), np.inf, dtype=np.float32)
                    i = np.full((len(qidx), k), -1, dtype=np.int64)
                    pos = {qi: j for j, qi in enumerate(qidx)}
                    for kw_items, qsub in by_kw.items():
                        dd, ii = part.index.search(
                            queries[qsub], qmasks[qsub], k,
                            **(dict(kw_items) if kw_items else {})
                        )
                        for j, qi in enumerate(qsub):
                            d[pos[qi]], i[pos[qi]] = dd[j], ii[j]
                    part_results[pid] = (d, i, pos)
                elif hasattr(part.index, "search_deferred"):
                    deferred[pid] = part.index.search_deferred(
                        queries[qidx], qmasks[qidx], k
                    )
                else:
                    d, i = part.index.search(queries[qidx], qmasks[qidx], k)
                    pos = {qi: j for j, qi in enumerate(qidx)}
                    part_results[pid] = (d, i, pos)
            if graph_jobs:
                job_res = batcher.run(queries, qmasks, graph_jobs, k)
                for (pid, qsub, _), (dd, ii) in zip(graph_jobs, job_res):
                    d, i, pos = part_results[pid]
                    for j, qi in enumerate(qsub):
                        d[pos[qi]], i[pos[qi]] = dd[j], ii[j]
            for pid, fin in deferred.items():
                d, i = fin()
                qidx = pid_to_queries[pid]
                pos = {qi: j for j, qi in enumerate(qidx)}
                part_results[pid] = (d, i, pos)

        # per-query merge across partitions with row-id dedupe; the common
        # single-partition case (rls/user strategies, single-role users)
        # is a vectorized copy, no merge
        out_d = np.full((nq, k), np.inf)
        out_i = np.full((nq, k), -1, dtype=np.int64)
        with self.timer.stage("merge"):
            single_by_pid: Dict[int, List[int]] = {}
            multi: List[int] = []
            for qi, pids in enumerate(per_query_pids):
                if len(pids) == 1:
                    single_by_pid.setdefault(pids[0], []).append(qi)
                elif pids:
                    multi.append(qi)
            for pid, qis in single_by_pid.items():
                d, i, pos = part_results[pid]
                rows = [pos[qi] for qi in qis]
                out_d[qis] = d[rows]
                out_i[qis] = i[rows]
            # multi-partition queries group by their pid TUPLE (queries of
            # one comb route to the same partitions), so the merge runs
            # once per tuple over stacked rows instead of once per query —
            # the per-query Python loop was ~30% of the hybrid dynamic
            # pass at 4096 queries
            multi_by_pids: Dict[tuple, List[int]] = {}
            for qi in multi:
                multi_by_pids.setdefault(
                    tuple(per_query_pids[qi]), []).append(qi)
            for pids, qis in multi_by_pids.items():
                ds, is_ = [], []
                for pid in pids:
                    d, i, pos = part_results[pid]
                    rows = [pos[qi] for qi in qis]
                    ds.append(d[rows])
                    is_.append(i[rows])
                md, mi = merge_topk_host(ds, is_, k)
                out_d[qis] = md
                out_i[qis] = mi
        return out_d, out_i

    def search_batch_deferred(
        self,
        queries: np.ndarray,
        user_ids: np.ndarray,
        user_masks: np.ndarray,
        k: int,
    ) -> Callable[[], Tuple[np.ndarray, np.ndarray]]:
        """Enqueue a pass (host pack + upload + device dispatches) and
        return a finalize() -> (dists, ids) that drains it.

        Streaming serving: a caller overlaps pass i's drain with pass
        i+1's enqueue, hiding each pass's upload head in the previous
        pass's device time (measured 2.2x on two in-flight 32k-query
        passes, scripts/r3_overlap_probe.py — the tunnel runs H2D for one
        pass while kernels/D2H of the other proceed). The true deferred
        path needs every query to route to one probe-param-free partition
        whose index supports search_deferred (the rls/global layouts);
        anything else falls back to a synchronous closure so callers can
        pipeline unconditionally."""
        queries = np.asarray(queries, dtype=np.float32)
        user_ids = np.asarray(user_ids)
        if (getattr(self, "vector_router", None) is None
                and getattr(self, "probe_params", None) is None
                and len(self.partitions) == 1):
            from ..rbac.world import query_masks_for

            (part,) = self.partitions.values()
            if hasattr(part.index, "search_deferred"):
                if hasattr(part.index, "set_user_table"):
                    # resident mask table -> 2-byte uid wire (flat_int8)
                    part.index.set_user_table(user_masks)
                    if getattr(part.index, "_user_table", None) is not None:
                        return part.index.search_deferred(
                            queries, None, k, user_ids=user_ids)
                qmasks = query_masks_for(user_masks, user_ids)
                return part.index.search_deferred(queries, qmasks, k)
        return lambda: self.search_batch(queries, user_ids, user_masks, k)

    def search_user(
        self, user_id: int, query: np.ndarray, user_masks: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Single-query convenience (reference search_documents_* signature)."""
        d, i = self.search_batch(
            np.asarray(query, dtype=np.float32)[None, :],
            np.array([user_id]),
            user_masks,
            k,
        )
        return d[0], i[0]

    # ------------------------------------------------------------ storage

    def storage_report(self) -> Dict[str, float]:
        """MB accounting (replaces basic_benchmark/space_calculate.py): the
        shared arena plus per-partition duplication and index structures."""
        arena_vec = self.arena.n_padded * self.arena.dim * self.arena.vectors.dtype.itemsize
        arena_aux = self.arena.n_padded * (4 + 4 * self.arena.role_bits.shape[1])
        part_vec = 0
        part_idx = 0
        for p in self.partitions.values():
            sb = p.index.storage_bytes()
            part_vec += sb["vectors"]
            part_idx += sb["index"]
        mb = 1024 * 1024
        return {
            "arena_vectors_mb": arena_vec / mb,
            "arena_aux_mb": arena_aux / mb,
            "partition_vectors_mb": part_vec / mb,
            "partition_index_mb": part_idx / mb,
            "total_mb": (arena_vec + arena_aux + part_vec + part_idx) / mb,
            "num_partitions": len(self.partitions),
        }
