"""GraphProbeBatcher: slotted multi-partition graph-search dispatches.

The graph analog of ops/tiled_scan.tiled_bucket_topk (round-2 verdict item
2): a hybrid-dynamic strategy routes each query batch to 100+ per-(comb,
partition) probe groups, and the round-2 engine issued ONE device dispatch
per group (partition/base.py probe_params sub-grouping) — 100+ graph
searches per batch through a ~35 ms-floor tunnel collapsed hybrid dynamic
to 318 QPS at 1M (results/anonysys_hnsw_1m_r2.json). Here all logical-mode
HNSW partitions of one pow2 size class stack into a (P, n_class, M0) graph
slab + (P, n_class) row-map slab on device, and every probe group that
shares (class, ef bucket, max_steps bucket, harvest flag) joins ONE
multi-graph iterative-search dispatch: each query carries its partition id
and traverses graph[pid] (ops/graph_search.py `pids` mode), with vectors
and role bits gathered from the SHARED arena. Dispatch count per batch
drops from O(combs x partitions) to O(classes x ef-buckets).

Mirrors pgvector's one-scan-per-query HNSW probes (reference
pgvector/src/hnswscan.c) the TPU way: batch-synchronous beams, shared
storage, compile-bounded pow2 shape classes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core import DeviceArena
from ..ops.topk import merge_topk_host
from ..utils.logger import get_logger

logger = get_logger("partition.graph_batch")

# per-dispatch query cap. The iterative search's dedup scratch is an
# expansion HISTORY of (q_chunk, ms_bound) int32 (ops/graph_search.py) —
# a few MB at any class size, so the chunk no longer scales with n_class;
# 4096 stays the measured sweet spot for the serving pipeline.
_QCHUNK = 4096


def _pow2(n: int) -> int:
    return 1 << (max(int(n), 1) - 1).bit_length()


class GraphProbeBatcher:
    """Stacks logical-mode HNSW partitions into per-class device slabs and
    serves probe groups in batched multi-graph dispatches."""

    def __init__(self, arena: DeviceArena, hnsw_parts: Dict[int, object]):
        import jax

        self.arena = arena
        self.pids = set(hnsw_parts)
        self.metric = arena.metric
        # debug_timing=True: block after each dispatch and record per-group
        # walls in self.last_stats (serving keeps it False — blocking
        # serializes the enqueue pipeline)
        self.debug_timing = False
        self.last_stats: List[dict] = []
        # class key = (n_class, m0); HNSW graphs are already pow2-padded
        by_class: Dict[Tuple[int, int], List[int]] = {}
        graphs_np: Dict[int, np.ndarray] = {}
        rowmaps_np: Dict[int, np.ndarray] = {}
        self.entry_of: Dict[int, int] = {}
        for pid, idx in sorted(hnsw_parts.items()):
            assert getattr(idx, "logical", False), (
                "GraphProbeBatcher needs logical-mode HNSW partitions "
                "(shared-arena serving; cfg.index.hnsw_logical)"
            )
            g = np.asarray(idx._graph)
            rm = np.asarray(idx._row_map)
            graphs_np[pid] = g
            rowmaps_np[pid] = rm
            self.entry_of[pid] = int(idx.entry)
            by_class.setdefault(g.shape, []).append(pid)

        # ONE slab: pad every graph to the largest (n_class, M0) so the
        # whole strategy's probe jobs share a single dispatch per (ef,
        # harvest) group. Per-step device work is per-QUERY (neighbor
        # gathers, beam top-ks) and does not grow with the pad, and the
        # iterative search's per-query termination makes small-partition
        # queries finish exactly as early as they did in their own class —
        # but the 2-3 per-class dispatches the round-3 profile measured
        # (65+232+407 ms, serialized on device) collapse into the largest
        # one. Memory: P * n_max * (M0_max + 1) int32 (~320 MB at 40 x
        # 65536 x 33) — graph bytes, no vector duplication. Guard: skewed
        # layouts (40 x 64k partitions + one 1M remainder) would pad to
        # ~7 GB of dead cells, so merge only while padded cells stay
        # within 3x the real cells; outliers keep their own class slab.
        if len(by_class) > 1:
            cells = {s: s[0] * (s[1] + 1) * len(p)
                     for s, p in by_class.items()}
            shapes = sorted(by_class, key=lambda s: (s[0], s[1]))
            merged: List[Tuple[int, int]] = []
            n_parts = 0
            for s in shapes:
                cand = merged + [s]
                n_cand = n_parts + len(by_class[s])
                # pad target = the RUNNING (n_max, m_max) of the candidate
                # set, not the current shape: m can SHRINK as n grows
                # (bigger partitions often carry smaller M0), and the slab
                # built below pads every member to (n_max, m_max)
                n_run = max(c[0] for c in cand)
                m_run = max(c[1] for c in cand)
                pad_cells = n_run * (m_run + 1) * n_cand
                real = sum(cells[c] for c in cand)
                if pad_cells <= 3 * real:
                    merged = cand
                    n_parts = n_cand
                else:
                    break
            keep_out = [s for s in shapes if s not in merged]
            merge_pids = sorted(
                p for s in merged for p in by_class[s])
        else:
            merged, keep_out, merge_pids = list(by_class), [], []
        if len(merged) > 1:
            n_max = max(s[0] for s in merged)
            m_max = max(s[1] for s in merged)
            for pid in merge_pids:
                g = graphs_np[pid]
                if g.shape != (n_max, m_max):
                    gp = np.full((n_max, m_max), -1, np.int32)
                    gp[: g.shape[0], : g.shape[1]] = g
                    graphs_np[pid] = gp
                    rm = rowmaps_np[pid]
                    rmp = np.full(n_max, -1, np.int32)
                    rmp[: len(rm)] = rm
                    rowmaps_np[pid] = rmp
            new_classes = {(n_max, m_max): merge_pids}
            for s in keep_out:
                new_classes[s] = by_class[s]
            by_class = new_classes

        # one stacked slab per class
        self.class_of: Dict[int, Tuple[int, int]] = {}
        self.slot_of: Dict[int, int] = {}
        self.slabs: Dict[Tuple[int, int], tuple] = {}
        self.rowmap_host: Dict[Tuple[int, int], np.ndarray] = {}
        for shape, pids in by_class.items():
            g3 = np.stack([graphs_np[p] for p in pids])
            rm2 = np.stack([rowmaps_np[p] for p in pids])
            self.slabs[shape] = (jax.device_put(g3), jax.device_put(rm2))
            self.rowmap_host[shape] = rm2
            for slot, p in enumerate(pids):
                self.class_of[p] = shape
                self.slot_of[p] = slot
        logger.info(
            "graph batcher: %d partitions in %d classes %s",
            len(hnsw_parts), len(by_class),
            sorted((s[0], len(p)) for s, p in by_class.items()),
        )

    # ------------------------------------------------------------------ run

    def run(
        self,
        queries: np.ndarray,     # (Q, d) float32 — the FULL batch
        qmasks: np.ndarray,      # (Q, W) uint32
        jobs: Sequence[Tuple[int, List[int], dict]],  # (pid, query idx, kw)
        k: int,
    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Execute all probe jobs in batched dispatches. Returns, per job,
        (dists (len(qsub), k), arena row ids (len(qsub), k))."""
        import jax
        import jax.numpy as jnp

        from ..ops.graph_search import graph_search_iterative_fn

        # packed-row gather (round 5): one int8 take per candidate instead
        # of the three bf16/f32/u32 takes — auto when the arena carries a
        # LOSSLESS int8 mirror (scores stay bit-exact dequant distances)
        packed = None
        if (self.arena.quant is not None and self.arena.quant.lossless
                and self.metric in ("l2", "ip", "cosine")):
            if getattr(self, "_packed", None) is None:
                from ..core import build_packed_graph_rows

                self._packed = build_packed_graph_rows(self.arena)
            packed = self._packed
            from ..core import bits_to_onehot8, packed_query_operands

            dqs, qcd = packed_query_operands(self.arena, queries)
            r_pad = self.arena.quant.r_pad

        out: List[Optional[Tuple[np.ndarray, np.ndarray]]] = [None] * len(jobs)
        # group key: (class, ef, harvest). max_steps is NOT a key — it
        # rides as a traced per-query budget (ops/graph_search step_budget),
        # so all of a class's ms buckets share one dispatch and one compile
        # (the static loop bound is the pow2 max budget in the group).
        groups: Dict[tuple, List[int]] = {}
        for j, (pid, _, kw) in enumerate(jobs):
            key = (self.class_of[pid], int(kw.get("ef_search", 64)),
                   bool(kw.get("harvest_2hop", False)))
            groups.setdefault(key, []).append(j)

        import time as _time

        self.last_stats = []
        pending = []
        for (shape, ef, harv), job_ids in sorted(groups.items()):
            g3, rm2 = self.slabs[shape]
            n_class = shape[0]
            # flatten all member jobs' queries into one stream
            qis: List[int] = []
            pvec: List[int] = []
            evec: List[int] = []
            bvec: List[int] = []
            spans: List[Tuple[int, int, int]] = []  # (job, start, len)
            for j in job_ids:
                pid, qsub, kw = jobs[j]
                slot = self.slot_of[pid]
                ent = int(kw.get("entry_local", self.entry_of[pid]))
                ms = int(kw.get("max_steps", 256))
                spans.append((j, len(qis), len(qsub)))
                qis.extend(qsub)
                pvec.extend([slot] * len(qsub))
                evec.extend([ent] * len(qsub))
                bvec.extend([ms] * len(qsub))
            qarr = np.asarray(qis, dtype=np.int64)
            parr = np.asarray(pvec, dtype=np.int32)
            earr = np.asarray(evec, dtype=np.int32)
            barr = np.asarray(bvec, dtype=np.int32)
            ms_bound = _pow2(int(barr.max()))

            ef_eff = max(ef, k + 1)
            kk = min(k + 8, ef_eff)
            qchunk = _QCHUNK
            chunk_res: List[Tuple[np.ndarray, np.ndarray]] = []
            t_grp = _time.perf_counter()
            for s in range(0, len(qarr), qchunk):
                e = min(s + qchunk, len(qarr))
                bs = qchunk if len(qarr) > qchunk else _pow2(e - s)
                qb = np.zeros((bs, queries.shape[1]), np.float32)
                mb = np.zeros((bs, qmasks.shape[1]), np.uint32)
                pb = np.zeros(bs, np.int32)
                eb = np.zeros(bs, np.int32)
                bb = np.zeros(bs, np.int32)
                qb[: e - s] = queries[qarr[s:e]]
                mb[: e - s] = qmasks[qarr[s:e]]
                pb[: e - s] = parr[s:e]
                eb[: e - s] = earr[s:e]
                bb[: e - s] = barr[s:e]
                packed_kw = {}
                if packed is not None:
                    qcd_b = np.zeros(bs, np.float32)
                    qcd_b[: e - s] = qcd[qarr[s:e]]
                    packed_kw = dict(
                        packed_rows=packed,
                        mask8=jnp.asarray(
                            bits_to_onehot8(mb, r_pad, r_pad)),
                        dq_scale=float(dqs),
                        q_center_dot=jnp.asarray(qcd_b),
                    )
                d, i = graph_search_iterative_fn(
                    jnp.asarray(qb), self.arena.vectors, self.arena.norms,
                    self.arena.role_bits, g3, jnp.asarray(mb),
                    jnp.asarray(eb), kk, ef_eff, ms_bound, harv,
                    row_map=rm2, metric=self.metric, pids=jnp.asarray(pb),
                    step_budget=jnp.asarray(bb), **packed_kw,
                )
                if self.debug_timing:
                    jax.block_until_ready((d, i))
                chunk_res.append((s, e, d, i))
            if self.debug_timing:
                self.last_stats.append({
                    "n_class": n_class, "ef": ef, "ms_bound": ms_bound,
                    "harvest": harv, "jobs": len(job_ids),
                    "queries": len(qarr), "qchunk": qchunk,
                    "dispatches": -(-len(qarr) // qchunk),
                    "wall_ms": round(
                        (_time.perf_counter() - t_grp) * 1000, 1),
                })
            pending.append((shape, spans, qarr, parr, chunk_res))

        # drain: local ids -> arena rows, host dedupe to k, scatter to jobs
        for shape, spans, qarr, parr, chunk_res in pending:
            rm_host = self.rowmap_host[shape]
            dd = np.empty((len(qarr), k), np.float32)
            ii = np.empty((len(qarr), k), np.int64)
            for s, e, d, i in chunk_res:
                d = np.asarray(d)[: e - s].astype(np.float64)
                i = np.asarray(i)[: e - s].astype(np.int64)
                arena_i = np.where(
                    i >= 0,
                    rm_host[parr[s:e, None],
                            np.maximum(i, 0)].astype(np.int64),
                    -1,
                )
                md, mi = merge_topk_host([d], [arena_i], k)
                dd[s:e] = md
                ii[s:e] = mi
            for j, start, ln in spans:
                out[j] = (dd[start:start + ln], ii[start:start + ln])
        return out  # type: ignore[return-value]
