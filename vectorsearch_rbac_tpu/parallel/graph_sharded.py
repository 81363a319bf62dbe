"""Partition-per-chip GRAPH serving: logical HNSW slabs placed across a
device mesh, traversed locally, merged on the host.

Completes the multi-chip story for the graph path (parallel/tiled_sharded
covers the chunk-scan path; parallel/sharded the global int8 flagship):
each chip holds a subset of a strategy's logical HNSW partitions as a
stacked (L, n_class, M0) graph slab + (L, n_class) row maps — graph bytes
only, exactly the no-copy design the reference's pointer-partition C++
benchmark validates (reference logical_partition_benchmark/benchmark/src/
shared_vector_table.h, pointer_hnsw_index.cpp add_from_storage_ids) — and
the full-precision arena (vectors/norms/role bits) is REPLICATED across
the mesh (at bf16 the 1M x 128 arena is 256 MB/chip; graphs dominate
storage in partitioned layouts, so replicating the shared table and
sharding the graphs is the memory-right split).

Execution is SPMD: one shard_map dispatch runs the SAME multi-graph
iterative beam search (ops/graph_search.py `pids` mode — the
GraphProbeBatcher kernel) on every chip over that chip's routed queries;
a query probing partitions on two chips appears in both chips' query
batches and merges on the host exactly like the single-chip batcher.

Placement reuses tiled_sharded.place_partitions (greedy LPT over the
optimizer's load map).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core import DeviceArena
from ..ops.topk import merge_topk_host
from ..utils.logger import get_logger
from ..utils.tracing import StageTimer
from .mesh import SHARD_AXIS, shard_map_compat
from .tiled_sharded import place_partitions

logger = get_logger("parallel.graph_sharded")


def _pow2(n: int) -> int:
    return 1 << (max(int(n), 1) - 1).bit_length()


class ShardedGraphSearcher:
    """Logical HNSW partitions placed per chip; SPMD multi-graph probes.

    graph_states: pid -> {"neighbors": (n, M0) int32, "entry": int,
    "row_map": (n,) int32 arena rows} — the HNSWIndex.graph_state()
    payload plus the partition's arena row map (logical/no-copy mode).
    """

    def __init__(
        self,
        arena: DeviceArena,
        graph_states: Dict[int, dict],
        mesh,
        partition_weights: Optional[Dict[int, float]] = None,
        name: str = "graph_sharded",
    ):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.arena = arena
        self.mesh = mesh
        self.name = name
        self.timer = StageTimer()
        self.n_devices = mesh.shape[SHARD_AXIS]
        S = self.n_devices
        # PartitionedSearcher routes probe jobs to `batcher.pids`
        # (partition/base.py) — same contract as GraphProbeBatcher
        self.pids = set(graph_states)

        w = partition_weights or {}
        loads = {pid: len(st["row_map"]) * float(w.get(pid, 1.0))
                 for pid, st in graph_states.items()}
        self.placement = place_partitions(loads, S)

        # pad every partition's graph to the class max (graph bytes only)
        n_max = _pow2(max(len(st["row_map"]) for st in graph_states.values()))
        m_max = max(np.asarray(st["neighbors"]).shape[1]
                    for st in graph_states.values())
        per_dev: List[List[int]] = [[] for _ in range(S)]
        for pid, devs in sorted(self.placement.items()):
            per_dev[devs[0]].append(pid)
        l_max = max(1, max(len(p) for p in per_dev))

        g4 = np.full((S, l_max, n_max, m_max), -1, np.int32)
        rm3 = np.full((S, l_max, n_max), -1, np.int32)
        self.slot_of: Dict[int, Tuple[int, int]] = {}   # pid -> (dev, slot)
        self.entry_of: Dict[int, int] = {}
        for dev in range(S):
            for slot, pid in enumerate(per_dev[dev]):
                st = graph_states[pid]
                g = np.asarray(st["neighbors"], np.int32)
                rm = np.asarray(st["row_map"], np.int32)
                g4[dev, slot, : g.shape[0], : g.shape[1]] = g
                rm3[dev, slot, : len(rm)] = rm
                self.slot_of[pid] = (dev, slot)
                e = st["entry"]
                self.entry_of[pid] = int(np.asarray(e).reshape(-1)[0])

        shard4 = NamedSharding(mesh, P(SHARD_AXIS, None, None, None))
        shard3 = NamedSharding(mesh, P(SHARD_AXIS, None, None))
        repl = NamedSharding(mesh, P())
        self._g4 = jax.device_put(g4, shard4)
        self._rm3 = jax.device_put(rm3, shard3)
        self._rm_host = rm3
        # replicate the shared arena across the mesh (no-copy serving needs
        # every chip to gather vectors/norms/bits by arena row id)
        self._vec = jax.device_put(np.asarray(arena.vectors), repl)
        self._nrm = jax.device_put(np.asarray(arena.norms), repl)
        self._bits = jax.device_put(np.asarray(arena.role_bits), repl)
        self.metric = arena.metric
        self._fn_cache: Dict[tuple, object] = {}
        logger.info(
            "sharded graphs '%s': %d partitions over %d chips, slab "
            "(%d, %d, %d)/chip = %.1f MB graph bytes/chip",
            name, len(graph_states), S, l_max, n_max, m_max,
            l_max * n_max * (m_max + 1) * 4 / 1e6,
        )

    # ----------------------------------------------------------- dispatch

    def _fn(self, qd: int, k: int, ef: int, ms: int, harvest: bool):
        key = (qd, k, ef, ms, harvest)
        cached = self._fn_cache.get(key)
        if cached is not None:
            return cached
        import jax
        from jax.sharding import PartitionSpec as P

        from ..ops.graph_search import graph_beam_search_iterative

        metric = self.metric

        def local(qb, mb, sb, eb, bb, g4, rm3, vec, nrm, bits):
            d, i = graph_beam_search_iterative(
                qb[0], vec, nrm, bits, g4[0], mb[0], eb[0],
                k=k, ef=ef, max_steps=ms, harvest_2hop=harvest,
                row_map=rm3[0], metric=metric,
                pids=sb[0], step_budget=bb[0],
            )
            return d[None], i[None]

        fn = shard_map_compat(
            local, self.mesh,
            in_specs=(
                P(SHARD_AXIS, None, None),        # queries (S, qd, d)
                P(SHARD_AXIS, None, None),        # masks   (S, qd, W)
                P(SHARD_AXIS, None),              # slots   (S, qd)
                P(SHARD_AXIS, None),              # entries (S, qd)
                P(SHARD_AXIS, None),              # budgets (S, qd)
                P(SHARD_AXIS, None, None, None),  # graphs
                P(SHARD_AXIS, None, None),        # row maps
                P(), P(), P(),                    # replicated arena
            ),
            out_specs=(P(SHARD_AXIS, None, None),
                       P(SHARD_AXIS, None, None)),
        )
        self._fn_cache[key] = jax.jit(fn)
        return self._fn_cache[key]

    # ------------------------------------------------------------- search

    def run(
        self,
        queries: np.ndarray,      # (Q, d) float32 — the full batch
        qmasks: np.ndarray,       # (Q, W) uint32
        jobs: Sequence[Tuple[int, List[int], dict]],  # (pid, q idx, kw)
        k: int,
    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """GraphProbeBatcher.run-compatible: execute probe jobs across the
        mesh; returns per job (dists (len(qsub), k), arena row ids).

        Jobs are bucketed on (exact ef, harvest flag) — the SAME group key
        as the single-chip batcher (ef is the beam WIDTH, a semantic
        parameter, and harvest changes the kernel), so mesh and single-chip
        serving return identical results for identical probe params;
        max_steps rides as a traced per-query budget within a bucket."""
        out: List[Optional[Tuple[np.ndarray, np.ndarray]]] = [None] * len(jobs)
        buckets: Dict[Tuple[int, bool], List[int]] = {}
        for j, (pid, qsub, kw) in enumerate(jobs):
            key = (int(kw.get("ef_search", 64)),
                   bool(kw.get("harvest_2hop", False)))
            buckets.setdefault(key, []).append(j)
        for (ef_b, harv), job_ids in sorted(buckets.items()):
            self._run_bucket(queries, qmasks, jobs, job_ids, k, ef_b, harv,
                             out)
        return out  # type: ignore[return-value]

    def _run_bucket(self, queries, qmasks, jobs, job_ids, k, ef_bucket,
                    harvest, out):
        import jax.numpy as jnp

        S = self.n_devices

        with self.timer.stage("route"):
            # per device: flattened (job, qi, slot, entry, budget) stream
            dev_rows: List[List[Tuple[int, int, int, int, int]]] = [
                [] for _ in range(S)]
            ms_max = 8
            for j in job_ids:
                pid, qsub, kw = jobs[j]
                dev, slot = self.slot_of[pid]
                ent = int(kw.get("entry_local", self.entry_of[pid]))
                ms = int(kw.get("max_steps", 256))
                ms_max = max(ms_max, ms)
                for qi in qsub:
                    dev_rows[dev].append((j, qi, slot, ent, ms))
            qd = _pow2(max(1, max(len(r) for r in dev_rows)))
            ef_eff = max(ef_bucket, k + 1)
            kk = min(k + 8, ef_eff)
            ms_bound = _pow2(ms_max)

        with self.timer.stage("pack"):
            qP = np.zeros((S, qd, queries.shape[1]), np.float32)
            mP = np.zeros((S, qd, qmasks.shape[1]), np.uint32)
            sP = np.zeros((S, qd), np.int32)
            eP = np.zeros((S, qd), np.int32)
            bP = np.zeros((S, qd), np.int32)
            for dev in range(S):
                for r, (j, qi, slot, ent, ms) in enumerate(dev_rows[dev]):
                    qP[dev, r] = queries[qi]
                    mP[dev, r] = qmasks[qi]
                    sP[dev, r] = slot
                    eP[dev, r] = ent
                    bP[dev, r] = ms

        with self.timer.stage("device_scan"):
            fn = self._fn(qd, kk, ef_eff, ms_bound, harvest)
            d, i = fn(jnp.asarray(qP), jnp.asarray(mP), jnp.asarray(sP),
                      jnp.asarray(eP), jnp.asarray(bP),
                      self._g4, self._rm3, self._vec, self._nrm, self._bits)
            d = np.asarray(d)
            i = np.asarray(i)

        with self.timer.stage("merge"):
            # local ids -> arena rows; host dedupe to k; scatter to jobs
            per_job: Dict[int, List[Tuple[np.ndarray, np.ndarray]]] = {}
            for dev in range(S):
                for r, (j, qi, slot, ent, ms) in enumerate(dev_rows[dev]):
                    loc = i[dev, r].astype(np.int64)
                    rows = np.where(
                        loc >= 0,
                        self._rm_host[dev, slot,
                                      np.maximum(loc, 0)].astype(np.int64),
                        -1)
                    per_job.setdefault(j, []).append(
                        (d[dev, r].astype(np.float64), rows))
            for j in job_ids:
                pid, qsub, kw = jobs[j]
                pairs = per_job.get(j, [])
                # a job routes to ONE device, so pairs arrive in qsub order;
                # one stacked merge per job (a per-query merge loop measured
                # as the wall in the single-chip drain, partition/base.py)
                dv = np.stack([p[0] for p in pairs])
                iv = np.stack([p[1] for p in pairs])
                out[j] = merge_topk_host([dv], [iv], k)

    def storage_report(self) -> Dict[str, float]:
        mb = 1024 * 1024
        a = self.arena
        arena_vec = a.n_padded * a.dim * a.vectors.dtype.itemsize
        arena_aux = a.n_padded * (4 + 4 * a.role_bits.shape[1])
        g = self._g4
        graph_bytes = g.shape[0] * g.shape[1] * g.shape[2] * (g.shape[3] + 1) * 4
        return {
            "arena_vectors_mb": arena_vec / mb,
            "arena_aux_mb": arena_aux / mb,
            "replicated_arena_mb_total": (arena_vec + arena_aux)
            * self.n_devices / mb,
            "graph_mb_total": graph_bytes / mb,
            "num_partitions": len(self.slot_of),
            "num_devices": self.n_devices,
        }
