"""Partition-per-chip serving: the optimizer's partitions placed across a
device mesh, scanned locally, merged over ICI/host.

The reference's partitioned strategies are single-node by construction (one
Postgres instance; SURVEY.md section 2.5). This is the scale-out surface the
TPU rebuild owns: each chip holds a subset of the strategy's partitions as
contiguous int8 chunks (the partition/tiled.py layout), chosen by a greedy
load-balancing placement over the optimizer's (partition weight x size)
load map — the TPU analog of placing documentblocks_partition_<p> tables on
different servers, which the reference never built.

Execution is SPMD: one shard_map dispatch runs the SAME chunked int8 scan
(ops/tiled_scan.tiled_scan_core) on every chip over that chip's slot batch;
a query routed to partitions on two chips appears in both chips' slots and
is merged on the host exactly like the single-chip multi-partition path.

Hot-partition replication: pids in `replicate` are placed on EVERY chip and
their query tiles round-robin across replicas — the serving-load analog of
the reference's partition duplication under the AnonySys storage budget.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core import DeviceArena
from ..ops.tiled_scan import finish_scores, tiled_scan_core
from ..ops.topk import merge_topk_host
from ..utils.logger import get_logger
from ..utils.tracing import StageTimer
from ..partition.tiled import _SMALL_CHUNKS, _pow2, chunk_class
from .mesh import SHARD_AXIS, shard_map_compat

logger = get_logger("parallel.tiled_sharded")


def place_partitions(
    loads: Dict[int, float], n_devices: int,
    replicate: Sequence[int] = (),
) -> Dict[int, Tuple[int, ...]]:
    """Greedy longest-processing-time placement: heaviest partition onto the
    least-loaded chip. Returns pid -> device ids (replicated pids -> all).
    `loads` is the optimizer's load map: expected query weight x chunk count
    (SURVEY.md section 7(7))."""
    placement: Dict[int, Tuple[int, ...]] = {}
    dev_load = np.zeros(n_devices)
    rep = set(replicate)
    for pid in rep:
        if pid in loads:
            placement[pid] = tuple(range(n_devices))
            dev_load += loads[pid] / n_devices
    for pid, load in sorted(loads.items(), key=lambda kv: -kv[1]):
        if pid in rep:
            continue
        dev = int(np.argmin(dev_load))
        placement[pid] = (dev,)
        dev_load[dev] += load
    return placement


class ShardedTiledSearcher:
    """Partitioned strategy executor over a device mesh: partitions placed
    per chip by load, scanned as contiguous int8 chunks, SPMD dispatch."""

    def __init__(
        self,
        arena: DeviceArena,
        partition_rows: Dict[int, np.ndarray],   # pid -> arena row ids
        router: Callable[[int], Sequence[int]],
        mesh,                                     # 1D Mesh over SHARD_AXIS
        name: str = "dynamic_sharded",
        chunk_rows: int = 2048,
        q_tile: int = 64,
        num_roles: Optional[int] = None,
        partition_weights: Optional[Dict[int, float]] = None,
        replicate: Sequence[int] = (),
        slots_per_dispatch: int = 16,
        scan_group: int = 0,   # packed group-min epilogue (0 = exact);
                               # same contract as partition/tiled.py
    ):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert arena.quant is not None, (
            "ShardedTiledSearcher needs an int8-quantized arena"
        )
        q = arena.quant
        self.arena = arena
        self.router = router
        self.mesh = mesh
        self.name = name
        self.chunk_rows = chunk_rows
        self.q_tile = q_tile
        self.scan_group = scan_group
        self.num_roles = num_roles
        self.slots_per_dispatch = slots_per_dispatch
        self.timer = StageTimer()
        self._quant = q
        self.n_devices = mesh.shape[SHARD_AXIS]

        # ---- placement by load map --------------------------------------
        n_chunks = {pid: -(-len(rows) // chunk_rows)
                    for pid, rows in partition_rows.items() if len(rows)}
        w = partition_weights or {}
        loads = {pid: nc * float(w.get(pid, 1.0)) for pid, nc in n_chunks.items()}
        self.placement = place_partitions(loads, self.n_devices, replicate)

        # ---- per-device chunk packing (local chunk id 0 = dummy) --------
        hv, hn, hr = q.host_vectors_q, q.host_norms_q, q.host_roles8
        d, r_pad = hv.shape[1], hr.shape[1]
        dev_chunks: List[int] = [1] * self.n_devices  # dummy slot 0
        # pid -> {dev -> [local chunk ids]}
        self.part_chunks: Dict[int, Dict[int, List[int]]] = {}
        for pid, devs in sorted(self.placement.items()):
            nc = n_chunks[pid]
            per_dev = {}
            for dev in devs:
                per_dev[dev] = list(range(dev_chunks[dev], dev_chunks[dev] + nc))
                dev_chunks[dev] += nc
            self.part_chunks[pid] = per_dev
        lc_max = max(dev_chunks)

        vecC = np.zeros((self.n_devices, lc_max, chunk_rows, d), np.int8)
        normC = np.zeros((self.n_devices, lc_max, chunk_rows), np.int32)
        roleC = np.zeros((self.n_devices, lc_max, chunk_rows, r_pad), np.int8)
        rowC = np.full((self.n_devices, lc_max, chunk_rows), -1, np.int32)
        for pid, per_dev in self.part_chunks.items():
            rows = np.asarray(partition_rows[pid], dtype=np.int64)
            for dev, cids in per_dev.items():
                for j, cid in enumerate(cids):
                    sl = rows[j * chunk_rows:(j + 1) * chunk_rows]
                    m = len(sl)
                    vecC[dev, cid, :m] = hv[sl]
                    normC[dev, cid, :m] = hn[sl]
                    roleC[dev, cid, :m] = hr[sl]
                    rowC[dev, cid, :m] = sl.astype(np.int32)

        spec3 = NamedSharding(mesh, P(SHARD_AXIS, None, None))
        spec4 = NamedSharding(mesh, P(SHARD_AXIS, None, None, None))
        self._vecC = jax.device_put(vecC, spec4)
        self._normC = jax.device_put(normC, spec3)
        self._roleC = jax.device_put(roleC, spec4)
        self._rowC = jax.device_put(rowC, spec3)
        self.chunks_max = max(n_chunks.values(), default=1)
        self._rr = 0  # replica round-robin cursor
        self._fn_cache: Dict[Tuple[int, int, int], object] = {}
        logger.info(
            "sharded tiled '%s': %d partitions over %d chips "
            "(%d replicated), %d chunks/chip max, %.1f MB/chip",
            name, len(self.part_chunks), self.n_devices, len(replicate),
            lc_max, lc_max * chunk_rows * (d + r_pad + 8) / 1e6,
        )

    # ----------------------------------------------------------- dispatch

    def _dispatch_fn(self, slots: int, cb: int, k: int):
        """Compiled SPMD step: every chip scans its own slot batch against
        its local chunks. Cached per (slots, chunk-capacity, k) shape in a
        per-instance dict — an lru_cache on the bound method would key on
        self and pin every searcher's device arrays for the process
        lifetime."""
        cached = self._fn_cache.get((slots, cb, k))
        if cached is not None:
            return cached
        import jax
        from jax.sharding import PartitionSpec as P

        qt = self.q_tile

        r_pad = self._quant.r_pad

        def local(q8b, mkb, cid, vecC, normC, roleC, rowC):
            # block args carry a leading device axis of size 1; role masks
            # arrive as uint32 bitsets (16 B/query on the wire vs r_pad
            # one-hot bytes) and expand on device, like the sibling engines
            from ..ops.pallas_scan_int8 import expand_masks_device

            s, d = slots, q8b.shape[-1]
            m8b = expand_masks_device(mkb[0], r_pad)
            top, idx = tiled_scan_core(
                q8b[0].reshape(s, qt, d), m8b.reshape(s, qt, -1),
                cid[0], vecC[0], normC[0], roleC[0], rowC[0],
                k=k, chunks=cb, scan_group=self.scan_group,
                score_shift=self._quant.score_shift,
            )
            return top[None], idx[None]

        fn = shard_map_compat(
            local, self.mesh,
            in_specs=(
                P(SHARD_AXIS, None, None),        # q8P (S, slots*qt, d)
                P(SHARD_AXIS, None, None),        # m8P
                P(SHARD_AXIS, None, None),        # cidP (S, slots, cb)
                P(SHARD_AXIS, None, None, None),  # vecC
                P(SHARD_AXIS, None, None),        # normC
                P(SHARD_AXIS, None, None, None),  # roleC
                P(SHARD_AXIS, None, None),        # rowC
            ),
            out_specs=(P(SHARD_AXIS, None, None, None),
                       P(SHARD_AXIS, None, None, None)),
        )
        self._fn_cache[(slots, cb, k)] = jax.jit(fn)
        return self._fn_cache[(slots, cb, k)]

    # ------------------------------------------------------------- search

    def search_batch(
        self, queries: np.ndarray, user_ids: np.ndarray,
        user_masks: np.ndarray, k: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        from ..rbac.world import query_masks_for

        q = self._quant
        queries = np.asarray(queries, dtype=np.float32)
        user_ids = np.asarray(user_ids)
        nq = queries.shape[0]
        qmasks = query_masks_for(user_masks, user_ids)
        S = self.n_devices
        qt = self.q_tile

        with self.timer.stage("route"):
            # (dev, pid) -> [query idx]; replicated pids round-robin
            dev_pid_queries: Dict[Tuple[int, int], List[int]] = {}
            n_pids = np.zeros(nq, dtype=np.int32)
            for qi in range(nq):
                pids = [p for p in self.router(int(user_ids[qi]))
                        if p in self.part_chunks]
                n_pids[qi] = len(pids)
                for pid in pids:
                    devs = tuple(self.part_chunks[pid])
                    dev = devs[self._rr % len(devs)]
                    self._rr += 1
                    dev_pid_queries.setdefault((dev, pid), []).append(qi)

        with self.timer.stage("quantize"):
            q8, qn = q.quantize_queries(queries)
            mk = np.ascontiguousarray(qmasks, dtype=np.uint32)

        # pow2 chunk classes like partition/tiled.py, but slots are laid
        # out PER DEVICE: dispatch shape (S, slots*qt, ...)
        small_cap = min(_SMALL_CHUNKS, _pow2(self.chunks_max))
        per_class: Dict[int, List[List[Tuple[int, List[int]]]]] = {}
        for (dev, pid), qidx in dev_pid_queries.items():
            nc = len(next(iter(self.part_chunks[pid].values())))
            cb = chunk_class(nc, small_cap)
            slots = per_class.setdefault(cb, [[] for _ in range(S)])
            for s0 in range(0, len(qidx), qt):
                slots[dev].append((pid, qidx[s0:s0 + qt]))

        results = []
        with self.timer.stage("device_scan"):
            pending = []
            for cb, dev_slots in sorted(per_class.items()):
                max_slots = max(len(sl) for sl in dev_slots)
                cap = self.slots_per_dispatch
                n_rounds = -(-max(max_slots, 1) // cap)
                for rd in range(n_rounds):
                    batch = [sl[rd * cap:(rd + 1) * cap] for sl in dev_slots]
                    s_pad = (cap if max_slots > cap
                             else _pow2(max(max(len(b) for b in batch), 1)))
                    q8P = np.zeros((S, s_pad * qt, q8.shape[1]), np.int8)
                    qnP = np.zeros((S, s_pad * qt), np.int32)
                    mkP = np.zeros((S, s_pad * qt, mk.shape[1]), np.uint32)
                    cidP = np.zeros((S, s_pad, cb), np.int32)  # 0 = dummy
                    for dev in range(S):
                        for si, (pid, qidx) in enumerate(batch[dev]):
                            base = si * qt
                            q8P[dev, base:base + len(qidx)] = q8[qidx]
                            qnP[dev, base:base + len(qidx)] = qn[qidx]
                            mkP[dev, base:base + len(qidx)] = mk[qidx]
                            cids = self.part_chunks[pid][dev]
                            cidP[dev, si, :len(cids)] = cids
                    fn = self._dispatch_fn(s_pad, cb, k)
                    top, idx = fn(jnp.asarray(q8P), jnp.asarray(mkP),
                                  jnp.asarray(cidP), self._vecC, self._normC,
                                  self._roleC, self._rowC)
                    d, i = finish_scores(
                        top.reshape(S, s_pad, qt, k),
                        idx.reshape(S, s_pad, qt, k),
                        jnp.asarray(qnP).reshape(S, s_pad, qt),
                        jnp.float32(1.0 / q.scale**2),
                    )
                    pending.append((batch, d, i))
            for batch, d, i in pending:
                results.append((batch, np.asarray(d), np.asarray(i)))

        with self.timer.stage("merge"):
            out_d = np.full((nq, k), np.inf)
            out_i = np.full((nq, k), -1, dtype=np.int64)
            multi: Dict[int, List[Tuple[np.ndarray, np.ndarray]]] = {}
            for batch, d, i in results:
                for dev in range(S):
                    for si, (pid, qidx) in enumerate(batch[dev]):
                        for j, qi in enumerate(qidx):
                            if n_pids[qi] == 1:
                                out_d[qi] = d[dev, si, j]
                                out_i[qi] = i[dev, si, j]
                            else:
                                multi.setdefault(qi, []).append(
                                    (d[dev, si, j:j + 1], i[dev, si, j:j + 1]))
            for qi, parts in multi.items():
                md, mi = merge_topk_host([p[0] for p in parts],
                                         [p[1] for p in parts], k)
                out_d[qi] = md[0]
                out_i[qi] = mi[0]
        return out_d, out_i

    # ------------------------------------------------------------ storage

    def storage_report(self) -> Dict[str, float]:
        mb = 1024 * 1024
        a = self.arena
        arena_vec = a.n_padded * a.dim * a.vectors.dtype.itemsize
        arena_aux = a.n_padded * (4 + 4 * a.role_bits.shape[1])
        d = self._vecC.shape[3]
        slots = self._vecC.shape[0] * self._vecC.shape[1] * self._vecC.shape[2]
        pv = slots * d
        pi = slots * (self._roleC.shape[3] + 4 + 4)
        return {
            "arena_vectors_mb": arena_vec / mb,
            "arena_aux_mb": arena_aux / mb,
            "partition_vectors_mb": pv / mb,
            "partition_index_mb": pi / mb,
            "total_mb": (arena_vec + arena_aux + pv + pi) / mb,
            "num_partitions": len(self.part_chunks),
            "num_devices": self.n_devices,
        }
