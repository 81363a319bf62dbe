"""TiledSearcher: partitioned serving over contiguous int8 chunk storage.

The round-2 replacement for partition/packed.py's gather-based engine: each
partition's rows live once, contiguously, as fixed-size chunks of the
quantized arena (int8 vectors + int8 role one-hots + int32 norms), and a
query batch is grouped into per-partition q_tiles so every partition is
read from HBM once per ~q_tile queries instead of once per query.

Mirrors the reference's physically-materialized partition tables
(documentblocks_role_<r> / _partition_<p>, reference
controller/baseline/prefilter/initialize_partitions.py:261,
controller/dynamic_partition/load_result_to_database.py:191) — but the
"tables" are chunk-granular slices of one packed device array, and a whole
strategy's query fan-out is a handful of dispatches (one per size bucket).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core import DeviceArena
from ..ops.tiled_scan import tiled_bucket_topk
from ..ops.topk import merge_topk_host
from ..utils.logger import get_logger
from ..utils.tracing import StageTimer

logger = get_logger("partition.tiled")


def _pow2(n: int) -> int:
    return 1 << (max(n, 1) - 1).bit_length()


def chunk_class(nc: int, small_cap: int) -> int:
    """Dispatch chunk-capacity class for an nc-chunk partition: pow2 AND
    3*2^k intermediate classes. Pure pow2 padding wastes up to ~2x scan
    work right above a boundary (a 17-chunk qd-tree leaf pads to 32 —
    88% dummy chunks); the 24-class cuts that to 41% while keeping the
    compiled-shape count O(log): classes are {small, 12, 16, 24, 32,
    48, 64, ...}."""
    if nc <= small_cap:
        return small_cap
    p = _pow2(nc)
    mid = 3 * p // 4
    return mid if nc <= mid else p


# dispatch-shape discipline: at most 2 chunk classes x 1 slot count
_SMALL_CHUNKS = 8          # small class: partitions <= 8 chunks (16k rows)
_SLOTS_PER_DISPATCH = 64   # fixed slot count per dispatch (64 x q_tile=64
                           # -> 4096 queries per dispatch)


class TiledSearcher:
    """Partitioned strategy executor over packed int8 chunks (L2 arenas:
    the chunk engine's fused scoring and the cross-tier merge are squared-
    L2; ip/cosine arenas route through the generic metric-aware
    PartitionedSearcher engines instead — see build_*_searcher)."""

    def __init__(
        self,
        arena: DeviceArena,
        partition_rows: Dict[int, np.ndarray],   # pid -> arena row ids
        router: Callable[[int], Sequence[int]],
        name: str,
        chunk_rows: int = 2048,
        q_tile: int = 64,
        num_roles: Optional[int] = None,
        big_chunks: int = 48,   # partitions above this chunk count (~96k
                                # rows) are served by the flagship fused
                                # int8 Pallas kernel over a gathered
                                # contiguous copy instead of the chunk
                                # engine — an AnonySys remainder partition
                                # can hold most of the corpus, and a
                                # 672k-row scan belongs on the same path
                                # as the global RLS scan (measured: the
                                # chunk engine's pow2 padding + per-chunk
                                # top_k made it ~90% of dynamic's wall)
        big_group: int = 32,    # group-min width for the big tier: the
                                # candidate pool is n_rows/group, so a
                                # partition tier keeps a finer group than
                                # the 1M global scan (collision recall
                                # loss ~ C(k,2) / (n_rows/group))
        scan_group: int = 32,   # chunk-engine epilogue group (0 = exact
                                # per-chunk top-k; ops/tiled_scan.py)
        big_logical: bool = False,  # big tier serves from the SHARED
                                # arena by row gather (no contiguous int8
                                # copy) — cfg.index.big_logical
    ):
        import jax

        assert arena.quant is not None, (
            "TiledSearcher needs an int8-quantized arena "
            "(build_device_arena(dtype='int8'))"
        )
        q = arena.quant
        self.arena = arena
        self.router = router
        self.name = name
        self.chunk_rows = chunk_rows
        self.q_tile = q_tile
        self.scan_group = scan_group
        assert arena.metric == "l2", (
            "TiledSearcher scores squared-L2; build the generic "
            "partitioned engine for metric=" + str(arena.metric))
        self.timer = StageTimer()
        self._quant = q

        hv, hn, hr = q.host_vectors_q, q.host_norms_q, q.host_roles8
        d, r_pad = hv.shape[1], hr.shape[1]

        # big tier: flagship-kernel indexes over gathered rows
        from ..index.flat_int8 import Int8FlatIndex

        self._big: Dict[int, Int8FlatIndex] = {}
        for pid, rows in sorted(partition_rows.items()):
            if -(-len(rows) // chunk_rows) > big_chunks:
                # q_tile 1024: at group=32 the (block 8192 x qt) minima
                # block is (256, qt) i32 — qt 2048 puts the Mosaic scoped-
                # vmem stack 0.5 MB over its 16 MB budget on ~1M-row big
                # partitions (first hit when a 4096-query workload raised
                # the serving batch to 2048)
                self._big[pid] = Int8FlatIndex(
                    arena, np.asarray(rows), query_batch=2048, q_tile=1024,
                    block_rows=8192, group=big_group, dist16=False,
                    logical=big_logical)

        # chunk 0 is the dummy all-masked chunk (zero role one-hot rows are
        # inadmissible for every query) — padding slots point here
        part_chunks: Dict[int, List[int]] = {}
        n_chunks_total = 1
        for pid, rows in sorted(partition_rows.items()):
            if len(rows) == 0 or pid in self._big:
                continue
            nc = -(-len(rows) // chunk_rows)
            part_chunks[pid] = list(range(n_chunks_total, n_chunks_total + nc))
            n_chunks_total += nc

        vecC = np.zeros((n_chunks_total, chunk_rows, d), dtype=np.int8)
        normC = np.zeros((n_chunks_total, chunk_rows), dtype=np.int32)
        roleC = np.zeros((n_chunks_total, chunk_rows, r_pad), dtype=np.int8)
        rowC = np.full((n_chunks_total, chunk_rows), -1, dtype=np.int32)
        for pid, cids in part_chunks.items():
            rows = np.asarray(partition_rows[pid], dtype=np.int64)
            for j, cid in enumerate(cids):
                sl = rows[j * chunk_rows:(j + 1) * chunk_rows]
                m = len(sl)
                vecC[cid, :m] = hv[sl]
                normC[cid, :m] = hn[sl]
                roleC[cid, :m] = hr[sl]
                rowC[cid, :m] = sl.astype(np.int32)

        self._vecC = jax.device_put(vecC)
        self._normC = jax.device_put(normC)
        self._roleC = jax.device_put(roleC)
        self._rowC = jax.device_put(rowC)
        self.part_chunks = part_chunks
        self._part_nrows = {pid: len(partition_rows[pid])
                            for pid in part_chunks}
        self.partitions = {pid: None
                           for pid in (*part_chunks, *self._big)}  # count
        self.num_roles = num_roles
        self._chunk_bytes = (
            n_chunks_total * chunk_rows * (d + r_pad + 4 + 4)
        )
        logger.info(
            "tiled searcher '%s': %d partitions, %d chunks x %d rows "
            "(%.1f MB packed)",
            name, len(part_chunks), n_chunks_total, chunk_rows,
            self._chunk_bytes / 1e6,
        )

    # ---------------------------------------------------------- snapshot

    def save_snapshot(self, path: str, pack_arrays: bool = False) -> None:
        """COLD-START persistence of the packed chunk state (VERDICT-r3
        item 5: 'a restart today means a full re-quantize/re-pack/
        re-upload'). Pair with utils.persist.save_arena_snapshot (the
        shared arena) and the plan pickle (the router); from_snapshot then
        restores a serving-ready engine.

        Default (light) form stores only the ROW MAP + routing meta: the
        packed vec/norm/role chunks are pure gathers of the arena's quant
        arrays along rowC, so from_snapshot re-derives them ON DEVICE in
        milliseconds instead of reading ~1 GB of redundant chunk bytes
        from disk (round-4 measurement: the 979 MB packed snapshot made
        restore SLOWER than a cold rebuild, results/cold_start.json).
        pack_arrays=True keeps the heavyweight round-3 format for
        arenas whose quant arrays will not be available at restore."""
        import json as _json

        import numpy as np

        state = dict(rowC=np.asarray(self._rowC))
        if pack_arrays:
            state.update(
                vecC=np.asarray(self._vecC), normC=np.asarray(self._normC),
                roleC=np.asarray(self._roleC),
            )
        big_meta = {}
        for pid, idx8 in self._big.items():
            rmap = np.asarray(idx8._row_map)
            state[f"big_rows_{pid}"] = rmap[rmap >= 0]
            big_meta[str(pid)] = dict(group=idx8.group,
                                      logical=bool(idx8.logical))
        meta = dict(
            name=self.name, chunk_rows=self.chunk_rows, q_tile=self.q_tile,
            scan_group=self.scan_group, num_roles=self.num_roles,
            part_chunks={str(p): c for p, c in self.part_chunks.items()},
            part_nrows={str(p): n for p, n in self._part_nrows.items()},
            big=big_meta,
        )
        np.savez(path, __meta__=_json.dumps(meta), **state)

    @classmethod
    def from_snapshot(cls, arena: DeviceArena, router, path: str):
        """Restore a serving-ready TiledSearcher from save_snapshot output:
        no re-quantize, no re-pack — device uploads only."""
        import json as _json

        import jax
        import numpy as np

        from ..index.flat_int8 import Int8FlatIndex

        data = np.load(path, allow_pickle=False)
        meta = _json.loads(str(data["__meta__"]))
        self = object.__new__(cls)
        self.arena = arena
        self._quant = arena.quant
        self.router = router
        self.name = meta["name"]
        self.chunk_rows = int(meta["chunk_rows"])
        self.q_tile = int(meta["q_tile"])
        self.scan_group = int(meta["scan_group"])
        self.num_roles = meta["num_roles"]
        self.timer = StageTimer()
        rowC = data["rowC"]
        self._rowC = jax.device_put(rowC)
        if "vecC" in data.files:
            # heavyweight (pack_arrays=True) snapshot: arrays ship as-is
            self._vecC = jax.device_put(data["vecC"])
            self._normC = jax.device_put(data["normC"])
            self._roleC = jax.device_put(data["roleC"])
        else:
            # light snapshot: the chunks are gathers of the arena's quant
            # arrays along rowC — re-derive on device (-1 rows are the
            # dummy/pad slots: zero role one-hots, inadmissible for every
            # query, matching the builder's zero-fill)
            import jax.numpy as jnp

            q = arena.quant
            rC = self._rowC
            safe = jnp.maximum(rC, 0)
            valid = rC >= 0
            self._vecC = jnp.where(
                valid[..., None], jnp.take(q.vectors_q, safe, axis=0),
                jnp.int8(0))
            self._normC = jnp.where(
                valid, jnp.take(q.norms_q, safe, axis=0), 0)
            self._roleC = jnp.where(
                valid[..., None], jnp.take(q.roles8, safe, axis=0),
                jnp.int8(0))
        self.part_chunks = {int(p): list(c)
                            for p, c in meta["part_chunks"].items()}
        self._part_nrows = {int(p): int(n)
                            for p, n in meta["part_nrows"].items()}
        self._big = {}
        for pid_s, bm in meta["big"].items():
            rows = data[f"big_rows_{pid_s}"]
            self._big[int(pid_s)] = Int8FlatIndex(
                arena, rows, query_batch=2048, q_tile=1024,
                block_rows=8192, group=int(bm["group"]), dist16=False,
                logical=bool(bm["logical"]))
        self.partitions = {pid: None
                           for pid in (*self.part_chunks, *self._big)}
        nct, _, d = self._vecC.shape
        r_pad = self._roleC.shape[2]
        self._chunk_bytes = nct * self.chunk_rows * (d + r_pad + 4 + 4)
        return self

    # ------------------------------------------------------------- search

    def _adapt_scan_group(self, pids) -> int:
        """Grouped-epilogue width for one chunk-class dispatch group.

        A partition with n rows served at group g loses ~C(k,2)*g/n
        results to same-group collisions — i.e. a (k-1)/(2*(n/g)) recall
        fraction. Mirror Int8FlatIndex's group-count floor per dispatch:
        keep >= 2048 group minima for the SMALLEST partition in the class
        (0.2% loss at k=10, 2.4% at k=100), dropping to the exact per-chunk
        epilogue when even group=8 can't (partitions < 16k rows)."""
        if not self.scan_group or not pids:
            return self.scan_group
        min_rows = min(self._part_nrows[pid] for pid in pids)
        fit = min_rows // 2048
        if fit >= 8:
            return min(self.scan_group, 1 << (fit.bit_length() - 1))
        return 0

    def search_batch(
        self, queries: np.ndarray, user_ids: np.ndarray,
        user_masks: np.ndarray, k: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        import jax
        import jax.numpy as jnp

        from ..rbac.world import query_masks_for

        q = self._quant
        queries = np.asarray(queries, dtype=np.float32)
        user_ids = np.asarray(user_ids)
        nq = queries.shape[0]
        qmasks = query_masks_for(user_masks, user_ids)

        with self.timer.stage("route"):
            brouter = getattr(self, "batch_router", None)
            vrouter = getattr(self, "vector_router", None)
            all_pids = brouter(queries, user_ids) if brouter else None
            pid_queries: Dict[int, List[int]] = {}
            n_pids = np.zeros(nq, dtype=np.int32)
            for qi in range(nq):
                if all_pids is not None:
                    pids = all_pids[qi]
                elif vrouter is not None:
                    pids = vrouter(int(user_ids[qi]), queries[qi])
                else:
                    pids = self.router(int(user_ids[qi]))
                pids = [p for p in pids
                        if p in self.part_chunks or p in self._big]
                n_pids[qi] = len(pids)
                for pid in pids:
                    pid_queries.setdefault(pid, []).append(qi)

        # big-tier partitions: enqueue flagship-kernel scans first so their
        # device work and result transfers overlap the chunk dispatches
        big_pending: List[Tuple[int, List[int], object]] = []
        with self.timer.stage("big_enqueue"):
            for pid, idx8 in self._big.items():
                qidx = pid_queries.pop(pid, None)
                if qidx:
                    fin = idx8.search_deferred(
                        queries[qidx], qmasks[qidx], k)
                    big_pending.append((pid, qidx, fin))

        with self.timer.stage("quantize"):
            q8, qn = q.quantize_queries(queries)
            mbits = np.ascontiguousarray(qmasks, dtype=np.uint32)

        # slots: (pid, query idx list of <= q_tile). To bound XLA compiles
        # (minutes each through a remote tunnel) dispatch shapes are pow2
        # chunk classes (8, 16, 32, ... up to the strategy max) with a
        # fixed slot count per dispatch — O(log) compiled shapes, and a
        # 24-chunk partition pads to 32 chunks instead of the strategy max
        # (the round-1 two-class scheme re-scanned up to 10x dummy chunks
        # for mid-sized partitions).
        qt = self.q_tile
        chunks_max = max((len(c) for c in self.part_chunks.values()), default=1)
        small_cap = min(_SMALL_CHUNKS, _pow2(chunks_max))
        buckets: Dict[int, List[Tuple[int, List[int]]]] = {}
        for pid, qidx in pid_queries.items():
            nc = len(self.part_chunks[pid])
            cb = chunk_class(nc, small_cap)
            for s in range(0, len(qidx), qt):
                buckets.setdefault(cb, []).append((pid, qidx[s:s + qt]))

        from ..ops.pallas_scan_int8 import (
            expand_masks_device, pack_results_device, unpack_results_host,
        )

        id_bits = max((self.arena.n_padded - 1).bit_length(), 1)
        results: List[Tuple[List[Tuple[int, List[int]]], object, object]] = []
        with self.timer.stage("device_scan"):
            pending = []
            for cb, all_slots in sorted(buckets.items()):
                scan_group = self._adapt_scan_group(
                    {pid for pid, _ in all_slots})
                for g0 in range(0, len(all_slots), _SLOTS_PER_DISPATCH):
                    with self.timer.stage("scan_pack_host"):
                        slots = all_slots[g0:g0 + _SLOTS_PER_DISPATCH]
                        s_pad = (_SLOTS_PER_DISPATCH
                                 if len(all_slots) >= _SLOTS_PER_DISPATCH
                                 else _pow2(len(slots)))
                        # ONE host->device buffer per dispatch: int8 queries
                        # + int32 query norms + uint32 mask bitsets, viewed
                        # as int8 columns (per-upload round trips at the
                        # ~45 MB/s tunnel otherwise dominate the pass);
                        # masks expand to one-hot on device
                        w = mbits.shape[1]
                        dcols = q8.shape[1]
                        packP = np.zeros((s_pad * qt, dcols + 4 + 4 * w),
                                         dtype=np.int8)
                        cidP = np.zeros((s_pad, cb), dtype=np.int32)  # 0=dummy
                        for si, (pid, qidx) in enumerate(slots):
                            base = si * qt
                            packP[base:base + len(qidx), :dcols] = q8[qidx]
                            packP[base:base + len(qidx),
                                  dcols:dcols + 4] = (
                                qn[qidx].view(np.int8).reshape(-1, 4))
                            packP[base:base + len(qidx), dcols + 4:] = (
                                mbits[qidx].view(np.int8).reshape(-1, 4 * w))
                            cids = self.part_chunks[pid]
                            cidP[si, :len(cids)] = cids
                    with self.timer.stage("scan_enqueue"):
                        buf = jnp.asarray(packP)
                        q8D = buf[:, :dcols]
                        qnD = jax.lax.bitcast_convert_type(
                            buf[:, dcols:dcols + 4].reshape(-1, 1, 4),
                            jnp.int32).reshape(-1)
                        mbD = jax.lax.bitcast_convert_type(
                            buf[:, dcols + 4:].reshape(-1, w, 4),
                            jnp.uint32)
                        m8D = expand_masks_device(mbD, q.r_pad)
                        d, i = tiled_bucket_topk(
                            q8D, qnD, m8D,
                            jnp.asarray(cidP), self._vecC, self._normC,
                            self._roleC, self._rowC,
                            jnp.float32(1.0 / q.scale**2), k, cb, qt,
                            scan_group=scan_group,
                            score_shift=q.score_shift,
                        )
                        wire = pack_results_device(d, i, id_bits=id_bits,
                                                   dist16=False)
                        try:
                            wire.copy_to_host_async()
                        except (AttributeError, RuntimeError):
                            pass
                        pending.append((slots, wire))
            with self.timer.stage("scan_fetch"):
                if len(pending) > 1:
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(min(len(pending), 4)) as pool:
                        wires = list(pool.map(
                            np.asarray, [wr for _, wr in pending]))
                else:
                    wires = [np.asarray(wr) for _, wr in pending]
                for (slots, _), wr in zip(pending, wires):
                    d, i = unpack_results_host(wr, k, id_bits=id_bits,
                                               dist16=False)
                    results.append((slots, d, i))

        with self.timer.stage("merge"):
            out_d = np.full((nq, k), np.inf)
            out_i = np.full((nq, k), -1, dtype=np.int64)
            # Fan-out merge, vectorized over queries: a per-query
            # merge_topk_host call costs ~50 us of numpy fixed overhead,
            # and a high-fan-out router (qd-tree margin routing averages
            # 4+ leaves/query) turns that into hundreds of ms per pass.
            # Instead gather every multi-partition query's candidates into
            # one (n_multi, fan_max * k) block and merge them in ONE
            # vectorized call.
            multi_q = np.flatnonzero(n_pids > 1)
            if len(multi_q):
                slot_of = np.full(nq, -1, dtype=np.int64)
                slot_of[multi_q] = np.arange(len(multi_q))
                fan_max = int(n_pids[multi_q].max())
                md = np.full((len(multi_q), fan_max, k), np.inf)
                mi = np.full((len(multi_q), fan_max, k), -1, dtype=np.int64)
                fill = np.zeros(len(multi_q), dtype=np.int32)

            def scatter(qarr: np.ndarray, d: np.ndarray, i: np.ndarray):
                """qarr: query ids; d/i: (len(qarr), k) results for them."""
                single = n_pids[qarr] == 1
                if single.any():
                    qs = qarr[single]
                    out_d[qs] = d[single]
                    out_i[qs] = i[single]
                for j in np.flatnonzero(~single):
                    sl = slot_of[qarr[j]]
                    md[sl, fill[sl]] = d[j]
                    mi[sl, fill[sl]] = i[j]
                    fill[sl] += 1

            for slots, d, i in results:
                for si, (pid, qidx) in enumerate(slots):
                    base = si * self.q_tile
                    qarr = np.asarray(qidx, dtype=np.int64)
                    scatter(qarr, d[base:base + len(qidx)],
                            i[base:base + len(qidx)])
            for pid, qidx, fin in big_pending:
                d, i = fin()
                scatter(np.asarray(qidx, dtype=np.int64), d, i)
            if len(multi_q):
                f = len(multi_q)
                mD, mI = merge_topk_host(
                    [md.reshape(f, fan_max * k)],
                    [mi.reshape(f, fan_max * k)], k)
                out_d[multi_q] = mD
                out_i[multi_q] = mI
        return out_d, out_i

    # ------------------------------------------------------------ storage

    def storage_report(self) -> Dict[str, float]:
        mb = 1024 * 1024
        a = self.arena
        arena_vec = a.n_padded * a.dim * a.vectors.dtype.itemsize
        arena_aux = a.n_padded * (4 + 4 * a.role_bits.shape[1])
        d = self._vecC.shape[2]
        slots = self._vecC.shape[0] * self._vecC.shape[1]
        pv = slots * d                      # int8 vectors
        pi = slots * (self._roleC.shape[2] + 4 + 4)  # roles8 + norms + rowmap
        for idx8 in self._big.values():
            b = idx8.storage_bytes()
            pv += b["vectors"]
            pi += b["index"]
        return {
            "arena_vectors_mb": arena_vec / mb,
            "arena_aux_mb": arena_aux / mb,
            "partition_vectors_mb": pv / mb,
            "partition_index_mb": pi / mb,
            "total_mb": (arena_vec + arena_aux + pv + pi) / mb,
            "num_partitions": len(self.part_chunks) + len(self._big),
        }
