"""Packed multi-partition execution: all partitions of a size class answer
in ONE device dispatch.

Motivation: per-dispatch latency (host sync, and on this environment a
~35 ms tunnel round trip) makes one-dispatch-per-partition strategies
(ROLE with 100 roles, dynamic with ~40 partitions) dispatch-bound. The
packed layout stacks every partition of a bucket into (P, L_pad, ...)
arrays — exactly the IVF inverted-file shape — and reuses the probed-scan
kernel (ops/ivf_scan.probed_topk) with the partition slot as the probe id:
a whole query batch spanning dozens of partitions costs one dispatch per
size bucket.

This is the TPU-native analog of the reference's per-partition SQL fan-out
(controller/dynamic_partition/search.py per-partition queries): instead of
N queries x P tables, one gather-matmul over a packed HBM layout.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

from ..core import DeviceArena
from ..ops.ivf_scan import probed_topk
from ..ops.topk import merge_topk_host
from ..utils.logger import get_logger
from ..utils.tracing import StageTimer

logger = get_logger("partition.packed")


def _bucket_len(n: int) -> int:
    """Pad partition row counts to power-of-two buckets (min 1024)."""
    return max(1024, 1 << (max(n, 1) - 1).bit_length())


import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "mode"))
def _packed_search_fn(queries, slots, inv_vectors, inv_norms, inv_bits,
                      inv_rows, query_masks, k, mode="approx"):
    return probed_topk(queries, slots, inv_vectors, inv_norms, inv_bits,
                       inv_rows, query_masks, k, mode=mode)


class PackedBucket:
    """Partitions of one size bucket stacked into (P, L, ...) arrays."""

    def __init__(self, arena: DeviceArena, parts: Dict[int, np.ndarray],
                 l_pad: int):
        if arena.host_vectors is not None:
            hv, hn, hb = arena.host_vectors, arena.host_norms, arena.host_bits
        else:
            hv = np.asarray(arena.vectors, dtype=np.float32)
            hn = np.asarray(arena.norms)
            hb = np.asarray(arena.role_bits)
        p = len(parts)
        d = hv.shape[1]
        w = hb.shape[1]
        dtype = arena.vectors.dtype
        # allocate directly in the compute dtype: an f32 staging copy of a
        # (100, 65536, d) ROLE bucket would transiently cost ~3.4 GB host RAM
        inv_vec = np.zeros((p, l_pad, d), dtype=dtype)
        inv_norm = np.zeros((p, l_pad), dtype=np.float32)
        inv_bits = np.zeros((p, l_pad, w), dtype=np.uint32)
        inv_rows = np.full((p, l_pad), -1, dtype=np.int32)
        self.slot_of_pid: Dict[int, int] = {}
        for slot, (pid, rows) in enumerate(sorted(parts.items())):
            m = len(rows)
            self.slot_of_pid[pid] = slot
            inv_vec[slot, :m] = hv[rows].astype(dtype)
            inv_norm[slot, :m] = hn[rows]
            inv_bits[slot, :m] = hb[rows]
            inv_rows[slot, :m] = rows.astype(np.int32)
        self._vec = jax.device_put(inv_vec)
        self._norm = jax.device_put(inv_norm)
        self._bits = jax.device_put(inv_bits)
        self._rows = jax.device_put(inv_rows)
        self.l_pad = l_pad
        self.p = p

    def search_deferred(self, queries: np.ndarray, masks: np.ndarray,
                        slots: np.ndarray, k: int, query_batch: int = 4096,
                        mode: str = "approx"):
        nq = queries.shape[0]
        # the probed scan materializes a (bs, L, d) gather: cap it at ~2 GB
        d = self._vec.shape[2]
        itemsize = self._vec.dtype.itemsize
        gather_cap = max(8, (2 << 30) // max(self.l_pad * d * itemsize, 1))
        gather_cap = 1 << (gather_cap.bit_length() - 1)  # floor pow2
        bs = min(query_batch, gather_cap,
                 max(8, 1 << (max(nq, 1) - 1).bit_length()))
        pending = []
        for s in range(0, nq, bs):
            e = min(s + bs, nq)
            qb = np.zeros((bs, queries.shape[1]), dtype=np.float32)
            mb = np.zeros((bs, masks.shape[1]), dtype=np.uint32)
            sb = np.zeros((bs, 1), dtype=np.int32)
            qb[: e - s] = queries[s:e]
            mb[: e - s] = masks[s:e]
            sb[: e - s, 0] = slots[s:e]
            d, i = _packed_search_fn(
                jnp.asarray(qb), jnp.asarray(sb), self._vec, self._norm,
                self._bits, self._rows, jnp.asarray(mb), k, mode,
            )
            pending.append((s, e, d, i))

        def finalize():
            out_d = np.empty((nq, k), dtype=np.float32)
            out_i = np.empty((nq, k), dtype=np.int64)
            for s, e, d, i in pending:
                out_d[s:e] = np.asarray(d)[: e - s]
                out_i[s:e] = np.asarray(i)[: e - s]
            return out_d, out_i

        return finalize

    def storage_bytes(self) -> Dict[str, int]:
        slots = self.p * self.l_pad
        d = self._vec.shape[2]
        w = self._bits.shape[2]
        return {
            "vectors": int(slots * d * self._vec.dtype.itemsize),
            "index": int(slots * (4 + 4 * w + 4)),
        }


class PackedSearcher:
    """Strategy searcher over packed buckets: one dispatch per (bucket,
    query-chunk) instead of one per partition."""

    def __init__(
        self,
        arena: DeviceArena,
        partition_rows: Dict[int, np.ndarray],   # pid -> arena row ids
        router: Callable[[int], Sequence[int]],
        name: str,
        mode: str = "approx",
    ):
        self.arena = arena
        self.router = router
        self.name = name
        self.mode = mode
        self.timer = StageTimer()

        by_bucket: Dict[int, Dict[int, np.ndarray]] = {}
        for pid, rows in partition_rows.items():
            if len(rows) == 0:
                continue
            by_bucket.setdefault(_bucket_len(len(rows)), {})[pid] = rows
        self.buckets: List[PackedBucket] = []
        self.bucket_of_pid: Dict[int, Tuple[int, int]] = {}
        for l_pad, parts in sorted(by_bucket.items()):
            b = PackedBucket(arena, parts, l_pad)
            bi = len(self.buckets)
            self.buckets.append(b)
            for pid, slot in b.slot_of_pid.items():
                self.bucket_of_pid[pid] = (bi, slot)
        self.partitions = {pid: None for pid in self.bucket_of_pid}  # count only
        logger.info("packed searcher '%s': %d partitions in %d buckets %s",
                    name, len(self.bucket_of_pid), len(self.buckets),
                    [(b.p, b.l_pad) for b in self.buckets])

    def search_batch(
        self, queries: np.ndarray, user_ids: np.ndarray,
        user_masks: np.ndarray, k: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        from ..rbac.world import query_masks_for

        queries = np.asarray(queries, dtype=np.float32)
        user_ids = np.asarray(user_ids)
        nq = queries.shape[0]
        qmasks = query_masks_for(user_masks, user_ids)

        # route: flatten (query, partition) pairs per bucket; strategies
        # with vector-dependent routing (qd-tree) expose vector_router
        vrouter = getattr(self, "vector_router", None)
        with self.timer.stage("route"):
            per_bucket: Dict[int, List[Tuple[int, int]]] = {}
            n_pids: List[int] = []
            for qi in range(nq):
                if vrouter is not None:
                    pids = vrouter(int(user_ids[qi]), queries[qi])
                else:
                    pids = self.router(int(user_ids[qi]))
                n_pids.append(len(pids))
                for pid in pids:
                    bi, slot = self.bucket_of_pid[pid]
                    per_bucket.setdefault(bi, []).append((qi, slot))

        with self.timer.stage("device_scan"):
            finalizers = []
            for bi, pairs in per_bucket.items():
                qidx = np.fromiter((p[0] for p in pairs), dtype=np.int64,
                                   count=len(pairs))
                slots = np.fromiter((p[1] for p in pairs), dtype=np.int32,
                                    count=len(pairs))
                fin = self.buckets[bi].search_deferred(
                    queries[qidx], qmasks[qidx], slots, k, mode=self.mode
                )
                finalizers.append((qidx, fin))
            results = [(qidx, *fin()) for qidx, fin in finalizers]

        with self.timer.stage("merge"):
            out_d = np.full((nq, k), np.inf)
            out_i = np.full((nq, k), -1, dtype=np.int64)
            # single-partition queries: vectorized copy
            multi_rows: Dict[int, List[Tuple[np.ndarray, np.ndarray]]] = {}
            for qidx, d, i in results:
                for j, qi in enumerate(qidx.tolist()):
                    if n_pids[qi] == 1:
                        out_d[qi] = d[j]
                        out_i[qi] = i[j]
                    else:
                        multi_rows.setdefault(qi, []).append((d[j:j+1], i[j:j+1]))
            for qi, rows in multi_rows.items():
                md, mi = merge_topk_host([r[0] for r in rows],
                                         [r[1] for r in rows], k)
                out_d[qi] = md[0]
                out_i[qi] = mi[0]
        return out_d, out_i

    def storage_report(self) -> Dict[str, float]:
        mb = 1024 * 1024
        arena_vec = self.arena.n_padded * self.arena.dim * self.arena.vectors.dtype.itemsize
        arena_aux = self.arena.n_padded * (4 + 4 * self.arena.role_bits.shape[1])
        pv = sum(b.storage_bytes()["vectors"] for b in self.buckets)
        pi = sum(b.storage_bytes()["index"] for b in self.buckets)
        return {
            "arena_vectors_mb": arena_vec / mb,
            "arena_aux_mb": arena_aux / mb,
            "partition_vectors_mb": pv / mb,
            "partition_index_mb": pi / mb,
            "total_mb": (arena_vec + arena_aux + pv + pi) / mb,
            "num_partitions": len(self.bucket_of_pid),
        }
