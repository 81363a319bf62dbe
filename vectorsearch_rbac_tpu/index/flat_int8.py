"""Int8 flat index: the quantized fused-scan serving path.

The RLS-analog global searcher on the int8 arena (see core.ArenaQuant and
ops/pallas_scan_int8): int8 distances + int8 role-matmul admissibility on
the MXU, packed group-minima epilogue. This is the framework's fastest
global path — pgvector's halfvec/SIMD layer analog (reference
pgvector/src/halfutils.c) fused with its RLS policy check
(row_level_security.py:54).

For lossy (non-integer) corpora an optional f32 rerank pass re-scores the
top candidates against the full-precision arena mirror, restoring exact
distance order at negligible cost (a (Q, k+margin, d) gather).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..core import DeviceArena
from ..utils.logger import get_logger

logger = get_logger("index.flat_int8")


class Int8FlatIndex:
    def __init__(
        self,
        arena: DeviceArena,
        rows: Optional[np.ndarray] = None,
        query_batch: int = 8192,
        q_tile: int = 2048,   # measured: qt2048 kernel 43 ms vs qt512 51 ms
                              # per 8192 queries x 1M rows (scripts/
                              # int8_stage_profile.py)
        block_rows: int = 4096,
        group: int = 128,
        rerank: Optional[bool] = None,  # None = auto (rerank iff lossy)
        rerank_margin: int = 32,
        dist16: bool = True,   # wire distances as bf16 (global path) or
                               # full f32 (partition tiers feeding a
                               # cross-partition merge)
    ):
        import jax

        assert arena.quant is not None, (
            "Int8FlatIndex needs an int8-quantized arena"
        )
        q = arena.quant
        self._arena = arena
        self.query_batch = query_batch
        self.q_tile = min(q_tile, query_batch)
        self.block_rows = block_rows
        self.group = group

        # VMEM discipline: the defaults are sized for d=128; wide corpora
        # (768-d cohere shapes) must shrink tiles or Mosaic's 16 MB
        # scoped-vmem allocation fails at compile time. Empirical limits
        # from scripts/wide_d_probe.py on v5e (d=768 grid): the streamed
        # vector+role block must stay <= ~3.7 MB and the query tile
        # <= ~0.92 MB — the d=128 defaults (8192, 2048) sit exactly at
        # those bounds.
        d_pad = q.vectors_q.shape[1]
        unit = d_pad + q.r_pad
        while self.block_rows > 1024 and self.block_rows * unit > 3_700_000:
            self.block_rows //= 2
        while self.q_tile > 256 and self.q_tile * unit > 940_000:
            self.q_tile //= 2
        block_rows = self.block_rows
        self.rerank = (not q.lossless) if rerank is None else rerank
        self.rerank_margin = rerank_margin
        self.dist16 = dist16

        if rows is None:
            self.n_rows = arena.n
            self._vq = q.vectors_q
            self._nq = q.norms_q
            self._r8 = q.roles8
            self._row_map = None
            self._gathered = False
        else:
            from .flat import _pad_to_bucket

            rows = np.asarray(rows, dtype=np.int64)
            self.n_rows = len(rows)
            npad = _pad_to_bucket(max(self.n_rows, 1), block_rows)
            pad = npad - self.n_rows
            hv, hn, hr = q.host_vectors_q, q.host_norms_q, q.host_roles8
            vq = np.concatenate([hv[rows], np.zeros((pad, hv.shape[1]), np.int8)])
            nq_ = np.concatenate([hn[rows], np.zeros(pad, np.int32)])
            r8 = np.concatenate([hr[rows], np.zeros((pad, hr.shape[1]), np.int8)])
            rmap = np.concatenate([rows, np.full(pad, -1)]).astype(np.int32)
            self._vq = jax.device_put(vq)
            self._nq = jax.device_put(nq_)
            self._r8 = jax.device_put(r8)
            self._row_map = jax.device_put(rmap)
            self._gathered = True
        self._quant = q
        # group-min width scales with the row count: the candidate pool is
        # npad/group per query, and top-k loses ~C(k,2)*group/npad results
        # to same-group collisions — a 100k-row corpus at group=128 leaves
        # only 1024 candidates for a top-100 query (recall < 0.95, caught
        # by bench --smoke). Keep >= 8192 groups where the row count
        # allows.
        npad_rows = self._vq.shape[0]
        fit = npad_rows // 8192
        if fit >= 8:
            self.group = min(self.group, 1 << (fit.bit_length() - 1))
        else:
            self.group = 8
        # wire-format id width: results carry ARENA row ids (after _map_rows
        # in gathered mode), so size to the arena's padded row count
        self._id_bits = max((arena.n_padded - 1).bit_length(), 1)

    # ------------------------------------------------------------- search

    def search_deferred(self, queries: np.ndarray, query_masks: np.ndarray,
                        k: int):
        import jax
        import jax.numpy as jnp

        from ..ops.pallas_scan_int8 import (
            expand_masks_device, int8_masked_topk, pack_results_device,
            unpack_results_host,
        )
        from .flat import _map_rows

        quant = self._quant
        qf = np.asarray(queries, dtype=np.float32)
        masks = np.ascontiguousarray(query_masks, dtype=np.uint32)
        nq = qf.shape[0]
        # don't pad a small workload up to the full serving batch — but keep
        # a floor of 32 queries: Mosaic can't lower the degenerate (1, d)
        # int8 matmul a batch-1 dispatch would otherwise produce
        pow2 = 1 << (max(nq, 1) - 1).bit_length()
        bs = min(self.query_batch, max(pow2, 32))
        q_tile = min(self.q_tile, bs)
        q8, qn = quant.quantize_queries(qf)
        inv = jnp.float32(1.0 / quant.scale**2)
        r_pad = quant.r_pad
        # Mosaic kernels need a TPU; CPU (tests) runs the interpreter
        interp = jax.default_backend() == "cpu"

        pending = []
        for s in range(0, nq, bs):
            e = min(s + bs, nq)
            if e - s == bs:
                q8b, qnb, mb = q8[s:e], qn[s:e], masks[s:e]
            else:
                q8b = np.zeros((bs, q8.shape[1]), dtype=np.int8)
                qnb = np.zeros(bs, dtype=np.int32)
                mb = np.zeros((bs, masks.shape[1]), dtype=np.uint32)
                q8b[: e - s] = q8[s:e]
                qnb[: e - s] = qn[s:e]
                mb[: e - s] = masks[s:e]
            # masks travel as uint32 bitsets (16 B/query) and expand to the
            # int8 one-hot on device — 8x less host->device traffic
            m8b = expand_masks_device(jnp.asarray(mb), r_pad)
            kk = k + self.rerank_margin if self.rerank else k
            d, i = int8_masked_topk(
                jnp.asarray(q8b), jnp.asarray(qnb), self._vq, self._nq,
                self._r8, m8b, inv, kk,
                q_tile=q_tile, block_rows=self.block_rows,
                group=self.group, merge="auto", interpret=interp,
            )
            if self.rerank:
                d, i = _rerank_f32(
                    jnp.asarray(qf[s:e] if e - s == bs else
                                np.concatenate([qf[s:e], np.zeros((bs - (e - s), qf.shape[1]), np.float32)])),
                    d, i, self._arena, k,
                )
            if self._row_map is not None:
                i = _map_rows(i, self._row_map)
            # one packed uint16 wire array per batch (bf16 dist + nibble-
            # packed ids); async device->host copy overlaps later batches'
            # compute with this batch's tunnel transfer
            wire = pack_results_device(d[:, :k], i[:, :k],
                                       id_bits=self._id_bits,
                                       dist16=self.dist16)
            try:
                wire.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
            pending.append((s, e, wire))

        def finalize():
            out_d = np.empty((nq, k), dtype=np.float32)
            out_i = np.empty((nq, k), dtype=np.int64)
            # concurrent device->host fetches overlap tunnel RTTs (measured
            # ~2x over sequential asarray, scripts/fetch_concurrency.py)
            if len(pending) > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(min(len(pending), 4)) as pool:
                    wires = list(pool.map(
                        np.asarray, [w for _, _, w in pending]))
            else:
                wires = [np.asarray(w) for _, _, w in pending]
            for (s, e, _), w in zip(pending, wires):
                d, i = unpack_results_host(w, k, id_bits=self._id_bits,
                                           dist16=self.dist16)
                out_d[s:e] = d[: e - s]
                out_i[s:e] = i[: e - s]
            return out_d, out_i

        return finalize

    def search(self, queries, query_masks, k) -> Tuple[np.ndarray, np.ndarray]:
        return self.search_deferred(queries, query_masks, k)()

    # ------------------------------------------------------------ storage

    def storage_bytes(self) -> Dict[str, int]:
        npad, d = self._vq.shape
        r = self._r8.shape[1]
        vec = npad * d          # int8
        aux = npad * (r + 4 + (4 if self._gathered else 0))
        if not self._gathered:
            return {"vectors": 0, "index": 0}  # arena-shared, counted there
        return {"vectors": int(vec), "index": int(aux)}


def _rerank_f32(queries_f32, dists_q, idx, arena: DeviceArena, k: int):
    """Re-score candidate ids against the full-precision arena and return
    exact-order (k) results. Keeps -1 pads."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _go(qf, i, vec, norms):
        safe = jnp.maximum(i, 0)
        x = jnp.take(vec, safe, axis=0).astype(jnp.float32)   # (Q, kk, d)
        nrm = jnp.take(norms, safe, axis=0)
        dots = jnp.einsum("qd,qkd->qk", qf, x, preferred_element_type=jnp.float32)
        d = nrm - 2.0 * dots + jnp.sum(qf * qf, axis=1, keepdims=True)
        d = jnp.where(i >= 0, jnp.maximum(d, 0.0), jnp.inf)
        neg, pos = jax.lax.top_k(-d, k)
        return -neg, jnp.take_along_axis(i, pos, axis=1)

    return _go(queries_f32, idx, arena.vectors, arena.norms)
