"""Binary-quantized index: bit-packed scan + exact rerank from the arena.

The pgvector `bit(d)` index analog (reference pgvector/src/bitvec.c type,
hnsw.c `bit_hamming_ops`/`bit_jaccard_ops` opclasses) AND the
binary-quantization recipe pgvector documents for big corpora:
`binary_quantize(embedding)::bit(d)` hamming index, re-ranked by the
exact operator over the full-precision column.

TPU-native shape: the packed bits are the ONLY per-index payload —
ceil(d/32) uint32 words per row, a 32x reduction vs f32 — and the rerank
tier gathers full-precision rows from the SHARED device arena by row id
(the logical/no-copy mode, reference shared_vector_table.h), so a
BinaryQuantIndex adds no vector duplication at all. The candidate scan is
ops/binary_scan.masked_binary_topk (fused RBAC mask + popcount distance);
rerank is one gather + one small matmul per query batch.

Two serving modes:
- rerank=True (default): hamming candidates (k * rerank_mult wide) ->
  exact metric distances -> top-k. Returns TRUE metric distances.
- rerank=False: raw `<~>` / `<%%>` operator semantics — returns hamming
  or jaccard distances directly (the pgvector bit-column index).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..core import DeviceArena
from ..ops.binary_scan import binary_topk_fn, pack_bits


import jax as _jax
import jax.numpy as _jnp
import functools as _functools


@_functools.partial(_jax.jit, static_argnames=("k", "metric"))
def _rerank_fn(queries, cand_idx, arena_vectors, row_map, k, metric):
    """Exact-distance rerank of (Q, C) candidate rows gathered from the
    shared arena. Candidates with idx < 0 stay +inf. Returns (dists (Q,k)
    in the arena metric, arena_ids (Q,k))."""
    q = queries.astype(_jnp.float32)
    if metric == "cosine":
        q = q / _jnp.maximum(_jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    safe_local = _jnp.maximum(cand_idx, 0)
    rows = _jnp.take(row_map, safe_local)           # (Q, C) arena ids
    rows = _jnp.where(cand_idx < 0, -1, rows)
    safe = _jnp.maximum(rows, 0)
    x = _jnp.take(arena_vectors, safe, axis=0).astype(_jnp.float32)  # (Q,C,d)
    if metric == "l1":
        d = _jnp.sum(_jnp.abs(x - q[:, None, :]), axis=-1)
    else:
        dots = _jnp.einsum("qd,qcd->qc", q, x)
        if metric == "l2":
            d = _jnp.sum(x * x, axis=-1) - 2.0 * dots \
                + _jnp.sum(q * q, axis=1, keepdims=True)
            d = _jnp.maximum(d, 0.0)
        elif metric == "cosine":
            d = _jnp.clip(1.0 - dots, 0.0, 2.0)
        else:  # ip
            d = -dots
    d = _jnp.where(rows < 0, _jnp.inf, d)
    neg, pos = _jax.lax.top_k(-d, k)
    ids = _jnp.take_along_axis(rows, pos, axis=1)
    vals = -neg
    return (_jnp.where(_jnp.isinf(vals), _jnp.inf, vals),
            _jnp.where(_jnp.isinf(vals), -1, ids))


from .flat import _map_rows as _map_rows_bin, _pad_to_bucket  # noqa: E402


class BinaryQuantIndex:
    def __init__(
        self,
        arena: DeviceArena,
        rows: Optional[np.ndarray] = None,  # arena row ids; None = whole arena
        block_rows: int = 65536,
        mode: str = "exact",           # per-block candidate reduction
        query_batch: int = 1024,
        rerank: bool = True,
        rerank_mult: int = 4,          # candidate width = rerank_mult * k
        bit_metric: str = "hamming",   # "hamming" | "jaccard" (rerank=False)
        thresholds: str = "median",    # "median" | "zero" quantization pivot
        recall_target: float = 0.95,
    ):
        import jax

        assert bit_metric in ("hamming", "jaccard"), bit_metric
        self.block_rows = block_rows
        self.mode = mode
        self.query_batch = query_batch
        self.rerank = rerank
        self.rerank_mult = rerank_mult
        self.bit_metric = bit_metric
        self.recall_target = recall_target
        self._arena = arena
        self.metric = arena.metric
        self._dim = arena.dim

        if arena.host_vectors is not None:
            host_vec, host_bits = arena.host_vectors, arena.host_bits
        else:
            host_vec = np.asarray(arena.vectors, dtype=np.float32)
            host_bits = np.asarray(arena.role_bits)

        if rows is None:
            sel = np.arange(arena.n, dtype=np.int64)
        else:
            sel = np.asarray(rows, dtype=np.int64)
        self.n_rows = len(sel)
        npad = _pad_to_bucket(max(self.n_rows, 1), block_rows)
        pad = npad - self.n_rows

        v = host_vec[sel]
        # per-dim median pivot: centers the bit split for off-center
        # corpora (SIFT-family values are all-positive — a zero pivot
        # would set every bit); pgvector's binary_quantize is the zero
        # pivot, kept as an option for pre-centered embeddings.
        if thresholds == "median" and self.n_rows:
            self._thr = np.median(v, axis=0).astype(np.float32)
        else:
            self._thr = np.zeros(self._dim, dtype=np.float32)
        packed = pack_bits(v, self._thr)
        wd = packed.shape[1]
        bits = np.concatenate(
            [packed, np.zeros((pad, wd), np.uint32)]).astype(np.uint32)
        rbits = np.concatenate(
            [host_bits[sel],
             np.zeros((pad, host_bits.shape[1]), host_bits.dtype)])
        rmap = np.concatenate(
            [sel, np.full(pad, -1, dtype=np.int64)]).astype(np.int32)

        self._bits = jax.device_put(bits)
        self._rbits = jax.device_put(rbits)
        self._row_map = jax.device_put(rmap)
        self._wd = wd

    # ------------------------------------------------------------- search

    def search_deferred(self, queries: np.ndarray, query_masks: np.ndarray,
                        k: int):
        import jax.numpy as jnp

        q = np.asarray(queries, dtype=np.float32)
        if self.metric == "cosine":
            # thresholds were learned on unit-normalized arena rows; raw
            # queries (arbitrary scale) would pack near-all-ones codes and
            # collapse the hamming ranking
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                               1e-30)
        m = np.asarray(query_masks, dtype=np.uint32)
        nq = q.shape[0]
        cand_k = min(max(self.rerank_mult * k, k), self._bits.shape[0]) \
            if self.rerank else k
        qbits_all = pack_bits(q, self._thr, words=self._wd)
        bs = self.query_batch
        pending = []
        for s in range(0, nq, bs):
            e = min(s + bs, nq)
            qb = np.zeros((bs, self._wd), dtype=np.uint32)
            mb = np.zeros((bs, m.shape[1]), dtype=np.uint32)
            qb[: e - s] = qbits_all[s:e]
            mb[: e - s] = m[s:e]
            d, i = binary_topk_fn(
                jnp.asarray(qb), self._bits, self._rbits, jnp.asarray(mb),
                cand_k, self.block_rows, self.mode, self.recall_target,
                metric=self.bit_metric,
            )
            if self.rerank:
                qf = np.zeros((bs, q.shape[1]), dtype=np.float32)
                qf[: e - s] = q[s:e]
                d, i = _rerank_fn(jnp.asarray(qf), i, self._arena.vectors,
                                  self._row_map, k, self.metric)
            else:
                i = _map_rows_bin(i[:, :k], self._row_map)
                d = d[:, :k]
            pending.append((s, e, d, i))

        def finalize():
            out_d = np.empty((nq, k), dtype=np.float32)
            out_i = np.empty((nq, k), dtype=np.int64)
            for s, e, d, i in pending:
                out_d[s:e] = np.asarray(d)[: e - s]
                out_i[s:e] = np.asarray(i)[: e - s]
            return out_d, out_i

        return finalize

    def search(self, queries: np.ndarray, query_masks: np.ndarray,
               k: int) -> Tuple[np.ndarray, np.ndarray]:
        return self.search_deferred(queries, query_masks, k)()

    # ------------------------------------------------------------ storage

    def storage_bytes(self) -> Dict[str, int]:
        npad = self._bits.shape[0]
        # packed bits ARE the index; vectors stay shared in the arena
        idx = npad * (self._wd * 4 + self._rbits.shape[1] * 4 + 4)
        return {"vectors": 0, "index": int(idx)}
