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

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional, Tuple

import numpy as np

from ..core import DeviceArena
from ..utils.logger import get_logger

logger = get_logger("index.flat_int8")


_GATHER_FN = None


def _gather_logical(rmap, vq, nq, r8):
    """Device-side gather of a partition's rows from the shared quant arena
    (no-copy serving). Pad slots (rmap < 0) get zero role one-hots, so the
    fused kernel's admissibility matmul rejects them for every query."""
    global _GATHER_FN
    if _GATHER_FN is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def _go(rmap, vq, nq, r8):
            safe = jnp.maximum(rmap, 0)
            v = jnp.take(vq, safe, axis=0)
            n = jnp.take(nq, safe, axis=0)
            r = jnp.where((rmap >= 0)[:, None],
                          jnp.take(r8, safe, axis=0), jnp.int8(0))
            return v, n, r

        _GATHER_FN = _go
    return _GATHER_FN(rmap, vq, nq, r8)


_JITS = None


def _lazy_jits():
    """Build the per-batch fused dispatch once (jax imported lazily)."""
    global _JITS
    if _JITS is not None:
        return _JITS
    import functools

    import jax
    import jax.numpy as jnp

    from ..ops.pallas_scan_int8 import (
        expand_masks_device, int8_masked_topk, int8_masked_topk_wide,
        pack_results_device,
    )

    @functools.partial(
        jax.jit,
        static_argnames=("batch", "d", "w", "r_pad", "use_table",
                         "has_bias", "dq", "qhalf", "dres", "res4",
                         "k", "kk", "q_tile", "block_rows", "group",
                         "merge", "interpret", "metric", "kernel_metric",
                         "wide", "id_bits", "wire", "rerank",
                         "score_shift", "mask_sb", "d_chunk"))
    def _scan_pack(buf_all, bidx, vq, nq_, r8, row_map, inv, mirror_vec,
                   mirror_norms, q_dequant, center, user_table,
                   batch, d, w, r_pad, use_table, has_bias, dq, k, kk,
                   q_tile, block_rows, group, merge, interpret, metric,
                   kernel_metric, wide, id_bits, wire, rerank,
                   score_shift=0, qhalf=False, dres=0, mask_sb=0,
                   d_chunk=0, res4=False):
        """ONE dispatch per batch: slice this batch's packed uint8 row out
        of the pass buffer (int8 queries + uint16 user ids OR uint32 mask
        bitsets [+ bias] [+ f32 queries]), unpack, run the fused kernel,
        optional f32 rerank, local->arena id map, wire-pack. The pass
        buffer is ONE host->device transfer: every tunnel call is a fresh
        draw against multi-second stall events (scripts/pass_stability.py
        measured per-batch uploads stalling 4 of 12 passes), so call
        count is minimized even at the cost of a serial upload head.
        Query norms never travel: sum(q8^2) is exact int32 on device, and
        with a resident (num_users, W) mask table a query's RBAC context
        is a 2-byte user id — 130 B/query on the wire instead of 148
        (the pass is tunnel-bandwidth-bound end to end)."""
        buf = jax.lax.dynamic_index_in_dim(buf_all, bidx, axis=0,
                                           keepdims=False)
        off = 0
        q8b = jax.lax.bitcast_convert_type(
            buf[off:off + batch * d].reshape(batch, d), jnp.int8)
        off += batch * d
        if kernel_metric == "l2":
            qnb = jnp.sum(jnp.square(q8b.astype(jnp.int32)), axis=1)
        else:
            qnb = jnp.zeros((batch,), jnp.int32)
        if use_table:
            uids = jax.lax.bitcast_convert_type(
                buf[off:off + batch * 2].reshape(batch, 2), jnp.uint16)
            off += batch * 2
            mk = jnp.take(user_table, uids.astype(jnp.int32), axis=0)
        else:
            mk = jax.lax.bitcast_convert_type(
                buf[off:off + batch * 4 * w].reshape(batch, w, 4),
                jnp.uint32)
            off += batch * 4 * w
        bias_b = None
        inv_b = None
        if has_bias:
            bias_b = jax.lax.bitcast_convert_type(
                buf[off:off + batch * 4].reshape(batch, 4), jnp.float32)
            off += batch * 4
            inv_b = jax.lax.bitcast_convert_type(
                buf[off:off + batch * 4].reshape(batch, 4), jnp.float32)
            off += batch * 4
        r8_b = r4_b = None
        if dres and res4:
            # nibble RESIDUAL wire: dres bytes carry 2*dres 4-bit codes
            # (component 2j low nibble, 2j+1 high) — a ~12-bit query at
            # half the residual8 bytes (core.ArenaQuant.query_residual4)
            r4_b = buf[off:off + batch * dres].reshape(batch, dres)
            off += batch * dres
        elif dres:
            # int8 RESIDUAL wire: one extra byte per component upgrades the
            # kernel's int8 query to ~16-bit fixed point for the rerank
            # (q8 + r8/254) — finer than f16 at half of f16's extra bytes
            r8_b = jax.lax.bitcast_convert_type(
                buf[off:off + batch * dres].reshape(batch, dres), jnp.int8)
            off += batch * dres
        qf_b = None
        if dq:
            if qhalf:
                # f16 rerank-query wire: half the f32 upload; ~5e-4
                # relative per component - far below the corpus int8
                # error the rerank corrects (the DEQUANTIZED rebuild it
                # replaces carried the batch-max scale's ~3-5 %/component
                # noise, which capped cohere recall@100 at 0.984 while
                # f32-shipped queries measured 0.9963; scripts/
                # cohere_bisect.py)
                qf_b = jax.lax.bitcast_convert_type(
                    buf[off:off + batch * 2 * dq].reshape(batch, dq, 2),
                    jnp.float16).astype(jnp.float32)
            else:
                qf_b = jax.lax.bitcast_convert_type(
                    buf[off:off + batch * 4 * dq].reshape(batch, dq, 4),
                    jnp.float32)
        m8b = expand_masks_device(mk, r_pad)
        extra = {}
        if mask_sb:
            # admit-dedup: the host interleaved same-mask queries into
            # sub-block slots; derive each slot's one-hot from the slot's
            # FIRST query (slot r of tile t = local query t*q_tile + r%nsb)
            nsb = q_tile // mask_sb
            slots = np.arange(batch // mask_sb)
            first_q = (slots // nsb) * q_tile + slots % nsb
            m8b = jnp.take(m8b, jnp.asarray(first_q, np.int32), axis=0)
            extra["mask_sub_block"] = mask_sb

        kern = int8_masked_topk_wide if wide else int8_masked_topk
        if wide and d_chunk:
            extra["d_chunk"] = d_chunk
        dd, ii = kern(
            q8b, qnb, vq, nq_, r8, m8b,
            inv if inv_b is None else inv_b, kk,
            q_tile=q_tile, block_rows=block_rows, group=group, merge=merge,
            interpret=interpret, metric=kernel_metric, query_bias=bias_b,
            score_shift=score_shift, **extra,
        )
        if row_map is not None:
            # translate local -> arena rows BEFORE rerank: the mirror
            # arrays are the ARENA's full-precision mirrors, so a
            # partitioned index (gathered or logical) must gather them by
            # arena row, not by local id
            ii = jnp.where(ii < 0, -1,
                           jnp.take(row_map, jnp.maximum(ii, 0)))
            row_map = None
        if rerank:   # rerank tier
            if qf_b is not None:
                qf = qf_b
            elif r8_b is not None:
                # residual rebuild: (q8 + r8/254) / qs_q — ip/cosine only
                # (per-query scales guarantee |r| <= 0.5; inv_b * q_dequant
                # = 1/qs_q)
                q16 = (q8b.astype(jnp.float32)
                       + r8_b.astype(jnp.float32) * jnp.float32(1 / 254.0))
                qf = (q16 * (inv_b * q_dequant)[:, None]
                      )[:, : mirror_vec.shape[1]]
            elif r4_b is not None:
                # nibble-residual rebuild: q8 + (code - 8)/15
                lo = (r4_b & 0xF).astype(jnp.float32) - 8.0
                hi = (r4_b >> 4).astype(jnp.float32) - 8.0
                r = jnp.stack([lo, hi], axis=2).reshape(batch, 2 * dres)
                q12 = q8b.astype(jnp.float32) + r * jnp.float32(1 / 15.0)
                qf = (q12 * (inv_b * q_dequant)[:, None]
                      )[:, : mirror_vec.shape[1]]
            else:
                # dequantized-query rerank: rebuild ~the float query from
                # its int8 code on device instead of shipping it (wide-d
                # corpora would otherwise pay d*4 B/query of upload;
                # query rounding error is <= 0.5/q_scale per component —
                # far below the corpus quantization error rerank exists
                # to undo)
                if metric == "l2":
                    qf = (q8b.astype(jnp.float32) * q_dequant
                          + center[None, :])[:, : mirror_vec.shape[1]]
                else:
                    # per-query rebuild: q8 / qs_q = q8 * inv_q * scale
                    qf = (q8b.astype(jnp.float32)
                          * (inv_b * q_dequant)[:, None]
                          )[:, : mirror_vec.shape[1]]
            if metric == "cosine":
                qf = qf / jnp.maximum(
                    jnp.linalg.norm(qf, axis=1, keepdims=True), 1e-30)
            safe = jnp.maximum(ii, 0)
            x = jnp.take(mirror_vec, safe, axis=0).astype(jnp.float32)
            dots = jnp.einsum("qd,qkd->qk", qf, x,
                              preferred_element_type=jnp.float32)
            if metric == "l2":
                nrm = jnp.take(mirror_norms, safe, axis=0)
                d2 = jnp.maximum(
                    nrm - 2.0 * dots
                    + jnp.sum(qf * qf, axis=1, keepdims=True), 0.0)
            elif metric == "cosine":
                d2 = jnp.clip(1.0 - dots, 0.0, 2.0)
            else:
                d2 = -dots
            d2 = jnp.where(ii >= 0, d2, jnp.inf)
            neg, pos = jax.lax.top_k(-d2, k)
            dd = -neg
            ii = jnp.take_along_axis(ii, pos, axis=1)
        if row_map is not None:
            ii = jnp.where(ii < 0, -1,
                           jnp.take(row_map, jnp.maximum(ii, 0)))
        return pack_results_device(dd[:, :k], ii[:, :k], id_bits=id_bits,
                                   dist=wire)

    _JITS = _scan_pack
    return _JITS


def _scan_pack_batch(*a, **kw):
    return _lazy_jits()(*a, **kw)


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
        dist16: bool = True,   # legacy wire flag: bf16 (True) / f32 (False)
        wire: Optional[str] = None,  # "ids" | "u8" | "bf16" | "f32" —
                               # overrides dist16. u8 (per-query affine
                               # distance code, 3.6 B/result) measured 40k ->
                               # 71k QPS on the 16k-query 1M pass
                               # (scripts/r3_perf_lab.py). "ids" drops the
                               # distance section entirely (2.52 B/result;
                               # host gets rank pseudo-dists) — exact parity
                               # with the reference baseline's id-only result
                               # path (main_role_partition_comparison.cpp:629
                               # vector<pair<doc,block>>). f32 for partition
                               # tiers feeding a cross-partition merge.
        rerank_dequant: Optional[bool] = None,  # legacy bool form of
                               # rerank_mode: True="dequant", False="f16"
        rerank_mode: Optional[str] = None,  # rerank query source:
                               # "dequant"  rebuild ~the float query from
                               #            its int8 code (0 extra upload
                               #            bytes; ~0.5/q_scale/component
                               #            rounding noise),
                               # "residual" int8 residual wire (+1 B/comp):
                               #            ~16-bit fixed-point rebuild —
                               #            finer than f16 at half f16's
                               #            extra bytes (the wide-d default
                               #            since round 4; measured on
                               #            cohere 1M x 768: see
                               #            results/cohere_768d_1m_r4.json),
                               # "f16"/"f32" ship the query (+2/+4 B/comp)
        merge: str = "pallas",  # group-minima merge: "pallas" (all-Pallas
                               # subgroup extraction + bitonic pairs sort,
                               # output-identical to the cascade at 3.8x
                               # up to exact packed-value ties within a
                               # subgroup, where the extraction collapses
                               # duplicates — ops/pallas_merge.py; auto-
                               # falls-back to cascade on shapes the gate
                               # rejects),
                               # "cascade" (two-stage XLA top_k; miss
                               # probability ~1e-13), "auto"
                               # (exact/approx by n_groups), "exact",
                               # "approx"
        logical: bool = False,  # no-copy mode: keep only the row map on
                                # device and gather the partition's int8
                                # rows from the SHARED arena at query time
                                # (the flat-scan analog of the reference's
                                # pointer partitions over one shared vector
                                # table, shared_vector_table.h:18) — trades
                                # a per-pass gather for zero duplication
        mask_dedup: bool = True,  # admit-dedup: group queries by RBAC
                                # mask into interleaved sub-block slots so
                                # the kernel's admissibility matmul
                                # shrinks mask_sb-fold (RBAC workloads
                                # have far fewer distinct masks than
                                # queries); bit-identical results,
                                # auto-skipped when the mask population
                                # is too fragmented to pay
    ):
        import jax

        assert arena.quant is not None, (
            "Int8FlatIndex needs an int8-quantized arena"
        )
        q = arena.quant
        self.metric = arena.metric
        # packed-epilogue invariant (score << 7 | lane needs |score| < 2^23):
        # the kernels right-shift scores by q.score_shift first, which
        # makes the bound hold at full int8 resolution for any width
        self.score_shift = q.score_shift
        assert (3 * q.vectors_q.shape[1] * q.qclip**2) >> self.score_shift \
            < 2**23, (q.qclip, q.vectors_q.shape[1], self.score_shift)
        self._arena = arena
        self.query_batch = query_batch
        self.q_tile = min(q_tile, query_batch)
        self.block_rows = block_rows
        self.group = group

        # VMEM discipline. Narrow corpora (d <= 256) stream full (rows, d)
        # blocks; the shrink loops keep them inside Mosaic's 16 MB scoped
        # VMEM (limits probed on-chip: scripts/wide_d_probe.py). Wide
        # corpora (768-d cohere shapes) switch to the d-SPLIT kernel
        # (ops/pallas_scan_int8.int8_masked_topk_wide): the reduction
        # dimension joins the grid and partial dots accumulate in a VMEM
        # scratch, so row/query tiles stay full-size instead of shrinking
        # ~8x (the round-2 1.3k-QPS limiter, PERF.md 768-d section).
        d_pad = q.vectors_q.shape[1]
        unit = d_pad + q.r_pad
        self.wide = d_pad > 256
        self.d_chunk = 0
        if self.wide:
            self.block_rows = min(self.block_rows, 2048)
            self.q_tile = min(self.q_tile, 512)
            # accumulator scratch (block_rows, q_tile) int32 <= ~4.5 MB
            while (self.block_rows > 512
                   and self.block_rows * self.q_tile * 4 > 4_500_000):
                self.block_rows //= 2
            # d_chunk: the LARGEST 128-multiple dividing d_pad whose
            # (block_rows, d_chunk) x-block fits the per-buffer budget.
            # At 768-d/br2048 that is the whole row (nk=1): the single-
            # chunk sweep measured 29.9 ms vs the old dc256 default's
            # 42.8 ms per 16k q x 262k rows — the d-split grid re-fetched
            # the accumulator state every chunk step for nothing
            # (results/r5_wide_roofline.json). The split only engages
            # when d is too wide for VMEM (d_pad * block_rows > budget).
            dc = min(d_pad, max(128, 3_700_000 // self.block_rows
                                // 128 * 128))
            while d_pad % dc:
                dc -= 128
            self.d_chunk = dc
        else:
            while self.block_rows > 1024 and self.block_rows * unit > 3_700_000:
                self.block_rows //= 2
            while self.q_tile > 256 and self.q_tile * unit > 940_000:
                self.q_tile //= 2
        block_rows = self.block_rows
        # non-l2 metrics quantize queries lossily (own per-call scale) —
        # rerank restores exact order from the full-precision mirror
        self.rerank = ((not q.lossless or self.metric != "l2")
                       if rerank is None else rerank)
        self.rerank_margin = rerank_margin
        self.dist16 = dist16
        self.wire = wire or ("bf16" if dist16 else "f32")
        # The ids wire carries NO distance section: unpack_results_host
        # synthesizes rank pseudo-distances (0..k-1), which are wrong for
        # any cross-index merge or radius logic. Partition engines pin
        # their tiers to real-distance wires (partition/base.py); refuse
        # the combination here so it can't arise by config (ADVICE r4).
        if self.wire == "ids" and rows is not None:
            raise ValueError(
                "wire='ids' returns rank pseudo-distances and cannot be "
                "used on a partitioned Int8FlatIndex whose results get "
                "merged — use 'u8'/'bf16'/'f32' for partition tiers")
        self.merge = merge
        self.mask_dedup = mask_dedup
        self.mask_sb = 16  # slot width; 16 measured best (2% padding on
                           # the tree-RBAC workload, scan 20.9 -> 16.0 ms)
        # rerank-query source. Round-3 measurements (cohere 1M x 768
        # cosine, 16k queries, scripts/cohere_bisect.py): per-QUERY-scale
        # dequant 0.9855 @ 20.8k QPS; shipped f16 queries 0.9924 @ 9.0k
        # (f16 adds 1.5 KB/query to a tunnel-bandwidth-bound pass);
        # shipped f32 0.9963; no rerank 0.9765. The BATCH-scale dequant
        # rebuild capped recall at 0.9839 — one outlier component in the
        # batch coarsened every query's rebuild — which is why
        # quantize_queries_ip keeps per-query scales. Round 4 added the
        # int8 RESIDUAL wire (+1 B/component): ~16-bit fixed-point rebuild,
        # finer than f16 at half its extra bytes. Round 5's NIBBLE wire
        # (+0.5 B/component, ~12-bit rebuild) is the wide-d default: the
        # extra 4 bits were recall-saturated (0.9924 vs 0.9923 measured
        # interleaved, results/cohere_768d_1m_r5.json) while the halved
        # residual bytes buy +23% QPS on the upload-bound pass.
        if rerank_mode is None:
            if rerank_dequant is not None:
                rerank_mode = "dequant" if rerank_dequant else "f16"
            elif self.wide:
                # residual needs the per-query scales of the ip/cosine
                # quantizer (|r| <= 0.5 guaranteed); l2's GLOBAL query
                # scale can clip out-of-range components, which the
                # +-0.5-range residual cannot recover
                rerank_mode = ("residual4" if self.metric != "l2"
                               else "dequant")
            else:
                rerank_mode = "f16"
        assert rerank_mode in ("dequant", "residual", "residual4", "f16",
                               "f32")
        assert not (rerank_mode in ("residual", "residual4")
                    and self.metric == "l2"), \
            "residual rerank needs per-query scales (ip/cosine only)"
        self.rerank_mode = rerank_mode
        self.rerank_dequant = rerank_mode == "dequant"
        self.rerank_qhalf = rerank_mode == "f16"

        self.logical = logical and rows is not None
        if rows is None:
            self.n_rows = arena.n
            self._vq = q.vectors_q
            self._nq = q.norms_q
            self._r8 = q.roles8
            self._row_map = None
            self._gathered = False
        elif self.logical:
            from .flat import _pad_to_bucket

            rows = np.asarray(rows, dtype=np.int64)
            self.n_rows = len(rows)
            npad = _pad_to_bucket(max(self.n_rows, 1), block_rows)
            rmap = np.concatenate(
                [rows, np.full(npad - self.n_rows, -1)]).astype(np.int32)
            self._row_map = jax.device_put(rmap)
            self._vq = self._nq = self._r8 = None   # gathered per pass
            self._gathered = True
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
        npad_rows = (self._row_map.shape[0] if self._vq is None
                     else self._vq.shape[0])
        fit = npad_rows // 8192
        if fit >= 8:
            self.group = min(self.group, 1 << (fit.bit_length() - 1))
        else:
            self.group = 8
        # wire-format id width: results carry ARENA row ids (after _map_rows
        # in gathered mode), so size to the arena's padded row count
        self._id_bits = max((arena.n_padded - 1).bit_length(), 1)

    # ------------------------------------------------------------- search

    def set_user_table(self, user_masks: np.ndarray) -> None:
        """Upload the (num_users, W) uint32 role-bitset table ONCE so
        search_deferred can ship 2-byte user ids instead of 16-byte mask
        rows (the pass is tunnel-bandwidth-bound; see _scan_pack). Cached
        by a CONTENT digest, not id(): an in-place permission revocation
        must invalidate the resident table (serving stale masks is an
        RBAC leak), and id() can be recycled across arrays."""
        import hashlib

        import jax

        tbl = np.ascontiguousarray(np.asarray(user_masks, dtype=np.uint32))
        if tbl.ndim != 2 or tbl.shape[0] > 65536:
            # u16 wire ids can't address this table: drop any resident one
            # so searches fall back to shipped mask rows
            self._user_table = None
            self._user_table_key = None
            return
        key = (tbl.shape,
               hashlib.blake2b(tbl.tobytes(), digest_size=16).digest())
        if getattr(self, "_user_table_key", None) == key:
            return
        self._user_table = jax.device_put(tbl)
        self._user_table_key = key
        self._user_table_host = tbl  # admit-dedup groups by mask content

    def search_deferred(self, queries: np.ndarray, query_masks: np.ndarray,
                        k: int, user_ids: Optional[np.ndarray] = None):
        import jax
        import jax.numpy as jnp

        from ..ops.pallas_scan_int8 import unpack_results_host

        quant = self._quant
        if self.logical:
            # no-copy: gather this partition's rows from the shared arena
            # ONCE per pass (device-side; pad rows -> inadmissible zeros)
            vq_d, nq_d, r8_d = _gather_logical(
                self._row_map, quant.vectors_q, quant.norms_q, quant.roles8)
        else:
            vq_d, nq_d, r8_d = self._vq, self._nq, self._r8
        qf = np.asarray(queries, dtype=np.float32)
        nq = qf.shape[0]
        if nq == 0:
            return lambda: (np.empty((0, k), np.float32),
                            np.empty((0, k), np.int64))
        # the 2-byte uid wire needs a resident table covering every uid
        use_table = (user_ids is not None
                     and getattr(self, "_user_table", None) is not None
                     and nq > 0
                     and int(np.max(user_ids)) < self._user_table.shape[0])
        if use_table:
            uid16 = np.ascontiguousarray(user_ids, dtype=np.uint16)
            masks = None
        else:
            masks = np.ascontiguousarray(query_masks, dtype=np.uint32)
        # don't pad a small workload up to the full serving batch — but keep
        # a floor of 32 queries: Mosaic can't lower the degenerate (1, d)
        # int8 matmul a batch-1 dispatch would otherwise produce
        pow2 = 1 << (max(nq, 1) - 1).bit_length()
        bs = min(self.query_batch, max(pow2, 32))
        q_tile = min(self.q_tile, bs)
        kernel_metric = "l2" if self.metric == "l2" else "ip"
        # ---- admit-dedup: permute queries so each q_tile packs same-mask
        # queries into interleaved sub-block SLOTS (slot s of a tile owns
        # query positions {s, s + nsb, ...}), letting the kernel compute
        # ONE admissibility column per slot instead of per query
        # (ops/pallas_scan_int8 mask_sub_block; scan 20.9 -> 16.0 ms per
        # 8192q x 1M, bit-identical output, results/r4_admit_lab.json).
        # The wire format is unchanged — the device derives slot one-hots
        # from each slot's first query. Results scatter back at finalize.
        nq0 = nq
        # admit-dedup stays OFF on the wide path: measured at the shipping
        # 768-d geometry (results/r4_wide_admit_lab.json) the dedup variant
        # is 17% slower at ZERO padding (55.1 vs 45.7 ms / 16k q / 262k
        # rows) — the admit matmul is only r_pad/(d_pad+r_pad) ~ 14% of
        # wide-kernel MACs, and the lane-repeat + VMEM pressure cost more
        # than the shrink saves (narrow 128-d, where admit is ~50% of
        # MACs, wins 20.9 -> 16.0 ms; results/r4_admit_lab.json)
        sb = self.mask_sb if (self.mask_dedup and not self.wide) else 0
        dedup_src = dedup_valid = None
        mk_rows = None
        if sb and q_tile % sb == 0 and q_tile // sb >= 8 \
                and bs % q_tile == 0 and nq >= q_tile:
            if use_table:
                tbl_h = getattr(self, "_user_table_host", None)
                if tbl_h is not None:
                    mk_rows = tbl_h[uid16.astype(np.int64)]
            else:
                mk_rows = masks
        if mk_rows is not None:
            _, minv = np.unique(mk_rows, axis=0, return_inverse=True)
            counts = np.bincount(minv.ravel())
            s_tot = int(np.sum(-(-counts // sb)))
            nsb = q_tile // sb
            npq2 = -(-(s_tot * sb) // bs) * bs
            # pay the padding only when it is small (fragmented mask
            # populations — e.g. per-user unique masks — stay per-query)
            if npq2 <= max(bs, int(1.25 * (-(-nq // bs) * bs))):
                order = np.argsort(minv.ravel(), kind="stable")
                src = np.zeros(npq2, np.int64)
                valid = np.zeros(npq2, bool)
                ptr = slot = 0
                lanes = np.arange(sb) * nsb
                for c in counts:
                    qs = order[ptr:ptr + c]
                    ptr += int(c)
                    for s0 in range(0, int(c), sb):
                        chunk_q = qs[s0:s0 + sb]
                        t, s_in = divmod(slot, nsb)
                        idx = t * q_tile + s_in + lanes
                        src[idx] = chunk_q[0]   # pad lanes repeat the head
                        src[idx[:len(chunk_q)]] = chunk_q
                        valid[idx[:len(chunk_q)]] = True
                        slot += 1
                # tail slots keep src=0 (query 0 under its own mask) and
                # stay invalid — computed, discarded
                dedup_src, dedup_valid = src, valid
                qf = np.ascontiguousarray(qf[src])
                if use_table:
                    uid16 = np.ascontiguousarray(uid16[src])
                else:
                    masks = np.ascontiguousarray(masks[src])
                nq = npq2
        self._last_dedup = dedup_src is not None  # bench/test observability

        if self.metric == "l2":
            q8, _ = quant.quantize_queries(qf, with_norms=False)
            inv = jnp.float32(1.0 / quant.scale**2)
            bias = None
        else:
            # per-QUERY scales (core.quantize_queries_ip): inv ships in
            # the packed buffer (4 B/query) alongside bias
            q8, inv_arr, bias = quant.quantize_queries_ip(
                qf, cosine=self.metric == "cosine")
            inv = jnp.float32(0.0)  # unused; per-query inv_b on device
        r_pad = quant.r_pad
        # Mosaic kernels need a TPU; CPU (tests) runs the interpreter
        interp = jax.default_backend() == "cpu"
        wire_fmt = self.wire if (self.wire != "u8" or k % 2 == 0) else "bf16"
        kk = k + self.rerank_margin if self.rerank else k

        # ONE device_put per PASS of per-batch packed buffers stacked into
        # a (n_batches, bytes) uint8 array; each batch's fused dispatch
        # slices its own row on device. One transfer per pass matters more
        # than overlapping the upload head: every tunnel call is a fresh
        # draw against multi-second stall events (per-batch uploads stalled
        # 4 of 12 passes vs ~1 of 12 for a single upload, measured in
        # scripts/pass_stability.py), and fusing the unpack into the scan
        # dispatch removes the pass-level unpack round.
        npq = -(-nq // bs) * bs
        d_cols = q8.shape[1]
        w = (self._user_table.shape[1] if use_table else masks.shape[1])
        has_bias = bias is not None
        ship_qf = self.rerank and self.rerank_mode in ("f16", "f32")
        qhalf = self.rerank_mode == "f16"
        qf_ship = (np.ascontiguousarray(qf, dtype=np.float16)
                   if qhalf else qf)
        r8_ship = None
        res4 = self.rerank_mode == "residual4"
        if self.rerank and self.rerank_mode == "residual":
            r8_ship = quant.query_residual8(
                qf, q8, inv_arr, cosine=self.metric == "cosine")
        elif self.rerank and res4:
            r8_ship = quant.query_residual4(
                qf, q8, inv_arr, cosine=self.metric == "cosine")

        def _col(arr, width, s):
            out = np.zeros(bs * width, np.uint8)
            e = min(s + bs, nq)
            if e > s:
                out[: (e - s) * width] = (
                    np.ascontiguousarray(arr[s:e]).view(np.uint8).reshape(-1))
            return out

        def _batch_buf(s):
            seg = [_col(q8, d_cols, s)]
            if use_table:
                seg.append(_col(uid16, 2, s))
            else:
                seg.append(_col(masks, 4 * w, s))
            if has_bias:
                seg.append(_col(bias.astype(np.float32), 4, s))
                seg.append(_col(inv_arr, 4, s))
            if r8_ship is not None:
                seg.append(_col(r8_ship, r8_ship.shape[1], s))
            if ship_qf:
                seg.append(_col(qf_ship, (2 if qhalf else 4) * qf.shape[1],
                                s))
            return np.concatenate(seg)

        buf_all = jax.device_put(
            np.stack([_batch_buf(s) for s in range(0, npq, bs)]))
        if self.metric == "l2":
            q_dequant = jnp.float32(1.0 / quant.scale)
            center_d = jnp.asarray(np.concatenate(
                [quant.center.astype(np.float32),
                 np.zeros(d_cols - len(quant.center), np.float32)]))
        else:
            # quantize_queries_ip: q8 = round(q * qs_q), inv_q = 1/(qs_q *
            # scale); the device rebuild multiplies q8 by inv_q * scale =
            # 1/qs_q, so q_dequant carries the corpus scale constant
            q_dequant = jnp.float32(quant.scale)
            center_d = jnp.zeros(d_cols, jnp.float32)

        mirror_vec = self._arena.vectors if self.rerank else None
        mirror_norms = self._arena.norms if self.rerank else None
        # Fetch threads start PULLING as dispatches are enqueued, not at
        # finalize: copy_to_host_async is a no-op through the tunnel, so a
        # finalize-time fetch would serialize the whole 360 B/query result
        # stream AFTER the last kernel instead of riding in its shadow.
        # Each np.asarray blocks until its batch's dispatch completes; 8
        # threads keep ~75 MB/s of concurrent streams (vs 27.9 single,
        # scripts/r3_perf_lab.py section A) overlapping later batches'
        # compute.
        n_batches = -(-npq // bs)
        pool = (ThreadPoolExecutor(min(n_batches, 8))
                if n_batches > 1 else None)
        pending = []
        for bi, s in enumerate(range(0, npq, bs)):
            wire = _scan_pack_batch(
                buf_all, jnp.int32(bi),
                vq_d, nq_d, r8_d, self._row_map, inv,
                mirror_vec, mirror_norms, q_dequant, center_d,
                self._user_table if use_table else None,
                batch=bs, d=d_cols, w=w, r_pad=r_pad,
                use_table=use_table, has_bias=has_bias,
                dq=qf.shape[1] if ship_qf else 0, qhalf=qhalf,
                dres=r8_ship.shape[1] if r8_ship is not None else 0,
                res4=res4,
                k=k, kk=kk, q_tile=q_tile,
                block_rows=self.block_rows, group=self.group,
                merge=self.merge, interpret=interp, metric=self.metric,
                kernel_metric=kernel_metric, wide=self.wide,
                id_bits=self._id_bits, wire=wire_fmt, rerank=self.rerank,
                score_shift=self.score_shift,
                mask_sb=sb if dedup_src is not None else 0,
                d_chunk=self.d_chunk,
            )
            fut = pool.submit(np.asarray, wire) if pool is not None else wire
            pending.append((s, min(s + bs, nq), fut))

        def finalize():
            out_d = np.empty((nq, k), dtype=np.float32)
            out_i = np.empty((nq, k), dtype=np.int64)
            try:
                for s, e, fut in pending:
                    w = fut.result() if pool is not None else np.asarray(fut)
                    d, i = unpack_results_host(w, k, id_bits=self._id_bits,
                                               dist=wire_fmt)
                    out_d[s:e] = d[: e - s]
                    out_i[s:e] = i[: e - s]
            finally:
                if pool is not None:
                    pool.shutdown()
            if dedup_src is not None:
                # scatter the mask-grouped (padded) rows back to caller
                # order; pad/dummy rows are dropped
                od = np.empty((nq0, k), dtype=np.float32)
                oi = np.empty((nq0, k), dtype=np.int64)
                od[dedup_src[dedup_valid]] = out_d[dedup_valid]
                oi[dedup_src[dedup_valid]] = out_i[dedup_valid]
                return od, oi
            return out_d, out_i

        return finalize

    def search(self, queries, query_masks, k) -> Tuple[np.ndarray, np.ndarray]:
        return self.search_deferred(queries, query_masks, k)()

    # ------------------------------------------------------------ storage

    def storage_bytes(self) -> Dict[str, int]:
        if not self._gathered:
            return {"vectors": 0, "index": 0}  # arena-shared, counted there
        if self.logical:
            # no-copy: the row map is the whole per-partition footprint
            return {"vectors": 0, "index": int(self._row_map.shape[0] * 4)}
        npad, d = self._vq.shape
        r = self._r8.shape[1]
        vec = npad * d          # int8
        aux = npad * (r + 4 + 4)
        return {"vectors": int(vec), "index": int(aux)}
