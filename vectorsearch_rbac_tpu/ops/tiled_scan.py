"""Tiled contiguous partitioned scan (int8): the packed-v2 execution engine.

Replaces the round-1 probed-gather path (ops/ivf_scan.probed_topk used by
partition/packed.py), whose per-(query, partition) row gather re-read every
partition once PER QUERY (~9.4 GB HBM per 1024-query ROLE batch). Here each
partition's rows are stored once, contiguously, in fixed-size CHUNKS, and
queries are grouped into per-partition tiles: HBM traffic is
(#query-tiles x partition bytes) — the q_tile-fold amortization the gather
path could not express.

This is the TPU-native analog of the reference's per-partition SQL scans
(controller/dynamic_partition/search.py per-partition ORDER BY vector <->
q LIMIT k, controller/baseline/prefilter/prefilter_role.py) executed as a
single batched dispatch per size bucket.

Permission semantics: admissibility is a second int8 matmul over role
one-hots (same trick as ops/pallas_scan_int8) — needed because dynamic
(AnonySys) partitions may hold rows a given comb cannot read (the
reference's per-partition RLS-when-needed, load_result_to_database.py:590).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

BIG_I32 = jnp.int32(2**30)


def tiled_scan_core(
    q3: jax.Array,           # (S, q_tile, d) int8
    m3: jax.Array,           # (S, q_tile, R_pad) int8
    chunk_ids: jax.Array,    # (S, chunks) int32; 0 = dummy all-masked chunk
    vec_chunks: jax.Array,   # (LC, chunk_rows, d) int8
    norm_chunks: jax.Array,  # (LC, chunk_rows) int32
    role_chunks: jax.Array,  # (LC, chunk_rows, R_pad) int8; all-zero = pad
    row_chunks: jax.Array,   # (LC, chunk_rows) int32 arena rows, -1 = pad
    k: int,
    chunks: int,
    score_shift: int = 0,    # static score >> shift before any pack
                             # (core.score_shift_for — wide-d corpora at
                             # full int8 resolution)
    scan_group: int = 0,     # 0 = exact per-chunk top-k; g > 0 = packed
                             # group-min epilogue (the flagship kernel's
                             # trick): per chunk keep one packed
                             # (score << log2(g) | lane) minimum per g
                             # rows, defer the ONLY top_k to the very end.
                             # Replaces `chunks` sequential 7-ms lax.top_k
                             # calls with reshape+min (~10x device_scan);
                             # recall loss is group-min collisions,
                             # ~C(k,2) * g / partition_rows.
) -> Tuple[jax.Array, jax.Array]:
    """Shared scan body: per-slot chunked int8 scan returning packed int32
    partial scores (S, q_tile, k) and arena rows. Also the local step of the
    multi-chip partition-per-chip searcher (parallel/tiled_sharded.py), so
    it must stay shard_map-compatible (no host callbacks, static shapes)."""
    s, q_tile, d = q3.shape
    chunk_rows = vec_chunks.shape[1]
    if scan_group and scan_group < chunk_rows:
        return _tiled_scan_grouped(
            q3, m3, chunk_ids, vec_chunks, norm_chunks, role_chunks,
            row_chunks, k, chunks, scan_group, score_shift)
    kk = min(k, chunk_rows)

    def step(_, c):
        ids = chunk_ids[:, c]                          # (S,)
        x = jnp.take(vec_chunks, ids, axis=0)          # (S, C, d)
        nrm = jnp.take(norm_chunks, ids, axis=0)       # (S, C)
        r8 = jnp.take(role_chunks, ids, axis=0)        # (S, C, R)
        rows = jnp.take(row_chunks, ids, axis=0)       # (S, C)
        dots = jnp.einsum("sqd,scd->sqc", q3, x,
                          preferred_element_type=jnp.int32)
        admit = jnp.einsum("sqr,scr->sqc", m3, r8,
                           preferred_element_type=jnp.int32)
        score = nrm[:, None, :] - 2 * dots             # (S, Q, C) int32
        score = jnp.where(admit > 0, score, BIG_I32)
        neg, pos = jax.lax.top_k(-score, kk)
        rid = jnp.take_along_axis(
            jnp.broadcast_to(rows[:, None, :], score.shape), pos, axis=2)
        return None, (-neg, rid)

    _, (vals, rids) = jax.lax.scan(step, None, jnp.arange(chunks))
    # (chunks, S, Q, kk) -> (S, Q, chunks * kk)
    vals = jnp.transpose(vals, (1, 2, 0, 3)).reshape(s, q_tile, chunks * kk)
    rids = jnp.transpose(rids, (1, 2, 0, 3)).reshape(s, q_tile, chunks * kk)
    if chunks * kk < k:
        pad = k - chunks * kk
        vals = jnp.concatenate(
            [vals, jnp.full((s, q_tile, pad), BIG_I32)], axis=2)
        rids = jnp.concatenate(
            [rids, jnp.full((s, q_tile, pad), -1, rids.dtype)], axis=2)
    neg, pos = jax.lax.top_k(-vals, k)
    top = -neg                                          # (S, Q, k) int32
    idx = jnp.take_along_axis(rids, pos, axis=2)        # (S, Q, k)
    return top, idx


def _tiled_scan_grouped(
    q3, m3, chunk_ids, vec_chunks, norm_chunks, role_chunks, row_chunks,
    k: int, chunks: int, g: int, score_shift: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Grouped-epilogue variant of tiled_scan_core (see scan_group above).

    Packs (score << shift | lane-in-group) so a g-row group reduces to one
    int32 min; the packed value's low bits recover the winning row."""
    s, q_tile, d = q3.shape
    chunk_rows = vec_chunks.shape[1]
    assert chunk_rows % g == 0 and (g & (g - 1)) == 0
    shift = max(g - 1, 1).bit_length()                 # bits for lane
    gpc = chunk_rows // g                              # groups per chunk
    # packed sentinel: larger than any packed admissible score
    # (|score| < 2^24 for int8 d<=512 corpora; << shift keeps int32 range
    # for g <= 64)
    masked = jnp.int32(0x7F000000)
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (s, q_tile, gpc, g), 3)

    def step(_, c):
        ids = chunk_ids[:, c]                          # (S,)
        x = jnp.take(vec_chunks, ids, axis=0)          # (S, C, d)
        nrm = jnp.take(norm_chunks, ids, axis=0)       # (S, C)
        r8 = jnp.take(role_chunks, ids, axis=0)        # (S, C, R)
        dots = jnp.einsum("sqd,scd->sqc", q3, x,
                          preferred_element_type=jnp.int32)
        admit = jnp.einsum("sqr,scr->sqc", m3, r8,
                           preferred_element_type=jnp.int32)
        score = nrm[:, None, :] - 2 * dots             # (S, Q, C) int32
        if score_shift:
            score = jax.lax.shift_right_arithmetic(score, score_shift)
        s4 = score.reshape(s, q_tile, gpc, g)
        a4 = admit.reshape(s, q_tile, gpc, g)
        packed = jnp.where(
            a4 > 0, jax.lax.shift_left(s4, shift) | lane, masked)
        return None, jnp.min(packed, axis=3)           # (S, Q, gpc)

    _, mins = jax.lax.scan(step, None, jnp.arange(chunks))
    # (chunks, S, Q, gpc) -> (S, Q, chunks * gpc)
    mins = jnp.transpose(mins, (1, 2, 0, 3)).reshape(
        s, q_tile, chunks * gpc)
    kk = min(k, chunks * gpc)
    neg, pos = jax.lax.top_k(-mins, kk)
    vals = -neg                                        # (S, Q, kk)
    if kk < k:
        vals = jnp.concatenate(
            [vals, jnp.full((s, q_tile, k - kk), masked)], axis=2)
        pos = jnp.concatenate(
            [pos, jnp.zeros((s, q_tile, k - kk), pos.dtype)], axis=2)
    c_idx = pos // gpc                                 # which chunk step
    grp = pos % gpc                                    # group within chunk
    in_lane = vals & (g - 1)
    top = jax.lax.shift_right_arithmetic(vals, shift)  # true int32 score
    if score_shift:
        top = jax.lax.shift_left(top, score_shift)     # restore magnitude
    top = jnp.where(vals >= masked, BIG_I32, top)
    cids = jnp.take_along_axis(
        jnp.broadcast_to(chunk_ids[:, None, :], (s, q_tile, chunks)),
        c_idx, axis=2)                                 # (S, Q, k)
    flat_rows = row_chunks.reshape(-1)
    idx = flat_rows[cids * chunk_rows + grp * g + in_lane]
    idx = jnp.where(vals >= masked, -1, idx)
    return top, idx


def finish_scores(top: jax.Array, idx: jax.Array, query_norms: jax.Array,
                  inv_scale_sq: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Packed int32 partial scores -> true squared-L2 float32 (+inf / -1 on
    masked slots). query_norms broadcasts over the trailing k axis."""
    empty = top >= BIG_I32
    dists = (top + query_norms[..., None]).astype(jnp.float32) * inv_scale_sq
    dists = jnp.where(empty, jnp.inf, jnp.maximum(dists, 0.0))
    return dists, jnp.where(empty, -1, idx)


@functools.partial(jax.jit,
                   static_argnames=("k", "chunks", "q_tile", "scan_group",
                                    "score_shift"))
def tiled_bucket_topk(
    queries_q: jax.Array,    # (S * q_tile, d) int8 — queries grouped by slot
    query_norms: jax.Array,  # (S * q_tile,) int32
    masks8: jax.Array,       # (S * q_tile, R_pad) int8 user one-hots
    chunk_ids: jax.Array,    # (S, chunks) int32; 0 = dummy all-masked chunk
    vec_chunks: jax.Array,
    norm_chunks: jax.Array,
    role_chunks: jax.Array,
    row_chunks: jax.Array,
    inv_scale_sq: jax.Array,  # () float32
    k: int,
    chunks: int,
    q_tile: int,
    scan_group: int = 0,
    score_shift: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Return (dists (S*q_tile, k) float32 ascending, arena rows (S*q_tile,
    k) int32; +inf/-1 pads). Each slot s scans chunks chunk_ids[s, :]."""
    sq, d = queries_q.shape
    s = sq // q_tile
    top, idx = tiled_scan_core(
        queries_q.reshape(s, q_tile, d), masks8.reshape(s, q_tile, -1),
        chunk_ids, vec_chunks, norm_chunks, role_chunks, row_chunks,
        k=k, chunks=chunks, scan_group=scan_group, score_shift=score_shift,
    )
    dists, idx = finish_scores(top.reshape(sq, k), idx.reshape(sq, k),
                               query_norms, inv_scale_sq)
    return dists, idx
