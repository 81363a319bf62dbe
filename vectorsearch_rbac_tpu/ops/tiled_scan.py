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
) -> Tuple[jax.Array, jax.Array]:
    """Shared scan body: per-slot chunked int8 scan returning packed int32
    partial scores (S, q_tile, k) and arena rows. Also the local step of the
    multi-chip partition-per-chip searcher (parallel/tiled_sharded.py), so
    it must stay shard_map-compatible (no host callbacks, static shapes)."""
    s, q_tile, d = q3.shape
    chunk_rows = vec_chunks.shape[1]
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


def finish_scores(top: jax.Array, idx: jax.Array, query_norms: jax.Array,
                  inv_scale_sq: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Packed int32 partial scores -> true squared-L2 float32 (+inf / -1 on
    masked slots). query_norms broadcasts over the trailing k axis."""
    empty = top >= BIG_I32
    dists = (top + query_norms[..., None]).astype(jnp.float32) * inv_scale_sq
    dists = jnp.where(empty, jnp.inf, jnp.maximum(dists, 0.0))
    return dists, jnp.where(empty, -1, idx)


@functools.partial(jax.jit, static_argnames=("k", "chunks", "q_tile"))
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
) -> Tuple[jax.Array, jax.Array]:
    """Return (dists (S*q_tile, k) float32 ascending, arena rows (S*q_tile,
    k) int32; +inf/-1 pads). Each slot s scans chunks chunk_ids[s, :]."""
    sq, d = queries_q.shape
    s = sq // q_tile
    top, idx = tiled_scan_core(
        queries_q.reshape(s, q_tile, d), masks8.reshape(s, q_tile, -1),
        chunk_ids, vec_chunks, norm_chunks, role_chunks, row_chunks,
        k=k, chunks=chunks,
    )
    dists, idx = finish_scores(top.reshape(sq, k), idx.reshape(sq, k),
                               query_norms, inv_scale_sq)
    return dists, idx
