"""Fused RBAC-masked distance scan with on-device top-k.

This is the framework's flagship op. It replaces, at once:

- pgvector's sequential/HNSW scans gated by RLS policies (reference
  pgvector/src/hnswscan.c + controller/baseline/pg_row_security/
  row_level_security.py:54-65): the permission check compiles to a bitwise
  AND between each vector's role bitset and the query's user mask, fused
  into the distance computation;
- the ACORN benchmark's per-query permission bitmap filter (reference
  acorn_benchmark/src/benchmark_utils.cpp:342-392);
- exact ground-truth kNN (reference basic_benchmark/common_function.py:671
  Postgres brute force / :573 FAISS IndexFlatL2) — `mode="exact"`.

Design (TPU-first): the corpus lives in HBM as (N, d); the scan runs as a
`lax.scan` over row-blocks so XLA pipelines HBM->VMEM prefetch with MXU
matmuls. Distances are computed as ||x||^2 - 2 q.x (the ||q||^2 term is
constant per query and added back at the end), masked by the fused
permission check, then merged into a running top-k. Two merge modes:

- "exact": lax.top_k over (k + B) candidates per block — the oracle;
- "approx": lax.approx_min_k (XLA PartialReduce, runs at near peak on the
  TPU's VPU) per block, then exact merge of (k + k) — the serving path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

INF = jnp.inf


def masked_scan_topk(
    queries: jax.Array,        # (Q, d) float32
    vectors: jax.Array,        # (Npad, d) compute dtype, Npad % block_rows == 0
    norms: jax.Array,          # (Npad,) float32 squared norms
    role_bits: jax.Array,      # (Npad, W) uint32; all-zero rows are never returned
    query_masks: jax.Array,    # (Q, W) uint32 user role masks
    k: int,
    block_rows: int = 16384,
    mode: str = "exact",
    recall_target: float = 0.99,
    metric: str = "l2",     # "l2" | "ip" | "cosine" | "l1" — the pgvector
                            # operator family (<-> / <#> / <=> / <+>,
                            # reference pgvector/src/vector.c). "cosine"
                            # expects UNIT corpus rows (core.
                            # build_device_arena normalizes at ingest) and
                            # normalizes queries here. "l1" has no matmul
                            # form: it runs the broadcast |x-q| reduce on
                            # the VPU (XLA fuses sub/abs/sum into one pass
                            # over each block — use smaller block_rows).
) -> Tuple[jax.Array, jax.Array]:
    """Return (dists (Q, k) ascending in the metric's distance — squared L2,
    negative inner product (pgvector <#>), or cosine distance 1-cos — and
    idx (Q, k) int32). Slots with no admissible vector get dist=+inf and
    idx=-1."""
    q = queries.astype(jnp.float32)
    if metric == "cosine":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    npad, d = vectors.shape
    assert npad % block_rows == 0, (npad, block_rows)
    nb = npad // block_rows
    qn = jnp.sum(q * q, axis=1, keepdims=True)

    compute_dtype = vectors.dtype
    qc = q.astype(compute_dtype)

    vec_blocks = vectors.reshape(nb, block_rows, d)
    norm_blocks = norms.reshape(nb, block_rows)
    bit_blocks = role_bits.reshape(nb, block_rows, -1)
    offsets = (jnp.arange(nb, dtype=jnp.int32) * block_rows)

    # exact mode is the ground-truth oracle: force full-f32 MXU passes.
    # TPU f32 matmuls default to bf16 decomposition (~1e-3 relative error),
    # enough to swap near-ties at the k boundary.
    precision = jax.lax.Precision.HIGHEST if mode == "exact" else None

    def body(_, xs):
        xb, nb_, bb, off = xs
        # scores monotone in the metric's distance per query:
        # l2: ||x||^2 - 2 q.x ; ip/cosine: -q.x ; l1: sum |x - q|
        if metric == "l1":
            scores = jnp.sum(
                jnp.abs(xb[None, :, :].astype(jnp.float32) - q[:, None, :]),
                axis=-1,
            )
        else:
            dots = jax.lax.dot_general(
                qc, xb,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            scores = (nb_[None, :] - 2.0 * dots) if metric == "l2" else -dots
        # fused RBAC check: any shared role bit between user mask and row bits
        hit = jnp.bitwise_and(query_masks[:, None, :], bb[None, :, :])
        allowed = jnp.any(hit != 0, axis=-1)
        scores = jnp.where(allowed, scores, INF)

        # Per-block reduction only — no running merge inside the scan (a
        # per-block (2k) top_k merge doubled wall time on device; the single
        # deferred merge below is far cheaper). Candidate ids derive from
        # positions, never a materialized (Q, block) index matrix.
        if mode == "approx":
            bvals, bpos = jax.lax.approx_min_k(scores, k, recall_target=recall_target)
        else:
            neg, bpos = jax.lax.top_k(-scores, k)
            bvals = -neg
        bidx = bpos.astype(jnp.int32) + off
        return None, (bvals, bidx)

    _, (blk_vals, blk_idx) = jax.lax.scan(
        body, None, (vec_blocks, norm_blocks, bit_blocks, offsets)
    )
    # deferred exact merge over all blocks' candidates: (nb, Q, k) -> (Q, nb*k)
    cand_vals = jnp.transpose(blk_vals, (1, 0, 2)).reshape(q.shape[0], nb * k)
    cand_idx = jnp.transpose(blk_idx, (1, 0, 2)).reshape(q.shape[0], nb * k)
    neg_top, pos = jax.lax.top_k(-cand_vals, k)
    vals = -neg_top
    idx = jnp.take_along_axis(cand_idx, pos, axis=1)

    empty = jnp.isinf(vals)
    if metric == "l2":
        dists = jnp.maximum(vals + qn, 0.0)
    elif metric == "cosine":
        dists = jnp.clip(1.0 + vals, 0.0, 2.0)
    else:  # ip / l1: scores ARE the distances
        dists = vals
    dists = jnp.where(empty, INF, dists)
    idx = jnp.where(empty, -1, idx)
    return dists, idx


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_rows", "mode", "recall_target", "metric"),
)
def scan_topk_fn(queries, vectors, norms, role_bits, query_masks, k, block_rows,
                 mode, recall_target=0.95, metric="l2"):
    """Jitted entry for masked_scan_topk (static k / block size / mode)."""
    return masked_scan_topk(
        queries, vectors, norms, role_bits, query_masks,
        k=k, block_rows=block_rows, mode=mode, recall_target=recall_target,
        metric=metric,
    )


def masked_scan_topk_aug(
    queries: jax.Array,        # (Q, d) float32 — RAW queries
    vectors_aug: jax.Array,    # (Npad, d_aug): [x | norm_hi | norm_lo | 0pad]
    role_bits: jax.Array,      # (Npad, W)
    query_masks: jax.Array,    # (Q, W)
    d: int,                    # original vector dimensionality
    k: int,
    block_rows: int = 65536,
    mode: str = "approx",
    recall_target: float = 0.95,
    metric: str = "l2",     # see masked_scan_topk; ip/cosine zero the norm
                            # columns of the augmented query instead
) -> Tuple[jax.Array, jax.Array]:
    """Augmented-layout scan: the squared-norm term rides inside the matmul
    (see core.augment_with_norms), removing a full (Q, N) elementwise pass.
    Semantics identical to masked_scan_topk. "l1" has no matmul form and is
    not supported here — core.build_device_arena skips the augmented layout
    for l1 arenas, so callers fall through to masked_scan_topk."""
    assert metric != "l1", "l1 has no augmented (matmul) form"
    q = queries.astype(jnp.float32)
    if metric == "cosine":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    nq = q.shape[0]
    npad, d_aug = vectors_aug.shape
    assert npad % block_rows == 0, (npad, block_rows)
    nb = npad // block_rows
    qn = jnp.sum(q * q, axis=1, keepdims=True)

    compute_dtype = vectors_aug.dtype
    w_norm = 1.0 if metric == "l2" else 0.0   # drop the ||x||^2 term for ip
    w_q = -2.0 if metric == "l2" else -1.0    # scores = -q.x for ip/cosine
    ones = jnp.full((nq, 1), w_norm, jnp.float32)
    zeros = jnp.zeros((nq, d_aug - d - 2), jnp.float32)
    q_aug = jnp.concatenate([w_q * q, ones, ones, zeros], axis=1).astype(compute_dtype)

    # with few blocks the final exact merge can't recover per-block losses;
    # raise the per-block target so end recall stays comparable
    if nb < 4 and mode == "approx":
        recall_target = max(recall_target, 0.98)

    vec_blocks = vectors_aug.reshape(nb, block_rows, d_aug)
    bit_blocks = role_bits.reshape(nb, block_rows, -1)
    offsets = jnp.arange(nb, dtype=jnp.int32) * block_rows

    def body(_, xs):
        xb, bb, off = xs
        scores = jax.lax.dot_general(
            q_aug, xb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hit = jnp.bitwise_and(query_masks[:, None, :], bb[None, :, :])
        allowed = jnp.any(hit != 0, axis=-1)
        scores = jnp.where(allowed, scores, INF)
        if mode == "approx":
            bvals, bpos = jax.lax.approx_min_k(scores, k, recall_target=recall_target)
        else:
            neg, bpos = jax.lax.top_k(-scores, k)
            bvals = -neg
        return None, (bvals, bpos.astype(jnp.int32) + off)

    _, (blk_vals, blk_idx) = jax.lax.scan(body, None, (vec_blocks, bit_blocks, offsets))
    cand_vals = jnp.transpose(blk_vals, (1, 0, 2)).reshape(nq, nb * k)
    cand_idx = jnp.transpose(blk_idx, (1, 0, 2)).reshape(nq, nb * k)
    neg_top, pos = jax.lax.top_k(-cand_vals, k)
    vals = -neg_top
    idx = jnp.take_along_axis(cand_idx, pos, axis=1)

    empty = jnp.isinf(vals)
    if metric == "l2":
        dists = jnp.maximum(vals + qn, 0.0)
    elif metric == "cosine":
        dists = jnp.clip(1.0 + vals, 0.0, 2.0)
    else:
        dists = vals
    dists = jnp.where(empty, INF, dists)
    idx = jnp.where(empty, -1, idx)
    return dists, idx


@functools.partial(
    jax.jit,
    static_argnames=("d", "k", "block_rows", "mode", "recall_target", "metric"),
)
def scan_topk_aug_fn(queries, vectors_aug, role_bits, query_masks, d, k,
                     block_rows, mode, recall_target=0.95, metric="l2"):
    return masked_scan_topk_aug(
        queries, vectors_aug, role_bits, query_masks, d=d, k=k,
        block_rows=block_rows, mode=mode, recall_target=recall_target,
        metric=metric,
    )
