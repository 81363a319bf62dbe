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


def _merge_topk(run_vals, run_idx, cand_vals, cand_idx, k):
    """Merge running (Q, k) with candidates (Q, C): exact top-k of the union."""
    vals = jnp.concatenate([run_vals, cand_vals], axis=1)
    idx = jnp.concatenate([run_idx, cand_idx], axis=1)
    neg_top, pos = jax.lax.top_k(-vals, k)
    return -neg_top, jnp.take_along_axis(idx, pos, axis=1)


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
) -> Tuple[jax.Array, jax.Array]:
    """Return (dists (Q, k) true squared-L2 ascending, idx (Q, k) int32).

    Slots with no admissible vector get dist=+inf and idx=-1.
    """
    q = queries.astype(jnp.float32)
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

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)

    def body(carry, xs):
        run_vals, run_idx = carry
        xb, nb_, bb, off = xs
        # scores: ||x||^2 - 2 q.x  (monotone in true L2 per query)
        dots = jax.lax.dot_general(
            qc, xb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = nb_[None, :] - 2.0 * dots
        # fused RBAC check: any shared role bit between user mask and row bits
        hit = jnp.bitwise_and(query_masks[:, None, :], bb[None, :, :])
        allowed = jnp.any(hit != 0, axis=-1)
        scores = jnp.where(allowed, scores, INF)
        cand_idx = lane + off

        if mode == "approx":
            bvals, bpos = jax.lax.approx_min_k(scores, k, recall_target=recall_target)
            bidx = jnp.take_along_axis(
                jnp.broadcast_to(cand_idx, scores.shape), bpos, axis=1
            )
            new_vals, new_idx = _merge_topk(run_vals, run_idx, bvals, bidx, k)
        else:
            new_vals, new_idx = _merge_topk(
                run_vals, run_idx, scores,
                jnp.broadcast_to(cand_idx, scores.shape), k,
            )
        return (new_vals, new_idx), None

    init = (
        jnp.full((q.shape[0], k), INF, dtype=jnp.float32),
        jnp.full((q.shape[0], k), -1, dtype=jnp.int32),
    )
    (vals, idx), _ = jax.lax.scan(body, init, (vec_blocks, norm_blocks, bit_blocks, offsets))

    empty = jnp.isinf(vals)
    dists = jnp.where(empty, INF, jnp.maximum(vals + qn, 0.0))
    idx = jnp.where(empty, -1, idx)
    return dists, idx


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "mode", "recall_target")
)
def scan_topk_fn(queries, vectors, norms, role_bits, query_masks, k, block_rows,
                 mode, recall_target=0.99):
    """Jitted entry for masked_scan_topk (static k / block size / mode)."""
    return masked_scan_topk(
        queries, vectors, norms, role_bits, query_masks,
        k=k, block_rows=block_rows, mode=mode, recall_target=recall_target,
    )
