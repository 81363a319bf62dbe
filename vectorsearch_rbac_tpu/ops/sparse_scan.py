"""Fused RBAC-masked sparse-vector distance scan.

The TPU-native analog of pgvector's `sparsevec` type and its operator
family (reference pgvector/src/sparsevec.c: sparsevec_l2_distance:853,
sparsevec_inner_product:920, sparsevec_cosine_distance:950,
sparsevec_l1_distance:995).

Design (TPU-first): pgvector stores CSR per row and intersects two
sorted index lists per distance call — pure pointer-chasing, the worst
possible TPU shape. Here the corpus side keeps its sparsity as a PADDED
CSR block layout (cols (Npad, nnz_pad) int32 + vals (Npad, nnz_pad)
f32), while the QUERY side densifies: each query scatters its nonzeros
into a dense (d+1,) buffer once per batch, and every corpus row scores
against it with a gather —

    dot(x_i, q)  = sum_j vals[i, j] * qdense[cols[i, j]]

so the intersection problem disappears (missing query dims read 0.0)
and the inner loop is a vectorized gather+multiply+reduce over static
shapes. Padding slots point at column d (one extra, always-zero dense
slot) with val 0, contributing exactly 0 to every metric including l1.

Metrics (scores monotone in the true distance, converted at the end):
  l2:     ||x||^2 - 2 x.q      (+ ||q||^2 at the end)
  ip:     -x.q
  cosine: -x.q on unit-normalized rows/queries (1 + s at the end)
  l1:     sum_j (|vals_ij - qd[cols_ij]| - |qd[cols_ij]|)  (+ ||q||_1):
          dims in x's support contribute |x_j - q_j|; the identity
          re-expresses the q-only dims' contribution ||q||_1 as a
          constant, so one pass over x's support suffices.

The RBAC permission check is the same fused bitwise AND as ops/scan.py;
per-block top-k + deferred exact merge mirror masked_scan_topk.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.inf


def pad_sparse_rows(
    indptr: np.ndarray,   # (n+1,) CSR row pointers
    indices: np.ndarray,  # (nnz,) column ids, any order within a row
    data: np.ndarray,     # (nnz,) values
    dim: int,
    npad: int,
    nnz_pad: Optional[int] = None,
    lane: int = 8,        # pad nnz to a multiple of the sublane width
) -> Tuple[np.ndarray, np.ndarray, int]:
    """CSR -> padded block layout: cols (npad, nnz_pad) int32 with column
    `dim` as the padding slot, vals (npad, nnz_pad) float32 zeros-padded.
    Rows beyond n are all-padding."""
    n = len(indptr) - 1
    row_nnz = np.diff(indptr)
    max_nnz = int(row_nnz.max()) if n else 0
    if nnz_pad is None:
        nnz_pad = max(((max_nnz + lane - 1) // lane) * lane, lane)
    assert nnz_pad >= max_nnz, (nnz_pad, max_nnz)
    cols = np.full((npad, nnz_pad), dim, dtype=np.int32)
    vals = np.zeros((npad, nnz_pad), dtype=np.float32)
    if n:
        # vectorized CSR -> padded: flat destination = row * nnz_pad + slot
        rows_of = np.repeat(np.arange(n, dtype=np.int64), row_nnz)
        slot = np.arange(len(indices), dtype=np.int64) - \
            np.repeat(indptr[:-1].astype(np.int64), row_nnz)
        dest = rows_of * nnz_pad + slot
        cols.reshape(-1)[dest] = indices
        vals.reshape(-1)[dest] = data
    return cols, vals, nnz_pad


def densify_queries(q_cols: np.ndarray, q_vals: np.ndarray,
                    dim: int) -> np.ndarray:
    """Padded sparse queries (Q, qnnz) -> dense (Q, dim+1) float32 with the
    padding slot (column `dim`) forced to 0."""
    nq, _ = q_cols.shape
    qd = np.zeros((nq, dim + 1), dtype=np.float32)
    qd[np.arange(nq)[:, None], q_cols] = q_vals
    qd[:, dim] = 0.0
    return qd


def masked_sparse_topk(
    qdense: jax.Array,       # (Q, d+1) float32 dense queries, slot d == 0
    cols: jax.Array,         # (Npad, nnz_pad) int32, padding slot = d
    vals: jax.Array,         # (Npad, nnz_pad) float32
    norms: jax.Array,        # (Npad,) float32 squared L2 norms of rows
    role_bits: jax.Array,    # (Npad, W) uint32
    query_masks: jax.Array,  # (Q, W) uint32
    k: int,
    block_rows: int = 2048,
    mode: str = "exact",
    recall_target: float = 0.95,
    metric: str = "l2",      # "l2" | "ip" | "cosine" | "l1"
) -> Tuple[jax.Array, jax.Array]:
    """Return (dists (Q, k) ascending in the metric, idx (Q, k) int32).
    cosine assumes unit-normalized corpus rows AND normalizes qdense here.
    Empty slots: dist=+inf, idx=-1."""
    assert metric in ("l2", "ip", "cosine", "l1"), metric
    q = qdense.astype(jnp.float32)
    if metric == "cosine":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    nq = q.shape[0]
    npad = cols.shape[0]
    assert npad % block_rows == 0, (npad, block_rows)
    nb = npad // block_rows
    qn = jnp.sum(q * q, axis=1, keepdims=True)       # ||q||^2
    ql1 = jnp.sum(jnp.abs(q), axis=1, keepdims=True)  # ||q||_1

    col_blocks = cols.reshape(nb, block_rows, -1)
    val_blocks = vals.reshape(nb, block_rows, -1)
    norm_blocks = norms.reshape(nb, block_rows)
    bit_blocks = role_bits.reshape(nb, block_rows, -1)
    offsets = jnp.arange(nb, dtype=jnp.int32) * block_rows

    def body(_, xs):
        cb, vb, nb_, bb, off = xs
        # (Q, B, nnz) gather from each query's dense buffer; XLA fuses the
        # gather with the multiply+reduce so only (Q, B) planes materialize
        qg = jnp.take(q, cb, axis=1)                     # (Q, B, nnz)
        if metric == "l1":
            scores = jnp.sum(jnp.abs(vb[None, :, :] - qg) - jnp.abs(qg),
                             axis=-1)
        else:
            dots = jnp.sum(vb[None, :, :] * qg, axis=-1)  # (Q, B)
            scores = (nb_[None, :] - 2.0 * dots) if metric == "l2" else -dots
        hit = jnp.bitwise_and(query_masks[:, None, :], bb[None, :, :])
        allowed = jnp.any(hit != 0, axis=-1)
        scores = jnp.where(allowed, scores, INF)
        if mode == "approx":
            bvals, bpos = jax.lax.approx_min_k(
                scores, k, recall_target=recall_target)
        else:
            neg, bpos = jax.lax.top_k(-scores, k)
            bvals = -neg
        return None, (bvals, bpos.astype(jnp.int32) + off)

    _, (blk_vals, blk_idx) = jax.lax.scan(
        body, None, (col_blocks, val_blocks, norm_blocks, bit_blocks,
                     offsets))
    cand_vals = jnp.transpose(blk_vals, (1, 0, 2)).reshape(nq, nb * k)
    cand_idx = jnp.transpose(blk_idx, (1, 0, 2)).reshape(nq, nb * k)
    neg_top, pos = jax.lax.top_k(-cand_vals, k)
    vals_top = -neg_top
    idx = jnp.take_along_axis(cand_idx, pos, axis=1)

    empty = jnp.isinf(vals_top)
    if metric == "l2":
        dists = jnp.maximum(vals_top + qn, 0.0)
    elif metric == "cosine":
        dists = jnp.clip(1.0 + vals_top, 0.0, 2.0)
    elif metric == "l1":
        dists = jnp.maximum(vals_top + ql1, 0.0)
    else:
        dists = vals_top
    dists = jnp.where(empty, INF, dists)
    idx = jnp.where(empty, -1, idx)
    return dists, idx


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_rows", "mode", "recall_target", "metric"),
)
def sparse_topk_fn(qdense, cols, vals, norms, role_bits, query_masks, k,
                   block_rows, mode, recall_target=0.95, metric="l2"):
    """Jitted entry for masked_sparse_topk."""
    return masked_sparse_topk(
        qdense, cols, vals, norms, role_bits, query_masks, k=k,
        block_rows=block_rows, mode=mode, recall_target=recall_target,
        metric=metric,
    )
