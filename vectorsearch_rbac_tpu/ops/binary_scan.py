"""Fused RBAC-masked binary (bit-packed) distance scan.

The TPU-native analog of pgvector's `bit` vector type and its operator
family (reference pgvector/src/bitvec.c types, bitutils.c popcount
dispatch, and the `<~>` hamming / `<%%>` jaccard operators registered in
pgvector/src/bitvec.c + hnsw.c `bit_hamming_ops`/`bit_jaccard_ops`), plus
the binary-quantization serving recipe pgvector documents
(`binary_quantize(embedding)::bit(d)` + exact-order rerank).

Design (TPU-first): sign bits are packed 32-per-word into a uint32 arena
of shape (Npad, ceil(d/32)) — 32x smaller than f32 rows, so a full scan
is HBM-cheap even at 10M rows. Distances use the VPU's native
`lax.population_count`:

- hamming(a, b)  = sum_w popcount(a_w XOR b_w)
- jaccard(a, b)  = 1 - |a AND b| / |a OR b|   (1 when the intersection is
  empty — pgvector bitutils.c BitJaccardDistanceDefault returns 1 for
  ab == 0, both-empty included)

The per-word loop is unrolled over the (static, small) word axis so the
largest live intermediate is one (Q, block) int32 plane — XLA fuses the
xor/popcount/add chain into a single pass over the block. The RBAC
permission check is the same fused bitwise AND as ops/scan.py; the
per-block top-k + deferred exact merge mirror masked_scan_topk.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.inf


def pack_bits(vectors: np.ndarray, thresholds: Optional[np.ndarray] = None,
              words: Optional[int] = None) -> np.ndarray:
    """Pack sign bits of (n, d) float rows into (n, ceil(d/32)) uint32.

    Bit j of row i is set iff vectors[i, j] > thresholds[j] (default 0 —
    pgvector's binary_quantize, reference pgvector/src/vector.c
    binary_quantize). Pass per-dim medians for off-center corpora. Pad
    dims beyond d are 0 in every row, so they cancel in hamming and drop
    out of jaccard's AND/OR counts.
    """
    v = np.asarray(vectors)
    n, d = v.shape
    thr = np.zeros(d, v.dtype) if thresholds is None else np.asarray(thresholds)
    w = (d + 31) // 32 if words is None else words
    assert w * 32 >= d, (w, d)
    bits = np.zeros((n, w * 32), dtype=np.uint8)
    bits[:, :d] = (v > thr[None, :]).astype(np.uint8)
    # little-endian within each word: dim j -> word j//32, bit j%32
    lanes = bits.reshape(n, w, 32).astype(np.uint32)
    shifts = np.arange(32, dtype=np.uint32)
    return (lanes << shifts[None, None, :]).sum(axis=2, dtype=np.uint32)


def masked_binary_topk(
    query_bits: jax.Array,   # (Q, Wd) uint32 packed query bits
    bits: jax.Array,         # (Npad, Wd) uint32 packed corpus bits
    role_bits: jax.Array,    # (Npad, W) uint32; all-zero rows never returned
    query_masks: jax.Array,  # (Q, W) uint32 user role masks
    k: int,
    block_rows: int = 65536,
    mode: str = "exact",     # "exact" | "approx" (lax.approx_min_k per block)
    recall_target: float = 0.95,
    metric: str = "hamming",  # "hamming" (<~>) | "jaccard" (<%>)
) -> Tuple[jax.Array, jax.Array]:
    """Return (dists (Q, k) ascending, idx (Q, k) int32 into the padded
    rows). Hamming distances are integer-valued floats; jaccard in [0, 1].
    Empty slots: dist=+inf, idx=-1."""
    assert metric in ("hamming", "jaccard"), metric
    npad, wd = bits.shape
    assert npad % block_rows == 0, (npad, block_rows)
    nb = npad // block_rows
    nq = query_bits.shape[0]

    bit_blocks = bits.reshape(nb, block_rows, wd)
    role_blocks = role_bits.reshape(nb, block_rows, -1)
    offsets = jnp.arange(nb, dtype=jnp.int32) * block_rows

    def body(_, xs):
        bb, rb, off = xs
        if metric == "hamming":
            acc = jnp.zeros((nq, block_rows), dtype=jnp.int32)
            for w in range(wd):  # static unroll: one (Q, B) plane live
                x = jnp.bitwise_xor(query_bits[:, w][:, None], bb[None, :, w])
                acc = acc + jax.lax.population_count(x).astype(jnp.int32)
            scores = acc.astype(jnp.float32)
        else:
            inter = jnp.zeros((nq, block_rows), dtype=jnp.int32)
            union = jnp.zeros((nq, block_rows), dtype=jnp.int32)
            for w in range(wd):
                qw = query_bits[:, w][:, None]
                xw = bb[None, :, w]
                inter = inter + jax.lax.population_count(
                    jnp.bitwise_and(qw, xw)).astype(jnp.int32)
                union = union + jax.lax.population_count(
                    jnp.bitwise_or(qw, xw)).astype(jnp.int32)
            scores = jnp.where(
                inter > 0,
                1.0 - inter.astype(jnp.float32)
                / jnp.maximum(union, 1).astype(jnp.float32),
                1.0,  # empty intersection -> distance 1 (reference
                      # pgvector/src/bitutils.c BitJaccardDistanceDefault
                      # `if (ab == 0) return 1`, both-empty included)
            )
        hit = jnp.bitwise_and(query_masks[:, None, :], rb[None, :, :])
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
        body, None, (bit_blocks, role_blocks, offsets))
    cand_vals = jnp.transpose(blk_vals, (1, 0, 2)).reshape(nq, nb * k)
    cand_idx = jnp.transpose(blk_idx, (1, 0, 2)).reshape(nq, nb * k)
    neg_top, pos = jax.lax.top_k(-cand_vals, k)
    vals = -neg_top
    idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    empty = jnp.isinf(vals)
    return jnp.where(empty, INF, vals), jnp.where(empty, -1, idx)


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_rows", "mode", "recall_target", "metric"),
)
def binary_topk_fn(query_bits, bits, role_bits, query_masks, k, block_rows,
                   mode, recall_target=0.95, metric="hamming"):
    """Jitted entry for masked_binary_topk."""
    return masked_binary_topk(
        query_bits, bits, role_bits, query_masks, k=k,
        block_rows=block_rows, mode=mode, recall_target=recall_target,
        metric=metric,
    )
