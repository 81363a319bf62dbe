"""Fused RBAC-masked distance scan as a Pallas TPU kernel.

The flagship kernel (BASELINE.json north star: "role bitmask fused into the
distance scan"). One kernel fuses, per (query-tile, row-block) grid cell:

    MXU:  scores = ||x||^2 - 2 q.x        (bf16 matmul, f32 accumulate)
    VPU:  permission mask (uint32 AND + any over W words)
    VPU:  per-128-lane partial reduce     (min + argmin per lane group)

so the (Q, N) score matrix never exists in HBM — the XLA version of this
scan (ops/scan.py) materializes it per block and runs ~50-100x above the
HBM roofline. Output is (Q, N/128) per-group minima + lane winners; the
exact top-k over those candidates runs as a normal XLA top_k. Missing a
true top-k neighbor requires two of them to collide in one 128-lane group:
for k=100 over 1M rows the expected loss is <0.1% recall@100.

Pattern follows the TPU kNN PartialReduce design (approx_min_k's hardware
op) but with the permission mask fused in, which XLA's ApproxTopK cannot
do without a materialized mask pass.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


CHUNK = 2048  # rows scored per inner step; keeps the f32 score tile ~1 MB


def _kernel(q_ref, x_ref, n_ref, b_ref, m_ref, out_v_ref, out_i_ref):
    # q: (TQ, d) f32, x: (B, d) compute dtype, n: (1, B) f32,
    # b: (W, B) uint32 (TRANSPOSED — a (B, W) layout tiles the 4-word lane
    # dim up to 128 lanes and alone blows the VMEM budget), m: (TQ, W)
    # uint32; out_v/out_i: (TQ, B/LANES). The row block B is processed in
    # CHUNK-row steps so the f32 score tile stays small while the MXU
    # matmul stays large.
    q = q_ref[:]
    w = b_ref.shape[0]
    b_total = x_ref.shape[0]
    g_per_chunk = CHUNK // LANES

    for c in range(b_total // CHUNK):
        x = x_ref[pl.ds(c * CHUNK, CHUNK), :]
        dots = jax.lax.dot_general(
            q.astype(x.dtype), x,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                         # (TQ, CHUNK)
        scores = n_ref[0, pl.ds(c * CHUNK, CHUNK)][None, :] - 2.0 * dots

        # fused permission check: any(m & b) over the W bitset words
        ok = jnp.zeros(scores.shape, dtype=jnp.uint32)
        for wi in range(w):
            bits_col = b_ref[wi, pl.ds(c * CHUNK, CHUNK)]
            ok = ok | (m_ref[:, wi][:, None] & bits_col[None, :])
        scores = jnp.where(ok != 0, scores, jnp.inf)

        # per-128-lane partial reduce: min + first-argmin within each group
        tq = scores.shape[0]
        s3 = scores.reshape(tq, g_per_chunk, LANES)
        mins = jnp.min(s3, axis=2)                # (TQ, G)
        lane_ids = jax.lax.broadcasted_iota(
            jnp.int32, (tq, g_per_chunk, LANES), 2
        )
        winners = jnp.min(
            jnp.where(s3 == mins[:, :, None], lane_ids, LANES), axis=2
        )
        out_v_ref[:, pl.ds(c * g_per_chunk, g_per_chunk)] = mins
        out_i_ref[:, pl.ds(c * g_per_chunk, g_per_chunk)] = winners.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("k", "q_tile", "block_rows", "interpret")
)
def pallas_masked_topk(
    queries: jax.Array,      # (Q, d) float32; Q % q_tile == 0
    vectors: jax.Array,      # (Npad, d); Npad % block_rows == 0
    norms: jax.Array,        # (Npad,) float32
    role_bits: jax.Array,    # (Npad, W) uint32
    query_masks: jax.Array,  # (Q, W) uint32
    k: int,
    q_tile: int = 128,
    block_rows: int = 16384,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused masked scan + top-k. Returns (dists (Q, k) true squared L2
    ascending, row idx (Q, k) int32, -1 for empty slots)."""
    q = queries.astype(jnp.float32)
    nq, d = q.shape
    npad = vectors.shape[0]
    assert nq % q_tile == 0, (nq, q_tile)
    assert npad % block_rows == 0, (npad, block_rows)
    assert block_rows % CHUNK == 0 and CHUNK % LANES == 0
    assert (block_rows // LANES) % LANES == 0, "output tile must be 128-aligned"
    groups_per_block = block_rows // LANES
    n_groups = npad // LANES

    grid = (nq // q_tile, npad // block_rows)
    norms2d = norms.reshape(1, npad)
    bits_t = jnp.transpose(role_bits, (1, 0))  # (W, Npad), lane dim = rows

    mins, winners = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((role_bits.shape[1], block_rows), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, query_masks.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, groups_per_block), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, groups_per_block), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, n_groups), jnp.float32),
            jax.ShapeDtypeStruct((nq, n_groups), jnp.int32),
        ],
        interpret=interpret,
    )(q, vectors, norms2d, bits_t, query_masks)

    # exact top-k over the per-group candidates
    neg_top, pos = jax.lax.top_k(-mins, k)
    vals = -neg_top                                   # (Q, k)
    lane = jnp.take_along_axis(winners, pos, axis=1)  # (Q, k)
    idx = pos * LANES + lane

    qn = jnp.sum(q * q, axis=1, keepdims=True)
    empty = jnp.isinf(vals) | (lane >= LANES)
    dists = jnp.where(empty, jnp.inf, jnp.maximum(vals + qn, 0.0))
    idx = jnp.where(empty, -1, idx)
    return dists, idx
