"""Fused masked scan, layout-tuned variant.

Differences vs ops/pallas_scan.py, both driven by TPU vector-layout costs:

1. Scores are computed TRANSPOSED, (rows, queries): the per-128-row-group
   min then reduces along the second-minor (sublane) direction, which the
   VPU does natively, instead of a cross-lane reduction.
2. No argmin: the winning lane id is packed into the low 7 mantissa bits
   of the score float BEFORE the min (clear 7 bits, OR the lane id). The
   min then carries its lane along for free; the id is recovered by
   bitcasting the winner. The perturbation is <= 127 ulps (~2^-16
   relative), far below bf16 matmul noise. Masked-out rows get a large
   finite sentinel (not +inf — inf with OR-ed mantissa bits is a NaN).

Output: (N/128, Q) packed group minima; the caller transposes (cheap XLA)
and runs one exact top-k.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MASKED = 3.0e37  # large finite sentinel for inadmissible rows
EMPTY_THRESHOLD = 1.0e37
LANE_MASK = 0x7F


def _make_kernel(chunk: int):
    def _kernel(q_ref, x_ref, n_ref, b_ref, m_ref, out_ref):
        # q: (TQ, d) f32; x: (B, d); n: (1, B) f32; b: (W, B) u32;
        # m: (TQ, W) u32; out: (B/LANES, TQ) f32 packed (score | lane) minima
        q = q_ref[:]
        w = b_ref.shape[0]
        b_total = x_ref.shape[0]
        tq = q.shape[0]
        g_per_chunk = chunk // LANES
        qx = q.astype(x_ref.dtype)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (g_per_chunk, LANES, tq), 1)

        # fori_loop (not an unrolled python range): Mosaic then reuses one
        # iteration's worth of temporaries instead of stacking all chunks'
        # score tiles in VMEM at once
        def chunk_body(c, _):
            row0 = pl.multiple_of(c * chunk, LANES)
            x = x_ref[pl.ds(row0, chunk), :]
            dots = jax.lax.dot_general(
                x, qx,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                      # (chunk, TQ)
            scores = n_ref[0, pl.ds(row0, chunk)][:, None] - 2.0 * dots

            ok = jnp.zeros(scores.shape, dtype=jnp.uint32)
            for wi in range(w):
                bits_col = b_ref[wi, pl.ds(row0, chunk)]
                ok = ok | (bits_col[:, None] & m_ref[:, wi][None, :])
            scores = jnp.where(ok != 0, scores, jnp.float32(MASKED))

            # pack the row-in-group id into the low mantissa bits
            s3 = scores.reshape(g_per_chunk, LANES, tq)
            packed = pltpu.bitcast(
                (pltpu.bitcast(s3, jnp.uint32) & jnp.uint32(0xFFFFFF80)) | lane,
                jnp.float32,
            )
            mins = jnp.min(packed, axis=1)         # (G, TQ) — sublane reduce
            g0 = pl.multiple_of(c * g_per_chunk, 8)
            out_ref[pl.ds(g0, g_per_chunk), :] = mins
            return 0

        jax.lax.fori_loop(0, b_total // chunk, chunk_body, 0)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("k", "q_tile", "block_rows", "interpret")
)
def pallas_masked_topk_v2(
    queries: jax.Array,      # (Q, d) float32
    vectors: jax.Array,      # (Npad, d)
    norms: jax.Array,        # (Npad,) float32
    role_bits: jax.Array,    # (Npad, W) uint32
    query_masks: jax.Array,  # (Q, W) uint32
    k: int,
    q_tile: int = 512,        # big tiles: each extra q-tile pass re-reads
                              # the whole corpus from HBM
    block_rows: int = 8192,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    q = queries.astype(jnp.float32)
    nq, d = q.shape
    q_tile = min(q_tile, nq)
    npad = vectors.shape[0]
    assert nq % q_tile == 0 and npad % block_rows == 0
    # chunk fixed at 1024 rows: g_per_chunk = 8 keeps output slices on the
    # 8-sublane grid Mosaic requires for dynamic stores
    chunk = 1024
    assert block_rows % chunk == 0, (block_rows, chunk)
    n_groups = npad // LANES

    grid = (nq // q_tile, npad // block_rows)
    norms2d = norms.reshape(1, npad)
    bits_t = jnp.transpose(role_bits, (1, 0))

    packed = pl.pallas_call(
        _make_kernel(chunk),
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
        out_specs=pl.BlockSpec(
            (block_rows // LANES, q_tile), lambda i, j: (j, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, nq), jnp.float32),
        interpret=interpret,
    )(q, vectors, norms2d, bits_t, query_masks)

    mins = jnp.transpose(packed, (1, 0))               # (Q, n_groups)
    neg_top, pos = jax.lax.top_k(-mins, k)
    vals = -neg_top
    lane = jax.lax.bitcast_convert_type(vals, jnp.uint32) & jnp.uint32(LANE_MASK)
    idx = pos * LANES + lane.astype(jnp.int32)

    qn = jnp.sum(q * q, axis=1, keepdims=True)
    empty = vals >= EMPTY_THRESHOLD
    dists = jnp.where(empty, jnp.inf, jnp.maximum(vals + qn, 0.0))
    idx = jnp.where(empty, -1, idx)
    return dists, idx
