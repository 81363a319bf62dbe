"""Round-4 kernel-lab variants of the fused int8 scan epilogue.

The committed kernel (ops/pallas_scan_int8._make_kernel) measures ~43 ms
per 8192q x 1M-row pass vs an ~11 ms MXU bound (PERF.md roofline): the
VPU pack/min epilogue costs ~3x the matmuls. These variants restructure
the epilogue; each is validated against int8_masked_topk_reference in
interpret mode (scripts/r4_kernel_lab.py) before any chip time is spent.

V_TRIM — fewer VPU ops per element: the <<7 pack is fused into the score
  arithmetic itself. packed = (n<<7) - (dots<<8) is a multiple of 128
  (both operands are), so `| lane` is still exact; this deletes the
  separate n-2*dots + shift chain (7 -> ~6 ops/element).
V_PIPE — V_TRIM + fori_loop unroll=2: two independent chunk iterations
  in one scheduling region lets Mosaic's VLIW scheduler overlap chunk
  c+1's MXU matmuls with chunk c's VPU epilogue (rolled loops serialize
  them: matmul -> dependent epilogue is one chain per body).
V_FLOOR — matmuls + raw min only (NO pack, NO admit mask): a lower-bound
  probe, not a correct kernel. Times what the hardware gives when the
  epilogue is a bare group-min, attributing the 43 ms between MXU,
  mandatory reduce, and the maskable/packable parts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import (
    LANES, MASKED_I32, _merge_group_minima,
)


def _make_kernel_trim(chunk: int, group: int, metric: str = "l2",
                      score_shift: int = 0, unroll: int = 1):
    def _kernel(q_ref, x_ref, n_ref, r_ref, m_ref, out_ref):
        q = q_ref[:]
        m = m_ref[:]
        b_total = x_ref.shape[0]
        tq = q.shape[0]
        g_per_chunk = chunk // group
        lane = jax.lax.broadcasted_iota(jnp.int32, (g_per_chunk, group, tq), 1)

        def chunk_body(c, _):
            row0 = pl.multiple_of(c * chunk, LANES)
            x = x_ref[pl.ds(row0, chunk), :]
            r = r_ref[pl.ds(row0, chunk), :]
            dots = jax.lax.dot_general(
                x, q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            if metric == "l2":
                if score_shift:
                    # wide-d: shift must happen pre-pack on the UNPACKED
                    # score (sign-correct); fall back to the plain chain
                    s = n_ref[0, pl.ds(row0, chunk)][:, None] - 2 * dots
                    s = jax.lax.shift_right_arithmetic(s, score_shift)
                    p = jax.lax.shift_left(s, 7)
                else:
                    # fused pack: (n<<7) - (dots<<8) == (n - 2*dots) << 7,
                    # exact (no overflow: |score|<<7 < 2^30 by the span
                    # clamp) and both terms are multiples of 128
                    n7 = jax.lax.shift_left(
                        n_ref[0, pl.ds(row0, chunk)], 7)
                    p = n7[:, None] - jax.lax.shift_left(dots, 8)
            else:
                if score_shift:
                    s = jax.lax.shift_right_arithmetic(-dots, score_shift)
                    p = jax.lax.shift_left(s, 7)
                else:
                    p = jax.lax.shift_left(-dots, 7)
            admit = jax.lax.dot_general(
                r, m, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            p3 = p.reshape(g_per_chunk, group, tq)
            a3 = admit.reshape(g_per_chunk, group, tq)
            packed = jnp.where(a3 > 0, p3 | lane,
                               jnp.full_like(p3, MASKED_I32))
            mins = jnp.min(packed, axis=1)
            g0 = pl.multiple_of(c * g_per_chunk, 8)
            out_ref[pl.ds(g0, g_per_chunk), :] = mins
            return 0

        jax.lax.fori_loop(0, b_total // chunk, chunk_body, 0,
                          unroll=unroll)

    return _kernel


def _make_kernel_floor(chunk: int, group: int):
    """Lower-bound probe: distance+admit matmuls and a bare group-min of
    the raw dots — no pack, no lane, no admissibility select. NOT correct;
    exists to attribute kernel time between MXU / mandatory reduce /
    maskable epilogue."""
    def _kernel(q_ref, x_ref, n_ref, r_ref, m_ref, out_ref):
        q = q_ref[:]
        m = m_ref[:]
        b_total = x_ref.shape[0]
        tq = q.shape[0]
        g_per_chunk = chunk // group

        def chunk_body(c, _):
            row0 = pl.multiple_of(c * chunk, LANES)
            x = x_ref[pl.ds(row0, chunk), :]
            r = r_ref[pl.ds(row0, chunk), :]
            dots = jax.lax.dot_general(
                x, q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            admit = jax.lax.dot_general(
                r, m, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            mins = jnp.min((dots + admit).reshape(g_per_chunk, group, tq),
                           axis=1)
            g0 = pl.multiple_of(c * g_per_chunk, 8)
            out_ref[pl.ds(g0, g_per_chunk), :] = mins
            return 0

        jax.lax.fori_loop(0, b_total // chunk, chunk_body, 0)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("k", "q_tile", "block_rows", "group", "chunk",
                              "merge", "interpret", "metric", "score_shift",
                              "variant", "unroll")
)
def int8_masked_topk_lab(
    queries_q, query_norms, vectors_q, norms_q, roles8, masks8,
    inv_scale_sq, k,
    q_tile: int = 2048, block_rows: int = 8192, group: int = 128,
    chunk: int = 0, merge: str = "cascade", interpret: bool = False,
    metric: str = "l2", query_bias=None, score_shift: int = 0,
    variant: str = "trim", unroll: int = 1,
):
    """Same contract as ops.pallas_scan_int8.int8_masked_topk, kernel body
    selected by `variant` ('trim' | 'floor') with a tunable inner chunk."""
    nq, d = queries_q.shape
    q_tile = min(q_tile, nq)
    npad = vectors_q.shape[0]
    assert nq % q_tile == 0 and npad % block_rows == 0
    chunk = chunk or (1024 if block_rows % 1024 == 0 else max(group, LANES))
    assert block_rows % chunk == 0 and chunk % group == 0
    n_groups = npad // group
    grid = (nq // q_tile, npad // block_rows)
    norms2d = norms_q.reshape(1, npad)
    r_pad = roles8.shape[1]

    if variant == "floor":
        kern = _make_kernel_floor(chunk, group)
    else:
        kern = _make_kernel_trim(chunk, group, metric, score_shift, unroll)

    packed = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, r_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, r_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows // group, q_tile), lambda i, j: (j, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, nq), jnp.int32),
        interpret=interpret,
    )(queries_q, vectors_q, norms2d, roles8, masks8)

    if merge == "none":
        return packed, packed
    return _merge_group_minima(packed, query_norms, inv_scale_sq, k,
                               group, merge, metric, query_bias,
                               score_shift)
