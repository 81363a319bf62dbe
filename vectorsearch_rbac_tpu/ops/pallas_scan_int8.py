"""Fused int8 RBAC-masked scan — the flagship serving kernel.

Replaces pgvector's typed distance layer + RLS gating (reference
pgvector/src/halfutils.c SIMD half-precision ops, vector.c distance
operators, row_level_security.py:54 policy check) with one TPU kernel that
is int8 end-to-end:

- distances ride the MXU's 2x-rate int8 path: dots = x_q . q_q with int32
  accumulation (EXACT — no rounding — so SIFT-family corpora, which
  quantize losslessly, keep exact distance order);
- the permission check is a SECOND int8 MXU matmul: admit[i, j] =
  roles8[i] . user_onehot[j] counts shared roles, admissible iff > 0.
  This moves the reference's per-row policy EXISTS-check (and round 1's
  multi-pass VPU bitset loop) onto the systolic array;
- no argmin / no (Q, N) score materialization: the winning lane id is
  packed into the low 7 bits of the int32 score (score << 7 | lane) before
  a sublane min-reduce, so the kernel emits only (N/128, Q) group minima.

HBM per pass: N * (d + R_pad) bytes (int8 vectors + int8 role one-hot) —
~0.95x of the round-1 bf16+bitset layout but with half the MXU time and
~2.5x fewer VPU epilogue passes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
LANE_MASK = 0x7F
MASKED_I32 = 0x7F000000  # > any packed score (|score| << 7 < 2^30)
EMPTY_I32 = 0x7E000000


def _make_kernel(chunk: int, group: int, metric: str = "l2",
                 score_shift: int = 0, mask_sb: int = 0):
    def _kernel(q_ref, x_ref, n_ref, r_ref, m_ref, out_ref):
        # q: (TQ, d) int8; x: (B, d) int8; n: (1, B) int32;
        # r: (B, R) int8 role one-hot; m: (TQ, R) int8 user one-hot —
        # OR, with mask_sb > 0, (TQ/mask_sb, R): ONE one-hot per mask
        # SLOT, where query j carries slot j % (TQ/mask_sb) (admit-dedup:
        # RBAC workloads have far fewer distinct masks than queries, so
        # the admissibility matmul shrinks mask_sb-fold and a tile-style
        # pltpu.repeat rebuilds the (chunk, TQ) admit map on the VPU —
        # measured 20.9 -> 16.0 ms per 8192q x 1M scan,
        # results/r4_admit_lab.json, output bit-identical);
        # out: (B/group, TQ) int32 packed (score << 7 | lane) minima.
        # group < 128 keeps more candidates per block (fewer same-group
        # collisions in the final top-k) at 2x output per halving.
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
            # score partial, all int32 (exact): l2 = ||x||^2 - 2 q.x;
            # ip/cosine = -q.x (quantize_corpus's span clamp bounds both
            # under the << 7 pack: 3*d_pad*qclip^2 < 2^23)
            dots = jax.lax.dot_general(
                x, q,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )                                     # (chunk, TQ)
            if metric == "l2":
                score = n_ref[0, pl.ds(row0, chunk)][:, None] - 2 * dots
            else:
                score = -dots
            if score_shift:
                # wide-d: drop LSBs instead of clamping the quantization
                # span (core.score_shift_for) — keeps |packed| < 2^30
                score = jax.lax.shift_right_arithmetic(score, score_shift)
            # fused RBAC check on the MXU: shared-role count
            admit = jax.lax.dot_general(
                r, m,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )                                     # (chunk, TQ[/mask_sb])
            if mask_sb:
                # tile-style repeat: output column j = input col j % nsb,
                # matching the host's interleaved slot layout
                admit = pltpu.repeat(admit, mask_sb, axis=1)
            s3 = score.reshape(g_per_chunk, group, tq)
            a3 = admit.reshape(g_per_chunk, group, tq)
            packed = jnp.where(
                a3 > 0,
                jax.lax.shift_left(s3, 7) | lane,
                jnp.full_like(s3, MASKED_I32),
            )
            mins = jnp.min(packed, axis=1)        # (G, TQ) sublane reduce
            g0 = pl.multiple_of(c * g_per_chunk, 8)
            out_ref[pl.ds(g0, g_per_chunk), :] = mins
            return 0

        jax.lax.fori_loop(0, b_total // chunk, chunk_body, 0)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("k", "q_tile", "block_rows", "group",
                              "merge", "interpret", "metric", "score_shift",
                              "mask_sub_block")
)
def int8_masked_topk(
    queries_q: jax.Array,    # (Q, d_pad) int8 quantized queries
    query_norms: jax.Array,  # (Q,) int32 ||q_q||^2
    vectors_q: jax.Array,    # (Npad, d_pad) int8
    norms_q: jax.Array,      # (Npad,) int32
    roles8: jax.Array,       # (Npad, R_pad) int8 one-hot
    masks8: jax.Array,       # (Q, R_pad) int8 user one-hot; with
                             # mask_sub_block=sb > 0: (Q/sb, R_pad), one
                             # one-hot per SLOT — query j of a q_tile
                             # carries slot j % (q_tile/sb) (admit-dedup)
    inv_scale_sq: jax.Array,       # () float32: 1 / scale^2
    k: int,
    q_tile: int = 512,
    block_rows: int = 4096,
    group: int = 128,
    merge: str = "approx",   # group-minima merge: "exact" lax.top_k wins
                             # at 1M-scale group counts (measured 88 vs
                             # 97 ms / 8192 q); "approx" (PartialReduce +
                             # 2x over-fetch + exact resort) wins at 10M-
                             # scale counts; "auto" picks by n_groups
    interpret: bool = False,
    metric: str = "l2",      # "l2" | "ip" (cosine = ip on unit vectors;
                             # fold the +1 into query_bias)
    query_bias: jax.Array = None,  # (Q,) float32 additive distance
                                   # correction (ip: -q.center to undo the
                                   # corpus centering; cosine: 1 - q.center)
    score_shift: int = 0,    # static score >> shift before the << 7 pack
                             # (core.score_shift_for: full int8 resolution
                             # at wide d; 0 for d_pad <= 256)
    mask_sub_block: int = 0,  # admit-dedup slot width (0 = per-query
                             # masks). See _make_kernel's mask_sb note and
                             # index/flat_int8.py's host-side grouping.
) -> Tuple[jax.Array, jax.Array]:
    """Return (dists (Q, k) float32 ascending in the metric's distance,
    idx (Q, k) int32 arena rows; -1 / +inf on empty slots)."""
    nq, d = queries_q.shape
    q_tile = min(q_tile, nq)
    npad = vectors_q.shape[0]
    assert nq % q_tile == 0 and npad % block_rows == 0
    assert group in (8, 16, 32, 64, 128) and group <= LANE_MASK + 1
    sb = mask_sub_block
    if sb:
        # slots must tile evenly and keep a sane sublane count
        assert q_tile % sb == 0 and masks8.shape[0] == nq // sb, (
            q_tile, sb, masks8.shape)
    chunk = 1024 if block_rows % 1024 == 0 else max(group, LANES)
    n_groups = npad // group

    grid = (nq // q_tile, npad // block_rows)
    norms2d = norms_q.reshape(1, npad)
    r_pad = roles8.shape[1]

    packed = pl.pallas_call(
        _make_kernel(chunk, group, metric, score_shift, mask_sb=sb),
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
            pl.BlockSpec((q_tile // sb if sb else q_tile, r_pad),
                         lambda i, j: (i, 0),
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
        # raw (n_groups, Q) packed minima — for stage profiling only
        return packed, packed
    return _merge_group_minima(packed, query_norms, inv_scale_sq, k,
                               group, merge, metric, query_bias,
                               score_shift, interpret=interpret)


def _merge_group_minima(packed, query_norms, inv_scale_sq, k, group, merge,
                        metric, query_bias, score_shift=0,
                        interpret=False):
    """Shared epilogue: (n_groups, Q) packed (score << 7 | lane) minima ->
    (dists (Q, k), idx (Q, k))."""
    from .pallas_merge import merge_supported, pallas_merge_topk

    n_groups = packed.shape[0]
    if merge == "pallas" and not merge_supported(n_groups, packed.shape[1],
                                                 k):
        merge = "cascade"   # tiny/odd shapes: the XLA cascade
    if merge == "pallas":
        # all-Pallas merge: subgroup extraction + bitonic pairs sort —
        # 3.8x the cascade, output-identical (scripts/r4_merge_lab6.py;
        # ops/pallas_merge.py for the full accounting)
        vals, pos = pallas_merge_topk(packed, k, interpret=interpret)
        lane = vals & LANE_MASK
        idx = pos * group + lane
        score = jax.lax.shift_right_arithmetic(vals, 7)
        if score_shift:
            score = jax.lax.shift_left(score, score_shift)
        empty = vals >= EMPTY_I32
        inv2 = (inv_scale_sq if jnp.ndim(inv_scale_sq) == 0
                else inv_scale_sq[:, None])
        if metric == "l2":
            dists = (score + query_norms[:, None]).astype(jnp.float32) * inv2
            dists = jnp.maximum(dists, 0.0)
        else:
            dists = score.astype(jnp.float32) * inv2
        if query_bias is not None:
            dists = dists + query_bias[:, None]
        dists = jnp.where(empty, jnp.inf, dists)
        idx = jnp.where(empty, -1, idx)
        return dists, idx
    mins = jnp.transpose(packed, (1, 0))                 # (Q, n_groups)
    if merge == "auto":
        merge = "approx" if n_groups > 32768 else "exact"
    if merge == "cascade" and n_groups >= 2048:
        # two-stage exact-ish selection: per-128-subgroup top-t, then exact
        # top-k over the 64*t survivors. Misses a true top-k entry only if
        # > t of them land in one 128-wide subgroup (multinomial tail
        # ~1e-13 at k=100, t=24) — measured ~4x cheaper than one big
        # lax.top_k at 1M-scale group counts while exact merge dominated
        # the device profile (PERF.md round-3).
        t = min(24, max(k // 4 + 4, 8))
        qn_, ng = mins.shape
        sub = 128
        m3 = mins.reshape(qn_, ng // sub, sub)
        negs, poss = jax.lax.top_k(-m3, t)               # (Q, ng/sub, t)
        base = (jnp.arange(ng // sub, dtype=jnp.int32) * sub)[None, :, None]
        cand_pos = (poss + base).reshape(qn_, -1)
        cand_val = (-negs).reshape(qn_, -1)
        neg_top, sel = jax.lax.top_k(-cand_val, k)
        vals = -neg_top
        pos = jnp.take_along_axis(cand_pos, sel, axis=1)
    elif merge == "approx" and n_groups >= 4 * k:
        # PartialReduce-backed approximate selection with 2x OVER-FETCH:
        # approx_min_k at exactly k caps set recall near its recall_target
        # (measured 0.938 at the 0.95 target); requesting 2k candidates
        # makes "true top-k inside approx top-2k" the failure event, whose
        # probability is negligible, then an exact top_k over the 2k
        # candidates restores order. int32 -> f32 keys are order-preserving
        # up to ties within the 2^-24 rounding band; the exact re-sort on
        # the int32 keys below settles those.
        kk = min(2 * k, n_groups)
        _, pos = jax.lax.approx_min_k(
            mins.astype(jnp.float32), kk, recall_target=0.95)
        cand = jnp.take_along_axis(mins, pos, axis=1)    # exact int32 keys
        neg_top, sub = jax.lax.top_k(-cand, k)
        vals = -neg_top
        pos = jnp.take_along_axis(pos, sub, axis=1)
    else:
        neg_top, pos = jax.lax.top_k(-mins, k)
        vals = -neg_top                                  # k smallest packed
    lane = vals & LANE_MASK
    idx = pos * group + lane
    score = jax.lax.shift_right_arithmetic(vals, 7)      # int32 scaled score
    if score_shift:
        score = jax.lax.shift_left(score, score_shift)   # restore magnitude

    empty = vals >= EMPTY_I32
    # inv may be a scalar (l2: 1/scale^2) or per-QUERY (Q,) (ip/cosine:
    # every query keeps its own int8 scale, core.quantize_queries_ip)
    inv2 = (inv_scale_sq if jnp.ndim(inv_scale_sq) == 0
            else inv_scale_sq[:, None])
    if metric == "l2":
        dists = (score + query_norms[:, None]).astype(jnp.float32) * inv2
        dists = jnp.maximum(dists, 0.0)
    else:
        dists = score.astype(jnp.float32) * inv2
    if query_bias is not None:
        dists = dists + query_bias[:, None]
    dists = jnp.where(empty, jnp.inf, dists)
    idx = jnp.where(empty, -1, idx)
    return dists, idx


def _make_wide_kernel(group: int, nk: int, metric: str,
                      score_shift: int = 0, mask_sb: int = 0):
    """d-split variant: the reduction dimension joins the grid and partial
    dots accumulate in a VMEM scratch, so wide corpora (768-d cohere
    shapes) keep FULL row/query tiles instead of shrinking them ~8x to fit
    (block_rows, d) in VMEM (the round-2 1.3k-QPS limiter, PERF.md
    768-d section). The packed group-min epilogue runs once, on the last
    d-chunk. mask_sb: admit-dedup slot width (see _make_kernel).

    The QUERY block is the full (q_tile, d_pad) tile, resident across the
    whole (j, kd) sweep (index depends on i only): at the shipping 768-d
    geometry a (q_tile, d_chunk) query spec re-fetched ~1.6 GB/pass and
    stalled every grid step on the fetch (round-5 wide roofline,
    results/r5_wide_roofline.json); the kernel slices its d-chunk from
    the resident tile instead."""

    def _kernel(q_ref, x_ref, n_ref, r_ref, m_ref, out_ref, acc_ref):
        kd = pl.program_id(2)
        dc = x_ref.shape[1]
        q = q_ref[:, pl.ds(pl.multiple_of(kd * dc, dc), dc)]
        dots = jax.lax.dot_general(
            x_ref[:], q,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                           # (B, TQ)

        @pl.when(kd == 0)
        def _init():
            acc_ref[:] = dots

        @pl.when(kd != 0)
        def _accum():
            acc_ref[:] = acc_ref[:] + dots

        @pl.when(kd == nk - 1)
        def _epilogue():
            b, tq = acc_ref.shape
            if metric == "l2":
                score = n_ref[0, :][:, None] - 2 * acc_ref[:]
            else:
                score = -acc_ref[:]
            if score_shift:
                score = jax.lax.shift_right_arithmetic(score, score_shift)
            admit = jax.lax.dot_general(
                r_ref[:], m_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            if mask_sb:
                admit = pltpu.repeat(admit, mask_sb, axis=1)
            g = b // group
            lane = jax.lax.broadcasted_iota(jnp.int32, (g, group, tq), 1)
            packed = jnp.where(
                admit.reshape(g, group, tq) > 0,
                jax.lax.shift_left(score.reshape(g, group, tq), 7) | lane,
                jnp.full((g, group, tq), MASKED_I32, jnp.int32),
            )
            out_ref[:] = jnp.min(packed, axis=1)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("k", "q_tile", "block_rows", "group",
                              "d_chunk", "merge", "interpret", "metric",
                              "score_shift", "mask_sub_block")
)
def int8_masked_topk_wide(
    queries_q: jax.Array,    # (Q, d_pad) int8
    query_norms: jax.Array,  # (Q,) int32
    vectors_q: jax.Array,    # (Npad, d_pad) int8
    norms_q: jax.Array,      # (Npad,) int32
    roles8: jax.Array,       # (Npad, R_pad) int8
    masks8: jax.Array,       # (Q, R_pad) int8
    inv_scale_sq: jax.Array,
    k: int,
    q_tile: int = 512,
    block_rows: int = 1024,
    group: int = 128,
    d_chunk: int = 256,
    merge: str = "auto",
    interpret: bool = False,
    metric: str = "l2",
    query_bias: jax.Array = None,
    score_shift: int = 0,
    mask_sub_block: int = 0,  # admit-dedup slot width (see the narrow
                              # kernel); masks8 is (Q/sb, R_pad)
) -> Tuple[jax.Array, jax.Array]:
    """Wide-d form of int8_masked_topk (same contract): the d dimension is
    a third grid axis with VMEM-scratch accumulation, so 768-d runs at full
    block_rows/q_tile. VMEM at the defaults: acc (1024, 512) i32 = 2 MB +
    x (1024, 256) + q (512, 256) + roles/masks ~ 2.6 MB total."""
    nq, d_pad = queries_q.shape
    q_tile = min(q_tile, nq)
    npad = vectors_q.shape[0]
    assert nq % q_tile == 0 and npad % block_rows == 0
    assert group in (8, 16, 32, 64, 128)
    sb = mask_sub_block
    if sb:
        assert q_tile % sb == 0 and masks8.shape[0] == nq // sb, (
            q_tile, sb, masks8.shape)
    d_chunk = min(d_chunk, d_pad)
    while d_pad % d_chunk:      # d_pad is a 128-multiple; fall to one that
        d_chunk //= 2           # divides (384 -> 128, etc.)
    assert d_chunk >= 128 or d_chunk == d_pad, (d_pad, d_chunk)
    nk = d_pad // d_chunk
    n_groups = npad // group
    r_pad = roles8.shape[1]
    grid = (nq // q_tile, npad // block_rows, nk)
    norms2d = norms_q.reshape(1, npad)

    packed = pl.pallas_call(
        _make_wide_kernel(group, nk, metric, score_shift, mask_sb=sb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d_pad), lambda i, j, kd: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d_chunk), lambda i, j, kd: (j, kd),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i, j, kd: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, r_pad), lambda i, j, kd: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile // sb if sb else q_tile, r_pad),
                         lambda i, j, kd: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows // group, q_tile), lambda i, j, kd: (j, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, nq), jnp.int32),
        scratch_shapes=[pltpu.VMEM((block_rows, q_tile), jnp.int32)],
        interpret=interpret,
        # admit-dedup's lane-repeat materializes an extra (block_rows,
        # q_tile) int32 temp in the epilogue, ~1 MB past Mosaic's default
        # 16 MB scoped budget at the shipping 768-d geometry; big tiles
        # (acc past ~4.5 MB) need headroom for the accumulator + epilogue
        # temps too — raise the cap (v5e has 128 MB physical VMEM); the
        # tuned default geometry keeps Mosaic's 16 MB
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=(48 if block_rows * q_tile * 4 > 4_500_000
                              else 24) * 1024 * 1024)
                         if sb or block_rows * q_tile * 4 > 4_500_000
                         else None),
    )(queries_q, vectors_q, norms2d, roles8, masks8)

    return _merge_group_minima(packed, query_norms, inv_scale_sq, k,
                               group, merge, metric, query_bias,
                               score_shift, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("r_pad",))
def expand_masks_device(bits: jax.Array, r_pad: int) -> jax.Array:
    """(Q, W) uint32 role bitsets -> (Q, r_pad) int8 one-hot, on device.

    Host→device traffic is 16 B/query instead of r_pad (128) B/query — the
    tunnel-upload analog of pgvector keeping its role OIDs small: measured
    ~20 ms saved per 16k-query pass at the ~45 MB/s tunnel bandwidth."""
    q, w = bits.shape
    r = jnp.arange(r_pad, dtype=jnp.uint32)
    word = (r // 32).astype(jnp.int32)                    # (r_pad,)
    bit = (r % 32).astype(jnp.uint32)
    words = jnp.take(bits, jnp.minimum(word, w - 1), axis=1)  # (Q, r_pad)
    oh = ((words >> bit[None, :]) & 1).astype(jnp.int8)
    return jnp.where((word < w)[None, :], oh, 0)


def _hi_pack_geometry(k: int, id_bits: int) -> Tuple[int, int, int]:
    """(hi_bits, ids-per-u16, packed-hi-u16-count) for the wire format."""
    hi_bits = max(id_bits - 16, 0)
    per = 16 // hi_bits if hi_bits else k
    return hi_bits, per, -(-k // per)


@functools.partial(jax.jit, static_argnames=("id_bits", "dist16", "dist"))
def pack_results_device(dists: jax.Array, idx: jax.Array,
                        id_bits: int = 24, dist16: bool = True,
                        dist: str = None) -> jax.Array:
    """(Q, k) f32 dists + (Q, k) i32 ids -> a uint16 wire row per query.

    The wire format for the ~45-75 MB/s tunnel (the difference between a
    fetch-bound and a compute-bound serving pass). Ids travel as a uint16
    low half plus the high bits nibble-packed `per = 16 // (id_bits-16)`
    to a uint16 (id_bits = ceil(log2(n_rows))). Distances by `dist` mode:

    - "f32": two uint16 halves — partitioned engines, whose cross-
      partition merges must not let rounding ties reorder results;
    - "bf16": reporting precision ~0.4% relative (f16 would overflow on
      SIFT squared-L2 magnitudes); 4.5 B/result at 1M rows;
    - "u8": per-query AFFINE code over the top-k's own [min, max] span
      (f32 min/range header + one byte per result) — 3.6 B/result; the
      absolute error (range/254) is usually FINER than bf16 inside a tight
      top-k band. Measured on-chip: the u8 wire moved the 16k-query pass
      from 40k to 71k QPS (scripts/r3_perf_lab.py round-3).
    - "ids": NO distances — a u16 valid-count header + the id sections
      only (2.52 B/result at 1M rows, the fixed-width entropy floor).
      This is exact parity with the reference's result path: both the
      SQL protocol's recall consumer (common_function.py:1396, set of
      (document_id, block_id) pairs) and the C++ headline baseline
      (main_role_partition_comparison.cpp:629, vector<pair<int,int>>)
      ship ids ONLY — distances never cross the baseline's result path.
      The host side returns RANK pseudo-distances (0..k-1, +inf on empty
      slots): results stay ascending-ordered, but callers that need
      distance VALUES (cross-partition merges, distance-radius filters)
      must use u8/bf16/f32.

    Empty slots travel as dist=+inf (code 255 in u8), id=0 — the HOST side
    restores -1 (an id sentinel would collide with a valid row at exact
    powers of two). `dist16` is the legacy bool form (True=bf16, False=f32)
    kept for callers that don't pass `dist`."""
    q, k = idx.shape
    if dist is None:
        dist = "bf16" if dist16 else "f32"
    hi_bits, per, n_hi = _hi_pack_geometry(k, id_bits)
    empty = ~jnp.isfinite(dists)
    idc = jnp.where(empty, 0, idx)
    if dist == "ids":
        # results are distance-sorted, so empties are a suffix: one u16
        # valid-count header replaces the whole distance section
        d16 = jnp.sum(~empty, axis=1).astype(jnp.uint16)[:, None]
    elif dist == "bf16":
        d16 = jax.lax.bitcast_convert_type(
            dists.astype(jnp.bfloat16), jnp.uint16)
    elif dist == "u8":
        assert k % 2 == 0, "u8 wire needs even k"
        dmin = jnp.min(jnp.where(empty, jnp.inf, dists), axis=1)
        dmax = jnp.max(jnp.where(empty, -jnp.inf, dists), axis=1)
        dmin = jnp.where(jnp.isfinite(dmin), dmin, 0.0)
        rng = jnp.maximum(jnp.where(jnp.isfinite(dmax), dmax, 0.0) - dmin,
                          1e-9)
        du = jnp.clip(jnp.round(
            (dists - dmin[:, None]) / rng[:, None] * 254.0), 0, 254
        ).astype(jnp.uint16)
        du = jnp.where(empty, jnp.uint16(255), du)
        du2 = du.reshape(q, k // 2, 2)
        sh2 = (jnp.arange(2, dtype=jnp.uint16) * 8)[None, None, :]
        packed_d = jax.lax.reduce(du2 << sh2, jnp.uint16(0),
                                  jax.lax.bitwise_or, (2,))
        hdr = jax.lax.bitcast_convert_type(
            jnp.stack([dmin, rng], axis=1), jnp.uint32)    # (Q, 2)
        d16 = jnp.concatenate(
            [(hdr & 0xFFFF).astype(jnp.uint16),
             (hdr >> 16).astype(jnp.uint16), packed_d], axis=1)
    else:
        d32 = jax.lax.bitcast_convert_type(dists, jnp.uint32)
        d16 = jnp.concatenate(
            [(d32 & 0xFFFF).astype(jnp.uint16),
             (d32 >> 16).astype(jnp.uint16)], axis=1)      # (Q, 2k)
    lo = (idc & 0xFFFF).astype(jnp.uint16)
    if hi_bits == 0:
        return jnp.concatenate([d16, lo], axis=1)
    hi = ((idc >> 16) & ((1 << hi_bits) - 1)).astype(jnp.uint16)
    pad = n_hi * per - k
    if pad:
        hi = jnp.concatenate(
            [hi, jnp.zeros((q, pad), jnp.uint16)], axis=1)
    hi3 = hi.reshape(q, n_hi, per)
    shifts = (jnp.arange(per, dtype=jnp.uint16) * hi_bits)[None, None, :]
    packed_hi = jax.lax.reduce(
        hi3 << shifts, jnp.uint16(0), jax.lax.bitwise_or, (2,))
    return jnp.concatenate([d16, lo, packed_hi], axis=1)


def unpack_results_host(arr, k: int, id_bits: int = 24, dist16: bool = True,
                        dist: str = None):
    """Inverse of pack_results_device on the host (numpy)."""
    import numpy as np

    if dist is None:
        dist = "bf16" if dist16 else "f32"
    hi_bits, per, n_hi = _hi_pack_geometry(k, id_bits)
    a = np.asarray(arr)
    if dist == "ids":
        count = a[:, :1].astype(np.int32)                  # (Q, 1)
        rank = np.arange(k, dtype=np.int32)[None, :]
        empty = rank >= count
        d = rank.astype(np.float32) * np.ones((a.shape[0], 1), np.float32)
        off = 1
    elif dist == "bf16":
        # bf16 -> f32: the bf16 bit pattern is the high half of the f32 one
        d = (a[:, :k].astype(np.uint32) << 16).view(np.float32)
        empty = ~np.isfinite(d)
        off = k
    elif dist == "u8":
        hdr = (a[:, :2].astype(np.uint32)
               | (a[:, 2:4].astype(np.uint32) << 16)).view(np.float32)
        dmin, rng = hdr[:, 0], hdr[:, 1]
        pd = a[:, 4:4 + k // 2]
        du = np.empty((a.shape[0], k), np.uint16)
        du[:, 0::2] = pd & 0xFF
        du[:, 1::2] = pd >> 8
        d = dmin[:, None] + du.astype(np.float32) / 254.0 * rng[:, None]
        empty = du == 255
        off = 4 + k // 2
    else:
        d = (a[:, :k].astype(np.uint32)
             | (a[:, k:2 * k].astype(np.uint32) << 16)).view(np.float32)
        empty = ~np.isfinite(d)
        off = 2 * k
    idx = a[:, off:off + k].astype(np.int32)
    if hi_bits:
        packed_hi = a[:, off + k:off + k + n_hi]           # (Q, n_hi)
        reps = np.repeat(packed_hi, per, axis=1)[:, :k]
        shifts = np.tile(np.arange(per, dtype=np.uint16) * hi_bits,
                         n_hi)[:k][None, :]
        idx |= ((reps >> shifts) & ((1 << hi_bits) - 1)).astype(np.int32) << 16
    return np.where(empty, np.inf, d), np.where(empty, -1, idx)


def int8_masked_topk_reference(
    queries_q, query_norms, vectors_q, norms_q, roles8, masks8,
    inv_scale_sq, k, metric="l2", query_bias=None,
):
    """Pure-jnp semantic twin of the kernel (oracle for tests)."""
    dots = jnp.dot(queries_q.astype(jnp.int32), vectors_q.astype(jnp.int32).T)
    if metric == "l2":
        score = norms_q[None, :].astype(jnp.int32) - 2 * dots
    else:
        score = -dots
    admit = jnp.dot(masks8.astype(jnp.int32), roles8.astype(jnp.int32).T)
    big = jnp.int32(2**30)
    score = jnp.where(admit > 0, score, big)
    neg_top, idx = jax.lax.top_k(-score, k)
    vals = -neg_top
    empty = vals >= big
    inv2 = (inv_scale_sq if jnp.ndim(inv_scale_sq) == 0
            else inv_scale_sq[:, None])
    if metric == "l2":
        dists = (vals + query_norms[:, None]).astype(jnp.float32) * inv2
        dists = jnp.maximum(dists, 0.0)
    else:
        dists = vals.astype(jnp.float32) * inv2
    if query_bias is not None:
        dists = dists + query_bias[:, None]
    dists = jnp.where(empty, jnp.inf, dists)
    return dists, jnp.where(empty, -1, idx.astype(jnp.int32))
