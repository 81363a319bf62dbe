"""All-Pallas group-minima merge: subgroup extraction + bitonic pairs.

The scan kernels (pallas_scan_int8) emit one packed (score << 7 | lane)
minimum per `group` rows — (n_groups, Q) int32. Turning those into
per-query top-k was the device pass's dominant non-matmul cost: the
round-3 cascade (XLA top_k per 128-group subgroup, then exact top-k over
survivors) measured ~20 ms of the 42 ms 8192q x 1M pass because XLA's
top_k SORTS every 128-wide row (scripts/r4_merge_lab3.py: stage-1 alone
28 ms). This module replaces it with two tiny Pallas kernels, measured
3.8x faster end-to-end and EXACTLY equal to the cascade's output
(scripts/r4_merge_lab6.py: 6.4 vs 24.1 ms wall incl. dispatch floor;
~2 vs ~20 ms device):

stage 1 — subgroup extraction (`_extract_pairs_kernel`): for each of
  `nsub` subgroups of sub = n_groups/nsub groups, t rounds of
  (min, mask) over the ORIGINAL packed values entirely in VMEM, tracking
  a meta word (global_group << 7 | lane) alongside. ~5 VPU ops per
  element per round, ONE HBM read of the minima — vs top_k's per-row
  sort. Emits ((nsub*t, Q) exact packed values, (nsub*t, Q) meta),
  ascending per subgroup.

stage 2 — bitonic pairs sort (`_bitonic_pairs_kernel`): a full bitonic
  network sorts the nsub*t survivors of every query column by value
  (meta rides along) in VMEM. All exchanges are along the sublane-major
  axis via (B, 2, stride, q) reshapes; the direction bit of an exchange
  at (size, stride) depends only on the block index b (size >= 2*stride
  always), so it is an iota mask, never a shuffle. npc = nsub*t = 512
  keeps the 45-round network inside the Mosaic compiler's comfort zone
  (npc=1024 crashed the round-4 compile helper).

Selection contract: identical to the cascade — a true top-k entry is
missed only if more than t of them land in one subgroup. The production
geometry fixes nsub = 32, t = 16, so the per-subgroup expectation is
lambda = k/nsub = 3.125 at k = 100 and P(X > 16) ~ 1e-8 REGARDLESS of
n_groups (sub scales as n_groups/32: 256 at 1M rows/group=128, 2464 at
10M). Duplicate packed values within a subgroup (same score AND lane in
two groups) extract as one candidate with the smaller meta — strictly
rarer than the group-min collision the pack already accepts.

Reference counterpart: this is the merge half of pgvector's tuple-sort
over per-page candidates (nodesort in hnswscan) — done as two VPU
kernels instead of a comparison sort per query.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_extract_pairs_kernel(sub: int, t: int):
    def _kernel(m_ref, out_y_ref, out_m_ref):
        m = m_ref[:]                                  # (sub, TQ)
        tq = m.shape[1]
        j = pl.program_id(0)
        pos = jax.lax.broadcasted_iota(jnp.int32, (sub, tq), 0)
        meta = ((j * sub + pos) << 7) | (m & 127)
        # extraction sentinel: INT32_MAX sorts after every real packed
        # value AND after the scan kernel's MASKED/EMPTY codes
        # (0x7E/0x7F000000), so a drained subgroup (all inadmissible, or
        # duplicate packed values masked together) emits slots the
        # downstream empty check (vals >= EMPTY_I32) already rejects
        big = jnp.int32(2**31 - 1)
        for r in range(t):
            cur = jnp.min(m, axis=0)                  # (TQ,)
            hit = m == cur[None, :]
            out_y_ref[r, :] = cur
            out_m_ref[r, :] = jnp.min(jnp.where(hit, meta, big), axis=0)
            if r + 1 < t:
                m = jnp.where(hit, big, m)

    return _kernel


def _make_bitonic_pairs_kernel(npc: int, keep: int):
    assert npc & (npc - 1) == 0, "bitonic needs a power-of-2 count"

    def _kernel(y_ref, m_ref, out_y_ref, out_m_ref):
        y = y_ref[:]
        g = m_ref[:]
        tq = y.shape[1]
        size = 2
        while size <= npc:
            stride = size // 2
            while stride >= 1:
                nb = npc // (2 * stride)
                y4 = y.reshape(nb, 2, stride, tq)
                g4 = g.reshape(nb, 2, stride, tq)
                a, b = y4[:, 0], y4[:, 1]
                ga, gb = g4[:, 0], g4[:, 1]
                le = a <= b
                lo = jnp.where(le, a, b)
                hi = jnp.where(le, b, a)
                glo = jnp.where(le, ga, gb)
                ghi = jnp.where(le, gb, ga)
                bidx = jax.lax.broadcasted_iota(
                    jnp.int32, (nb, stride, tq), 0)
                desc = ((bidx * (2 * stride)) & size) != 0
                y = jnp.stack([jnp.where(desc, hi, lo),
                               jnp.where(desc, lo, hi)],
                              axis=1).reshape(npc, tq)
                g = jnp.stack([jnp.where(desc, ghi, glo),
                               jnp.where(desc, glo, ghi)],
                              axis=1).reshape(npc, tq)
                stride //= 2
            size *= 2
        out_y_ref[:] = y[:keep, :]
        out_m_ref[:] = g[:keep, :]

    return _kernel


def _pick_q_tile(sub: int, nq: int, q_tile: int,
                 budget: int = 2_600_000) -> int:
    """Largest multiple-of-8 divisor of nq that is <= q_tile AND keeps the
    extraction block (sub, qt) int32 within the VMEM budget. Returns 0 when
    none exists (callers must fall back to the cascade) — previously a
    non-dividing nq forced qt = nq, silently blowing the budget on large
    odd query counts (ADVICE r4).

    Budget calibration: Mosaic's scoped-VMEM stack holds the input block
    PLUS ~4x its size in unrolled round temporaries (measured: the
    (sub=512, qt=2048) 4.2 MB block OOM'd at 19.7 of 16 MB scoped VMEM on
    the 16384-group 1M crossover shape, while (256, 2048)=2 MB and
    (2464, 256)=2.5 MB compile fine) — 2.6 MB keeps the stack under the
    16 MB limit with margin and leaves the headline 8192-group geometry's
    tile choice (qt=2048) unchanged."""
    cap = min(q_tile, nq, budget // max(sub * 4, 1))
    cap -= cap % 8
    while cap >= 8:
        if nq % cap == 0:
            return cap
        cap -= 8
    return 0


def merge_supported(n_groups: int, nq: int, k: int,
                    nsub: int = 32, t: int = 16,
                    q_tile: int = 2048) -> bool:
    """Static gate for the Pallas merge: geometry must divide cleanly, the
    survivor pool must cover k, and a VMEM-budget-respecting query tile
    must exist for both kernels. Callers fall back to the cascade when
    this is False (tiny test shapes, odd paddings)."""
    if n_groups % (nsub * 8) != 0:    # sub must be a sublane multiple
        return False
    if k > nsub * t - 8:              # leave headroom over k
        return False
    if nq % 8 != 0 or n_groups // nsub < 64:
        return False
    sub = n_groups // nsub
    npc = nsub * t
    if _pick_q_tile(sub, nq, q_tile) < 64:          # extraction kernel
        return False
    return _pick_q_tile(npc, nq, 512) >= 64         # bitonic kernel


@functools.partial(jax.jit, static_argnames=("k", "nsub", "t", "q_tile",
                                              "interpret"))
def pallas_merge_topk(mins: jax.Array, k: int, nsub: int = 32, t: int = 16,
                      q_tile: int = 2048, interpret: bool = False):
    """(n_groups, Q) packed minima -> ((Q, k) exact packed values
    ascending, (Q, k) global group positions). Same output contract as
    the cascade merge (ties among equal scores break by group position
    instead of lane — both arbitrary)."""
    ng, nq = mins.shape
    sub = ng // nsub
    npc = nsub * t
    assert ng % nsub == 0 and sub % 8 == 0 and t % 8 == 0
    assert npc & (npc - 1) == 0, (nsub, t)
    assert k <= npc
    # VMEM budget: extraction block (sub, qt) int32 <= ~2.6 MB (see
    # _pick_q_tile calibration note); qt must divide nq (no remainder
    # blocks on TPU grids)
    qt = _pick_q_tile(sub, nq, q_tile)
    assert qt >= 8, (sub, nq, q_tile)   # merge_supported gates callers
    y, meta = pl.pallas_call(
        _make_extract_pairs_kernel(sub, t),
        grid=(nsub, nq // qt),
        in_specs=[pl.BlockSpec((sub, qt), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((t, qt), lambda j, i: (j, i),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((npc, nq), jnp.int32)] * 2,
        interpret=interpret,
    )(mins)

    keep = min(npc, max(8 * ((k + 7) // 8), 8))
    bqt = _pick_q_tile(npc, nq, 512)
    assert bqt >= 8, (npc, nq)
    ys, ms = pl.pallas_call(
        _make_bitonic_pairs_kernel(npc, keep),
        grid=(nq // bqt,),
        in_specs=[pl.BlockSpec((npc, bqt), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((keep, bqt), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((keep, nq), jnp.int32)] * 2,
        interpret=interpret,
    )(y, meta)
    vals = jnp.transpose(ys[:k, :], (1, 0))
    gpos = jnp.transpose(ms[:k, :] >> 7, (1, 0))
    return vals, gpos
