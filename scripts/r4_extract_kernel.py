"""Pallas subgroup-extraction kernel: top-t of each 128-group subgroup of
the scan kernel's (n_groups, Q) packed minima — the merge's stage 1.

XLA's top_k(t of 128) sorts each 128-wide row and costs ~22-28 ms on the
8192q x 1M merge (r4_merge_lab3: S1 27.9 ms, the whole cascade's
dominant term). This kernel does t rounds of (min, mask) per subgroup
entirely in VMEM/registers with the candidate's position-in-subgroup
EMBEDDED in the packed value's low 7 bits (score order is preserved:
the true lane bits it temporarily replaces only ever broke ties).
One 256 MB HBM read, ~3 VPU ops/element/round.

Output: (nsub * t, Q) y-values where y = (score<<7) | pos7. Stage 2
(XLA): transpose, exact top_k(k) on y (score-ordered), then gather the
TRUE packed values (lane bits restored) by position for row-id
recovery.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_extract_kernel(sub: int, t: int):
    def _kernel(m_ref, out_ref):
        # m: (sub, TQ) int32 packed minima; out: (t, TQ) int32 y-minima
        pos = jax.lax.broadcasted_iota(jnp.int32, m_ref.shape, 0)
        y = (m_ref[:] & ~jnp.int32(127)) | pos
        for r in range(t):
            cur = jnp.min(y, axis=0)             # (TQ,)
            out_ref[r, :] = cur
            if r + 1 < t:
                y = jnp.where(y == cur[None, :], jnp.int32(2**30), y)

    return _kernel


@functools.partial(jax.jit, static_argnames=("sub", "t", "q_tile",
                                              "interpret"))
def subgroup_extract(mins: jax.Array, sub: int = 128, t: int = 12,
                     q_tile: int = 2048, interpret: bool = False):
    """(n_groups, Q) int32 packed minima -> (n_groups//sub * t, Q) int32
    y-minima, y = (score<<7)|pos_in_subgroup, ascending per subgroup."""
    ng, nq = mins.shape
    assert ng % sub == 0
    assert t % 8 == 0, "output block sublane dim must be a multiple of 8"
    q_tile = min(q_tile, nq)
    assert nq % q_tile == 0
    nsub = ng // sub
    out = pl.pallas_call(
        _make_extract_kernel(sub, t),
        grid=(nsub, nq // q_tile),
        in_specs=[pl.BlockSpec((sub, q_tile), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((t, q_tile), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsub * t, nq), jnp.int32),
        interpret=interpret,
    )(mins)
    return out


@functools.partial(jax.jit, static_argnames=("k", "sub", "t", "keep",
                                              "q_tile", "interpret"))
def extract_merge_v2(mins: jax.Array, k: int, sub: int = 128, t: int = 8,
                     keep: int = 128, q_tile: int = 2048,
                     interpret: bool = False):
    """Merge with NO XLA top_k at all: Pallas stage-1 extraction (top-t
    per subgroup, positions embedded) + Pallas stage-2 bitonic pairs sort
    of the nsub*t survivors + exact-value gather for the final k. Same
    contract as extract_merge / the cascade."""
    from r4_bitonic_kernel import bitonic_pairs_keep

    ng, nq = mins.shape
    nsub = ng // sub
    y = subgroup_extract(mins, sub=sub, t=t, q_tile=q_tile,
                         interpret=interpret)          # (nsub*t, Q)
    ys, gid = bitonic_pairs_keep(y, keep=max(keep, k), t=t, sub=sub,
                                 q_tile=min(512, nq),
                                 interpret=interpret)  # (keep, Q) each
    gk = gid[:k, :]                                    # ascending by score
    # true packed values (lane bits) gathered along the GROUP axis of the
    # original (NG, Q) array — no big transpose materialization
    exact = jnp.take_along_axis(mins, gk, axis=0)      # (k, Q)
    return jnp.transpose(exact, (1, 0)), jnp.transpose(gk, (1, 0))


@functools.partial(jax.jit, static_argnames=("k", "sub", "t", "q_tile",
                                              "interpret"))
def extract_merge(mins: jax.Array, k: int, sub: int = 128, t: int = 12,
                  q_tile: int = 2048, interpret: bool = False):
    """Full merge: Pallas stage-1 extraction + exact XLA stage-2 top-k.
    Returns (packed_vals (Q, k) int32 — TRUE lane bits, group_pos (Q, k)
    int32 global group ids), same contract as the cascade merge."""
    ng, nq = mins.shape
    nsub = ng // sub
    y = subgroup_extract(mins, sub=sub, t=t, q_tile=q_tile,
                         interpret=interpret)        # (nsub*t, Q)
    yt = jnp.transpose(y, (1, 0))                    # (Q, nsub*t)
    neg_top, sel = jax.lax.top_k(-yt, k)             # score-ordered (y ties
    yv = -neg_top                                    # break by pos, not lane)
    sub_id = sel // t                                # which subgroup
    gpos = sub_id * sub + (yv & 127)                 # global group id
    # restore true lane bits: gather exact packed values by group position
    exact = jnp.take_along_axis(jnp.transpose(mins, (1, 0)), gpos, axis=1)
    return exact, gpos


def _make_extract_pairs_kernel(sub: int, t: int):
    """v3: extraction on the ORIGINAL packed values with a meta word
    tracked alongside — meta = (global_group << 7) | lane. No position
    embedding (sub may exceed 128), no exact-value gather afterwards:
    the extracted values ARE the original packed ints, lane included."""
    def _kernel(m_ref, out_y_ref, out_m_ref):
        m = m_ref[:]                                  # (sub, TQ)
        tq = m.shape[1]
        j = pl.program_id(0)
        pos = jax.lax.broadcasted_iota(jnp.int32, (sub, tq), 0)
        meta = ((j * sub + pos) << 7) | (m & 127)
        big = jnp.int32(2**30)
        for r in range(t):
            cur = jnp.min(m, axis=0)                  # (TQ,)
            hit = m == cur[None, :]
            out_y_ref[r, :] = cur
            out_m_ref[r, :] = jnp.min(jnp.where(hit, meta, big), axis=0)
            if r + 1 < t:
                m = jnp.where(hit, big, m)
        # duplicate packed values within a subgroup (same score AND lane in
        # two groups) are extracted as one candidate with the smaller
        # meta — a strictly rarer event than the group-min collision the
        # epilogue already accepts

    return _kernel


@functools.partial(jax.jit, static_argnames=("sub", "t", "q_tile",
                                              "interpret"))
def subgroup_extract_pairs(mins: jax.Array, sub: int = 256, t: int = 16,
                           q_tile: int = 2048, interpret: bool = False):
    """(n_groups, Q) packed minima -> ((nsub*t, Q) exact packed values,
    (nsub*t, Q) meta = (global_group << 7) | lane), ascending per
    subgroup."""
    ng, nq = mins.shape
    assert ng % sub == 0 and t % 8 == 0
    q_tile = min(q_tile, nq)
    assert nq % q_tile == 0
    nsub = ng // sub
    return pl.pallas_call(
        _make_extract_pairs_kernel(sub, t),
        grid=(nsub, nq // q_tile),
        in_specs=[pl.BlockSpec((sub, q_tile), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((t, q_tile), lambda j, i: (j, i),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nsub * t, nq), jnp.int32)] * 2,
        interpret=interpret,
    )(mins)


@functools.partial(jax.jit, static_argnames=("k", "sub", "t", "keep",
                                              "q_tile", "interpret"))
def extract_merge_v3(mins: jax.Array, k: int, sub: int = 256, t: int = 16,
                     keep: int = 128, q_tile: int = 2048,
                     interpret: bool = False):
    """All-Pallas merge, gather-free: stage-1 pairs extraction + stage-2
    bitonic pairs sort. Returns ((Q, k) exact packed vals incl lane,
    (Q, k) global group positions) — the cascade contract."""
    from r4_bitonic_kernel import bitonic_pairs2_keep

    y, meta = subgroup_extract_pairs(mins, sub=sub, t=t, q_tile=q_tile,
                                     interpret=interpret)
    ys, ms = bitonic_pairs2_keep(y, meta, keep=max(keep, k),
                                 q_tile=min(512, mins.shape[1]),
                                 interpret=interpret)
    vals = jnp.transpose(ys[:k, :], (1, 0))
    gpos = jnp.transpose(ms[:k, :] >> 7, (1, 0))
    return vals, gpos
