"""Pallas bitonic stage-2: full sort of the stage-1 survivors, replacing
XLA top_k (the remaining ~8-11 ms of the merge after the extraction
kernel removed stage 1's ~22 ms).

Input: the extraction kernel's y-values, (npc, Q) int32 with y =
(score<<7)|pos_in_subgroup — self-contained keys (position rides in the
low bits, ties break by position instead of lane; both are arbitrary
tiebreaks of equal scores). A full bitonic network sorts the npc
(power-of-2) candidates of every query column ascending IN VMEM; the
kernel writes only the first `keep` rows. All exchanges are along the
sublane-major axis via (B, 2, s, q) reshapes — the direction bit of a
bitonic exchange at (size, stride) depends only on the block index b
(size >= 2*stride always), so direction is a (B, 1, 1) iota mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_bitonic_kernel(npc: int, keep: int):
    assert npc & (npc - 1) == 0, "bitonic needs a power-of-2 candidate count"

    def _kernel(y_ref, out_ref):
        y = y_ref[:]                                   # (npc, TQ)
        tq = y.shape[1]
        size = 2
        while size <= npc:
            stride = size // 2
            while stride >= 1:
                nb = npc // (2 * stride)
                x4 = y.reshape(nb, 2, stride, tq)
                a = x4[:, 0]
                b = x4[:, 1]
                lo = jnp.minimum(a, b)
                hi = jnp.maximum(a, b)
                bidx = jax.lax.broadcasted_iota(
                    jnp.int32, (nb, stride, tq), 0)
                desc = ((bidx * (2 * stride)) & size) != 0
                first = jnp.where(desc, hi, lo)
                second = jnp.where(desc, lo, hi)
                y = jnp.stack([first, second], axis=1).reshape(npc, tq)
                stride //= 2
            size *= 2
        out_ref[:] = y[:keep, :]

    return _kernel


def _make_bitonic_pairs_kernel(npc: int, keep: int, t: int, sub: int):
    """Pairs form: sorts (y, gid) together by y, where gid — the GLOBAL
    group id of each candidate — is computed in-kernel from the row index
    (subgroup = row // t) and y's embedded low-7 position bits. Emits the
    first `keep` rows of both. y's order is exact score order (ties break
    by position-in-subgroup instead of lane — both arbitrary)."""
    assert npc & (npc - 1) == 0

    def _kernel(y_ref, out_y_ref, out_g_ref):
        y = y_ref[:]                                   # (npc, TQ)
        tq = y.shape[1]
        row = jax.lax.broadcasted_iota(jnp.int32, (npc, tq), 0)
        g = (row // t) * sub + (y & 127)
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
        out_g_ref[:] = g[:keep, :]

    return _kernel


@functools.partial(jax.jit, static_argnames=("keep", "t", "sub", "q_tile",
                                              "interpret"))
def bitonic_pairs_keep(y: jax.Array, keep: int, t: int, sub: int,
                       q_tile: int = 512, interpret: bool = False):
    """(npc, Q) y-values -> ((keep, Q) sorted y, (keep, Q) global group
    ids), ascending by y."""
    npc, nq = y.shape
    assert keep % 8 == 0 and keep <= npc
    q_tile = min(q_tile, nq)
    assert nq % q_tile == 0
    return pl.pallas_call(
        _make_bitonic_pairs_kernel(npc, keep, t, sub),
        grid=(nq // q_tile,),
        in_specs=[pl.BlockSpec((npc, q_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((keep, q_tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((keep, nq), jnp.int32)] * 2,
        interpret=interpret,
    )(y)


@functools.partial(jax.jit, static_argnames=("keep", "q_tile", "interpret"))
def bitonic_sort_keep(y: jax.Array, keep: int = 128, q_tile: int = 512,
                      interpret: bool = False) -> jax.Array:
    """(npc, Q) int32 -> (keep, Q) int32: per-column ascending sort, first
    `keep` rows. npc must be a power of 2; keep a multiple of 8."""
    npc, nq = y.shape
    assert keep % 8 == 0 and keep <= npc
    q_tile = min(q_tile, nq)
    assert nq % q_tile == 0
    return pl.pallas_call(
        _make_bitonic_kernel(npc, keep),
        grid=(nq // q_tile,),
        in_specs=[pl.BlockSpec((npc, q_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((keep, q_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((keep, nq), jnp.int32),
        interpret=interpret,
    )(y)


def _make_bitonic_pairs2_kernel(npc: int, keep: int):
    """Two-input pairs form: sorts (y, meta) together by y. y values are
    the ORIGINAL packed ints (lane included); meta is arbitrary payload
    (the extraction kernel's (global_group << 7) | lane words)."""
    assert npc & (npc - 1) == 0

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


@functools.partial(jax.jit, static_argnames=("keep", "q_tile", "interpret"))
def bitonic_pairs2_keep(y: jax.Array, meta: jax.Array, keep: int,
                        q_tile: int = 512, interpret: bool = False):
    """((npc, Q) y, (npc, Q) meta) -> ((keep, Q), (keep, Q)) ascending
    by y; meta rides along."""
    npc, nq = y.shape
    assert keep % 8 == 0 and keep <= npc
    q_tile = min(q_tile, nq)
    assert nq % q_tile == 0
    return pl.pallas_call(
        _make_bitonic_pairs2_kernel(npc, keep),
        grid=(nq // q_tile,),
        in_specs=[pl.BlockSpec((npc, q_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((keep, q_tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((keep, nq), jnp.int32)] * 2,
        interpret=interpret,
    )(y, meta)
