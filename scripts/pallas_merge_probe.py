"""Probe: ONE Pallas kernel for the iterative-search selection step.

Measured so far (per step, Q=2048, EF=64, M0=32): lax.top_k merges 5.14 ms,
O(n^2) rank-select 3.86, XLA bitonic networks 4.18 — while the whole rest
of the body (gathers + einsum + visited scatter) is 0.14-0.5 ms. The
selection is bound by per-op overhead and lane-crossing relayouts, not by
arithmetic; the fix is to fuse the entire network into one Pallas kernel
that keeps beam/window/result state in VMEM:

  - lists stay SORTED ascending; pop = shift-left outside the kernel
  - sort the M0 new neighbors DESC (bitonic, payload ids) by nd and by the
    filtered key rd
  - merge each sorted list with the desc run: concat(asc, +inf pad, desc)
    is bitonic; one log2(L)-stage merge network; keep the head

Run: PYTHONPATH=. python scripts/pallas_merge_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

Q, M0, D, NPAD, STEPS, EF, KK = 2048, 32, 128, 65536, 64, 64, 32
P = 40
TQ = 256
BIG = 3.0e38

rng = np.random.default_rng(0)
vec = jnp.asarray(rng.standard_normal((1 << 20, D)).astype(np.float32)).astype(jnp.bfloat16)
norms = jnp.asarray(rng.standard_normal(1 << 20).astype(np.float32))
bits = jnp.asarray(rng.integers(0, 2**32, (1 << 20, 4), dtype=np.uint32))
graph = jnp.asarray(rng.integers(0, NPAD, (P, NPAD, M0), dtype=np.int32))
row_map = jnp.asarray(rng.integers(0, 1 << 20, (P, NPAD), dtype=np.int32))
q = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))
masks = jnp.asarray(rng.integers(0, 2**32, (Q, 4), dtype=np.uint32))
pids = jnp.asarray(rng.integers(0, P, Q, dtype=np.int32))


# ---- network builders (traced inside the kernel; all static shapes) ----

def _cmpex(a_d, a_i, b_d, b_i):
    pred = a_d <= b_d
    return (jnp.where(pred, a_d, b_d), jnp.where(pred, a_i, b_i),
            jnp.where(pred, b_d, a_d), jnp.where(pred, b_i, a_i))


def _merge_net(d, ids, asc=True):
    L = d.shape[-1]
    if L == 1:
        return d, ids
    h = L // 2
    lo_d, lo_i, hi_d, hi_i = _cmpex(d[..., :h], ids[..., :h],
                                    d[..., h:], ids[..., h:])
    if not asc:
        lo_d, lo_i, hi_d, hi_i = hi_d, hi_i, lo_d, lo_i
    lo_d, lo_i = _merge_net(lo_d, lo_i, asc)
    hi_d, hi_i = _merge_net(hi_d, hi_i, asc)
    return (jnp.concatenate([lo_d, hi_d], -1),
            jnp.concatenate([lo_i, hi_i], -1))


def _sort_net(d, ids, asc=True):
    L = d.shape[-1]
    if L == 1:
        return d, ids
    h = L // 2
    a_d, a_i = _sort_net(d[..., :h], ids[..., :h], True)
    b_d, b_i = _sort_net(d[..., h:], ids[..., h:], False)
    return _merge_net(jnp.concatenate([a_d, b_d], -1),
                      jnp.concatenate([a_i, b_i], -1), asc)


def _merge_asc_desc(a_d, a_i, b_d, b_i, out):
    """a sorted asc, b sorted desc -> merged asc, first `out` columns."""
    tot = a_d.shape[-1] + b_d.shape[-1]
    ltot = 1 << (tot - 1).bit_length()
    pad = ltot - tot
    if pad:
        shp = a_d.shape[:-1] + (pad,)
        a_d = jnp.concatenate([a_d, jnp.full(shp, BIG, a_d.dtype)], -1)
        a_i = jnp.concatenate([a_i, jnp.full(shp, -1, a_i.dtype)], -1)
    c_d = jnp.concatenate([a_d, b_d], -1)
    c_i = jnp.concatenate([a_i, b_i], -1)
    d, i = _merge_net(c_d, c_i, True)
    return d[..., :out], i[..., :out]


def _kernel(beam_d, beam_i, nd, nb, rd, wd, resd, resi,
            obd, obi, owd, ord_, ori):
    snd, snb = _sort_net(nd[...], nb[...], asc=False)
    d, i = _merge_asc_desc(beam_d[...], beam_i[...], snd, snb, EF)
    obd[...] = d
    obi[...] = i
    w = wd[...]
    d, _ = _merge_asc_desc(w, jnp.zeros(w.shape, jnp.int32), snd,
                           jnp.zeros_like(snb), EF)
    owd[...] = d
    srd, srb = _sort_net(rd[...], nb[...], asc=False)
    d, i = _merge_asc_desc(resd[...], resi[...], srd, srb, KK)
    ord_[...] = d
    ori[...] = i


def merge_step(beam_d, beam_i, nd, nb, rd, wd, resd, resi):
    grid = (beam_d.shape[0] // TQ,)
    bs = lambda w: pl.BlockSpec((TQ, w), lambda i: (i, 0))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[bs(EF), bs(EF), bs(M0), bs(M0), bs(M0), bs(EF),
                  bs(KK), bs(KK)],
        out_specs=[bs(EF), bs(EF), bs(EF), bs(KK), bs(KK)],
        out_shape=[
            jax.ShapeDtypeStruct((beam_d.shape[0], EF), jnp.float32),
            jax.ShapeDtypeStruct((beam_d.shape[0], EF), jnp.int32),
            jax.ShapeDtypeStruct((beam_d.shape[0], EF), jnp.float32),
            jax.ShapeDtypeStruct((beam_d.shape[0], KK), jnp.float32),
            jax.ShapeDtypeStruct((beam_d.shape[0], KK), jnp.int32),
        ],
    )(beam_d, beam_i, nd, nb, rd, wd, resd, resi)


@jax.jit
def run(q, pids, vec, norms, bits, graph, row_map, masks):
    rows = jnp.arange(Q)
    nwords = NPAD // 32 + 1
    visited = jnp.zeros((Q, nwords), jnp.uint32)
    beam_ids = jnp.zeros((Q, EF), jnp.int32)
    beam_d = jnp.zeros((Q, EF), jnp.float32)
    res_d = jnp.full((Q, KK), BIG)
    res_ids = jnp.full((Q, KK), -1, jnp.int32)
    w_d = jnp.full((Q, EF), BIG)
    qc = q.astype(vec.dtype)

    def body(t, st):
        beam_ids, beam_d, res_ids, res_d, w_d, visited = st
        node = beam_ids[:, 0]
        beam_d = jnp.concatenate([beam_d[:, 1:], jnp.full((Q, 1), BIG)], 1)
        beam_ids = jnp.concatenate(
            [beam_ids[:, 1:], jnp.full((Q, 1), -1, jnp.int32)], 1)
        nb = graph[pids, jnp.maximum(node, 0)]
        nw = jnp.where(nb >= 0, nb >> 5, nwords - 1)
        nbit = (jnp.maximum(nb, 0) & 31).astype(jnp.uint32)
        words = jnp.take_along_axis(visited, nw, axis=1)
        seen = ((words >> nbit) & 1).astype(bool)
        nb = jnp.where(seen, -1, nb)
        visited = visited.at[rows[:, None], nw].add(
            jnp.where(nb >= 0, jnp.uint32(1) << nbit, jnp.uint32(0)))
        safe = row_map[pids[:, None], jnp.maximum(nb, 0)]
        x = jnp.take(vec, safe, axis=0)
        nrm = jnp.take(norms, safe, axis=0)
        dots = jnp.einsum("qd,qcd->qc", qc, x,
                          preferred_element_type=jnp.float32)
        nd = jnp.where(nb >= 0, nrm - 2.0 * dots, BIG)
        rb = jnp.take(bits, safe, axis=0)
        ok = jnp.any(rb & masks[:, None, :] != 0, axis=-1)
        rd = jnp.where(ok, nd, BIG)
        beam_d, beam_ids, w_d, res_d, res_ids = merge_step(
            beam_d, beam_ids, nd, nb, rd, w_d, res_d, res_ids)
        return beam_ids, beam_d, res_ids, res_d, w_d, visited

    st = (beam_ids, beam_d, res_ids, res_d, w_d, visited)
    st = jax.lax.fori_loop(0, STEPS, body, st)
    return st[3]


r = run(q, pids, vec, norms, bits, graph, row_map, masks)
np.asarray(r)
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    r = run(q, pids, vec, norms, bits, graph, row_map, masks)
np.asarray(r)
dt = (time.perf_counter() - t0) / reps
print(f"pallas-merge: {dt*1000:7.1f} ms total, {dt/STEPS*1e3:6.2f} ms/step",
      flush=True)
