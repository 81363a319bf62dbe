"""Probe: bitonic-network merges for the iterative graph-search loop.

graph_merge_probe measured lax.top_k merges at 5.1 ms/step and O(n^2)
rank-select at 3.9 — both dominated by selection, while the rest of the
body is 0.14 ms/step. This probe keeps beam/window/result lists SORTED and
replaces every top_k with static bitonic networks:

  pop       = shift-left (sorted ascending => min is column 0; no argmin,
              no scatter)
  sort32    = 15-stage bitonic sort of the M0=32 new neighbor distances
              (payload: ids), once per step (plus one for the filtered key)
  merge     = pad to pow2 with +inf, reverse the second list, one
              log2(L)-stage bitonic merge; keep the first ef/kk columns

All compare-exchanges are elementwise min/max/where over (Q, <=128) lanes —
no lax.sort, no per-row gathers.

Run: PYTHONPATH=. python scripts/graph_bitonic_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

Q, M0, D, NPAD, STEPS, EF, K = 2048, 32, 128, 65536, 64, 64, 32
P = 40
INF = jnp.inf

rng = np.random.default_rng(0)
vec = jnp.asarray(rng.standard_normal((1 << 20, D)).astype(np.float32)).astype(jnp.bfloat16)
norms = jnp.asarray(rng.standard_normal(1 << 20).astype(np.float32))
bits = jnp.asarray(rng.integers(0, 2**32, (1 << 20, 4), dtype=np.uint32))
graph = jnp.asarray(rng.integers(0, NPAD, (P, NPAD, M0), dtype=np.int32))
row_map = jnp.asarray(rng.integers(0, 1 << 20, (P, NPAD), dtype=np.int32))
q = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))
masks = jnp.asarray(rng.integers(0, 2**32, (Q, 4), dtype=np.uint32))
pids = jnp.asarray(rng.integers(0, P, Q, dtype=np.int32))


def _cmpex(a_d, a_i, b_d, b_i):
    pred = a_d <= b_d
    return (jnp.where(pred, a_d, b_d), jnp.where(pred, a_i, b_i),
            jnp.where(pred, b_d, a_d), jnp.where(pred, b_i, a_i))


def bitonic_merge(d, ids, asc=True):
    L = d.shape[-1]
    if L == 1:
        return d, ids
    h = L // 2
    lo_d, lo_i, hi_d, hi_i = _cmpex(d[..., :h], ids[..., :h],
                                    d[..., h:], ids[..., h:])
    if not asc:
        lo_d, lo_i, hi_d, hi_i = hi_d, hi_i, lo_d, lo_i
    lo_d, lo_i = bitonic_merge(lo_d, lo_i, asc)
    hi_d, hi_i = bitonic_merge(hi_d, hi_i, asc)
    return (jnp.concatenate([lo_d, hi_d], -1),
            jnp.concatenate([lo_i, hi_i], -1))


def bitonic_sort(d, ids, asc=True):
    L = d.shape[-1]
    if L == 1:
        return d, ids
    h = L // 2
    a_d, a_i = bitonic_sort(d[..., :h], ids[..., :h], True)
    b_d, b_i = bitonic_sort(d[..., h:], ids[..., h:], False)
    return bitonic_merge(jnp.concatenate([a_d, b_d], -1),
                         jnp.concatenate([a_i, b_i], -1), asc)


def merge_sorted(a_d, a_i, b_d, b_i, out):
    """Merge two sorted-ascending lists; b is padded to pow2 with +inf."""
    la, lb = a_d.shape[-1], b_d.shape[-1]
    tot = la + lb
    ltot = 1 << (tot - 1).bit_length()
    pad = ltot - tot
    if pad:
        b_d = jnp.concatenate(
            [b_d, jnp.full(b_d.shape[:-1] + (pad,), INF, b_d.dtype)], -1)
        b_i = jnp.concatenate(
            [b_i, jnp.full(b_i.shape[:-1] + (pad,), -1, b_i.dtype)], -1)
    c_d = jnp.concatenate([a_d, b_d[..., ::-1]], -1)
    c_i = jnp.concatenate([a_i, b_i[..., ::-1]], -1)
    d, i = bitonic_merge(c_d, c_i, True)
    return d[..., :out], i[..., :out]


def make(variant):
    @functools.partial(jax.jit, static_argnames=("variant",))
    def run(q, pids, vec, norms, bits, graph, row_map, masks, *, variant):
        rows = jnp.arange(Q)
        nwords = NPAD // 32 + 1
        visited = jnp.zeros((Q, nwords), jnp.uint32)
        beam_ids = jnp.zeros((Q, EF), jnp.int32)
        beam_d = jnp.zeros((Q, EF), jnp.float32)
        res_d = jnp.full((Q, K), jnp.inf)
        res_ids = jnp.full((Q, K), -1, jnp.int32)
        w_d = jnp.full((Q, EF), jnp.inf)
        qc = q.astype(vec.dtype)

        def body(t, st):
            beam_ids, beam_d, res_ids, res_d, w_d, visited = st
            # pop: sorted beam => column 0 is the min
            node = beam_ids[:, 0]
            beam_d = jnp.concatenate(
                [beam_d[:, 1:], jnp.full((Q, 1), INF)], axis=1)
            beam_ids = jnp.concatenate(
                [beam_ids[:, 1:], jnp.full((Q, 1), -1, jnp.int32)], axis=1)
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
            nd = jnp.where(nb >= 0, nrm - 2.0 * dots, INF)
            rb = jnp.take(bits, safe, axis=0)
            ok = jnp.any(rb & masks[:, None, :] != 0, axis=-1)
            rd = jnp.where(ok, nd, INF)

            # one sort of the new neighbors by nd (payload ids)
            snd, snb = bitonic_sort(nd, nb)
            beam_d, beam_ids = merge_sorted(beam_d, beam_ids, snd, snb, EF)
            w_d, _ = merge_sorted(w_d, jnp.zeros_like(w_d, jnp.int32),
                                  snd, snb, EF)
            # filtered key sorts separately (rd order != nd order)
            srd, srb = bitonic_sort(rd, nb)
            res_d, res_ids = merge_sorted(res_d, res_ids, srd, srb, K)
            return beam_ids, beam_d, res_ids, res_d, w_d, visited

        st = (beam_ids, beam_d, res_ids, res_d, w_d, visited)
        st = jax.lax.fori_loop(0, STEPS, body, st)
        return st[3]

    return functools.partial(run, variant=variant)


for variant in ("bitonic",):
    fn = make(variant)
    r = fn(q, pids, vec, norms, bits, graph, row_map, masks)
    np.asarray(r)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r = fn(q, pids, vec, norms, bits, graph, row_map, masks)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{variant:>10}: {dt*1000:7.1f} ms total, "
          f"{dt/STEPS*1e3:6.2f} ms/step", flush=True)
