"""Probe: replace the in-loop lax.top_k merges with cheaper selections.

graph_step_profile measured: full loop 5.01 ms/step, no-top_k 0.14 ms/step
=> the three (Q, ~100)-row k=64/18 lax.top_k calls are ~97% of the
iterative graph-search step (TPU top_k at k~n lowers to a per-row sort).

Candidates timed here, same loop skeleton as the shipping body:

  topk       lax.top_k merges (the shipping baseline)
  rank       O(n^2) rank-select: pairwise-comparison rank (unique by index
             tie-break) -> one-hot (rank == slot) matmul extraction. No
             sort, no gather; comparisons ride the VPU, extraction the MXU.
  rank_nomm  rank-select, but the output stays UNSORTED in slot order =
             the (Q, k) arrays keep set-semantics only. Valid for the beam
             (argmin pops), the window (only the ef-th max is read), and
             the result list (host merge re-sorts) — saves the one-hot
             extraction for the ids.

Run: PYTHONPATH=. python scripts/graph_merge_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

Q, M0, D, NPAD, STEPS, EF, K = 2048, 32, 128, 65536, 64, 64, 18
P = 40
BIG = jnp.float32(1e30)

rng = np.random.default_rng(0)
vec = jnp.asarray(rng.standard_normal((1 << 20, D)).astype(np.float32)).astype(jnp.bfloat16)
norms = jnp.asarray(rng.standard_normal(1 << 20).astype(np.float32))
bits = jnp.asarray(rng.integers(0, 2**32, (1 << 20, 4), dtype=np.uint32))
graph = jnp.asarray(rng.integers(0, NPAD, (P, NPAD, M0), dtype=np.int32))
row_map = jnp.asarray(rng.integers(0, 1 << 20, (P, NPAD), dtype=np.int32))
q = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))
masks = jnp.asarray(rng.integers(0, 2**32, (Q, 4), dtype=np.uint32))
pids = jnp.asarray(rng.integers(0, P, Q, dtype=np.int32))


def rank_of(d):
    """(Q, n) -> (Q, n) unique ascending ranks (ties broken by index)."""
    n = d.shape[1]
    lt = d[:, None, :] < d[:, :, None]                      # d_j < d_i
    eq = d[:, None, :] == d[:, :, None]
    jlt = (jnp.arange(n)[None, None, :] < jnp.arange(n)[None, :, None])
    return jnp.sum((lt | (eq & jlt)).astype(jnp.int32), axis=-1)


def rank_topk(d, ids, k, sort_out=True):
    """top-k ascending via rank-select. d may contain +inf."""
    rank = rank_of(jnp.minimum(d, BIG))
    if sort_out:
        oh = (rank[:, :, None] == jnp.arange(k)[None, None, :])
        ohf = oh.astype(jnp.float32)
        safe = jnp.minimum(d, BIG)
        out_d = jnp.einsum("qn,qnk->qk", safe, ohf,
                           preferred_element_type=jnp.float32)
        out_i = jnp.einsum("qn,qnk->qk", ids.astype(jnp.float32), ohf,
                           preferred_element_type=jnp.float32)
        out_d = out_d + jnp.where(
            jnp.any(oh, axis=1), 0.0, jnp.inf)              # empty slot -> inf
        out_d = jnp.where(out_d >= BIG, jnp.inf, out_d)
        return out_d, out_i.astype(jnp.int32)
    # unsorted: keep elements with rank < k, compacted by a masked matmul
    # is unnecessary — just overwrite the d of dropped elements with inf in
    # place and DON'T shrink (caller keeps width n). Probe returns width-n.
    keep = rank < k
    return jnp.where(keep, d, jnp.inf), jnp.where(keep, ids, -1)


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
            sel = jnp.argmin(beam_d, axis=1)
            node = beam_ids[rows, sel]
            beam_d = beam_d.at[rows, sel].set(jnp.inf)
            beam_ids = beam_ids.at[rows, sel].set(-1)
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
            nd = jnp.where(nb >= 0, nrm - 2.0 * dots, jnp.inf)
            rb = jnp.take(bits, safe, axis=0)
            ok = jnp.any(rb & masks[:, None, :] != 0, axis=-1)
            rd = jnp.where(ok, nd, jnp.inf)

            if variant == "topk":
                all_d = jnp.concatenate([beam_d, nd], axis=1)
                all_i = jnp.concatenate([beam_ids, nb], axis=1)
                neg, pos = jax.lax.top_k(-all_d, EF)
                beam_d = -neg
                beam_ids = jnp.take_along_axis(all_i, pos, axis=1)
                neg_w, _ = jax.lax.top_k(
                    -jnp.concatenate([w_d, nd], axis=1), EF)
                w_d = -neg_w
                r_d = jnp.concatenate([res_d, rd], axis=1)
                r_i = jnp.concatenate([res_ids, nb], axis=1)
                neg2, pos2 = jax.lax.top_k(-r_d, K)
                res_d = -neg2
                res_ids = jnp.take_along_axis(r_i, pos2, axis=1)
            else:  # rank
                all_d = jnp.concatenate([beam_d, nd], axis=1)
                all_i = jnp.concatenate([beam_ids, nb], axis=1)
                beam_d, beam_ids = rank_topk(all_d, all_i, EF)
                w_all = jnp.minimum(jnp.concatenate([w_d, nd], axis=1), BIG)
                wr = rank_of(w_all)
                oh = (wr[:, :, None] == jnp.arange(EF)[None, None, :])
                w_d = jnp.einsum("qn,qnk->qk", w_all,
                                 oh.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)
                w_d = jnp.where(w_d >= BIG, jnp.inf, w_d)
                r_d = jnp.concatenate([res_d, rd], axis=1)
                r_i = jnp.concatenate([res_ids, nb], axis=1)
                res_d, res_ids = rank_topk(r_d, r_i, K)
            return beam_ids, beam_d, res_ids, res_d, w_d, visited

        st = (beam_ids, beam_d, res_ids, res_d, w_d, visited)
        st = jax.lax.fori_loop(0, STEPS, body, st)
        return st[3]

    return functools.partial(run, variant=variant)


for variant in ("topk", "rank"):
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
