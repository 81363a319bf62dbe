"""Honest per-step cost attribution for the iterative graph search.

graph_step_profile's notopk/gatheronly variants accidentally made the
gather indices LOOP-INVARIANT (beam never updated => node=0 every step),
so XLA hoisted the gathers and the 0.14 ms/step floor measured nothing.
This probe splits the two halves with airtight data flow:

  gathers    per-step pseudo-random node ids (Knuth-hash of t, not
             hoistable); graph/row_map/vec/norms/bits gathers + einsum +
             visited scatter; selection replaced by min-fold into a scalar
             carried into the next step's hash (can't be DCE'd).
  selection  no HBM gathers at all: nd synthesized from beam_d; the three
             lax.top_k merges exactly as shipped.
  both       the full shipping body (reference point).

Run: PYTHONPATH=. python scripts/graph_attrib_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

Q, M0, D, NPAD, STEPS, EF, K = 2048, 32, 128, 65536, 64, 64, 18
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


def make(variant):
    @functools.partial(jax.jit, static_argnames=("variant",))
    def run(q, pids, vec, norms, bits, graph, row_map, masks, *, variant):
        rows = jnp.arange(Q)
        nwords = NPAD // 32 + 1
        visited = jnp.zeros((Q, nwords), jnp.uint32)
        beam_ids = jnp.zeros((Q, EF), jnp.int32)
        beam_d = jnp.zeros((Q, EF), jnp.float32)
        res_d = jnp.full((Q, K), INF)
        res_ids = jnp.full((Q, K), -1, jnp.int32)
        w_d = jnp.full((Q, EF), INF)
        qc = q.astype(vec.dtype)
        acc0 = jnp.zeros((Q,), jnp.int32)

        def gather_half(t, acc, visited):
            # pseudo-random, step-dependent, acc-dependent node ids
            th = (t.astype(jnp.uint32) * jnp.uint32(2654435761)
                  + rows.astype(jnp.uint32) * jnp.uint32(40503)
                  + acc.astype(jnp.uint32))
            node = (th & jnp.uint32(NPAD - 1)).astype(jnp.int32)
            nb = graph[pids, node]
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
            return nd, nb, ok, visited

        def body(t, st):
            beam_ids, beam_d, res_ids, res_d, w_d, visited, acc = st
            if variant == "gathers":
                nd, nb, ok, visited = gather_half(t, acc, visited)
                # fold into acc so next step's indices depend on this one
                acc = acc + jnp.argmin(nd, axis=1).astype(jnp.int32)
                return (beam_ids, beam_d, res_ids, res_d, w_d, visited, acc)
            if variant == "selection":
                # synthesize nd/nb from the beam (no HBM traffic)
                base = beam_d[:, :M0]
                nd = base * 1.0001 + jnp.float32(1.0)
                nb = (beam_ids[:, :M0] * 7 + t) & (NPAD - 1)
                ok = (nb & 1) == 0
            else:
                sel = jnp.argmin(beam_d, axis=1)
                node = beam_ids[rows, sel]
                beam_d = beam_d.at[rows, sel].set(INF)
                beam_ids = beam_ids.at[rows, sel].set(-1)
                nd, nb, ok, visited = gather_half(
                    t * 0 + jnp.max(node), acc, visited)
            rd = jnp.where(ok, nd, INF)
            all_d = jnp.concatenate([beam_d, nd], axis=1)
            all_i = jnp.concatenate([beam_ids, nb], axis=1)
            neg, pos = jax.lax.top_k(-all_d, EF)
            beam_d = -neg
            beam_ids = jnp.take_along_axis(all_i, pos, axis=1)
            neg_w, _ = jax.lax.top_k(-jnp.concatenate([w_d, nd], axis=1), EF)
            w_d = -neg_w
            r_d = jnp.concatenate([res_d, rd], axis=1)
            r_i = jnp.concatenate([res_ids, nb], axis=1)
            neg2, pos2 = jax.lax.top_k(-r_d, K)
            res_d = -neg2
            res_ids = jnp.take_along_axis(r_i, pos2, axis=1)
            return beam_ids, beam_d, res_ids, res_d, w_d, visited, acc

        st = (beam_ids, beam_d, res_ids, res_d, w_d, visited, acc0)
        st = jax.lax.fori_loop(0, STEPS, body, st)
        return st[3], st[6]

    return functools.partial(run, variant=variant)


for variant in ("gathers", "selection", "both"):
    fn = make(variant)
    r = fn(q, pids, vec, norms, bits, graph, row_map, masks)
    np.asarray(r[0]), np.asarray(r[1])
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r = fn(q, pids, vec, norms, bits, graph, row_map, masks)
    np.asarray(r[0]), np.asarray(r[1])
    dt = (time.perf_counter() - t0) / reps
    print(f"{variant:>10}: {dt*1000:7.1f} ms total, "
          f"{dt/STEPS*1e3:6.2f} ms/step", flush=True)
