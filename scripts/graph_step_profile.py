"""Per-step cost attribution for the batched iterative graph search.

The single-slab hybrid pass spends ~397 ms in ONE multi-graph dispatch
(2048 queries x <=64 steps): ~6 ms/step. Candidate costs per step: the
visited-bitmap scatter-add (TPU scatters can serialize per update), the
(Q, M0, d) neighbor gather, and 3 lax.top_k calls. This probe times
stripped-down while_loop variants on the real chip to attribute the cost:

  full       the shipping loop body (bitmap scatter + gathers + top_ks)
  noscatter  same, visited updates removed (dedup disabled)
  notopk     scatter kept, beam/window/result top_ks replaced with min
  gatheronly gathers + distance einsum only

All device arrays are passed as jit ARGUMENTS (closed-over jnp arrays
become compile-payload constants — a 0.5 GB vec table 413s the tunnel).

Writes per-variant ms/step to stdout (no artifact — a design probe).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

Q, M0, D, NPAD, STEPS, EF, K = 2048, 32, 128, 65536, 64, 64, 18
P = 40

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
        res_d = jnp.full((Q, K), jnp.inf)
        qc = q.astype(vec.dtype)

        def body(t, st):
            beam_ids, beam_d, res_d, visited = st
            sel = jnp.argmin(beam_d, axis=1)
            node = beam_ids[rows, sel]
            nb = graph[pids, jnp.maximum(node, 0)]
            if variant != "gatheronly":
                nw = jnp.where(nb >= 0, nb >> 5, nwords - 1)
                nbit = (jnp.maximum(nb, 0) & 31).astype(jnp.uint32)
                words = jnp.take_along_axis(visited, nw, axis=1)
                seen = ((words >> nbit) & 1).astype(bool)
                nb = jnp.where(seen, -1, nb)
                if variant != "noscatter":
                    visited = visited.at[rows[:, None], nw].add(
                        jnp.where(nb >= 0, jnp.uint32(1) << nbit,
                                  jnp.uint32(0)))
            safe = row_map[pids[:, None], jnp.maximum(nb, 0)]
            x = jnp.take(vec, safe, axis=0)
            nrm = jnp.take(norms, safe, axis=0)
            dots = jnp.einsum("qd,qcd->qc", qc, x,
                              preferred_element_type=jnp.float32)
            nd = nrm - 2.0 * dots
            rb = jnp.take(bits, safe, axis=0)
            ok = jnp.any(rb & masks[:, None, :] != 0, axis=-1)
            nd = jnp.where(ok, nd, jnp.inf)
            if variant == "notopk" or variant == "gatheronly":
                beam_d = beam_d.at[:, 0].set(jnp.min(nd, axis=1) + t)
            else:
                all_d = jnp.concatenate([beam_d, nd], axis=1)
                all_i = jnp.concatenate([beam_ids, nb], axis=1)
                neg, pos = jax.lax.top_k(-all_d, EF)
                beam_d = -neg
                beam_ids = jnp.take_along_axis(all_i, pos, axis=1)
                r = jnp.concatenate([res_d, nd], axis=1)
                neg2, _ = jax.lax.top_k(-r, K)
                res_d = -neg2
            return beam_ids, beam_d, res_d, visited

        st = (beam_ids, beam_d, res_d, visited)
        st = jax.lax.fori_loop(0, STEPS, body, st)
        return st[2]

    return functools.partial(run, variant=variant)


for variant in ("full", "noscatter", "notopk", "gatheronly"):
    fn = make(variant)
    r = fn(q, pids, vec, norms, bits, graph, row_map, masks)
    np.asarray(r)  # compile+run
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r = fn(q, pids, vec, norms, bits, graph, row_map, masks)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{variant:>10}: {dt*1000:7.1f} ms total, "
          f"{dt/STEPS*1e3:6.2f} ms/step", flush=True)
