"""Sub-attribution of the gather half of the iterative graph-search step.

graph_attrib_probe: gathers 3.45 ms/step, selection 1.34 ms/step. This
probe strips one gather at a time from the gather half (selection stays a
min-fold) to find which access dominates:

  all        graph + visited + row_map + vec + norms + bits   (baseline)
  novec      vec/norms gathers replaced by a hash-synthesized x
  novisited  visited take_along_axis + scatter-add removed
  nograph    graph + row_map gathers replaced by hashes
  nobits     role-bits gather removed

Run: PYTHONPATH=. python scripts/gather_attrib_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

Q, M0, D, NPAD, STEPS = 2048, 32, 128, 65536, 64
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
        qc = q.astype(vec.dtype)
        acc0 = jnp.zeros((Q,), jnp.int32)

        def body(t, st):
            visited, acc = st
            th = (t.astype(jnp.uint32) * jnp.uint32(2654435761)
                  + rows.astype(jnp.uint32) * jnp.uint32(40503)
                  + acc.astype(jnp.uint32))
            node = (th & jnp.uint32(NPAD - 1)).astype(jnp.int32)
            if variant == "nograph":
                nb = ((th[:, None] * jnp.uint32(2246822519)
                       + jnp.arange(M0, dtype=jnp.uint32)[None, :]
                       * jnp.uint32(374761393))
                      & jnp.uint32(NPAD - 1)).astype(jnp.int32)
            else:
                nb = graph[pids, node]
            if variant != "novisited":
                nw = jnp.where(nb >= 0, nb >> 5, nwords - 1)
                nbit = (jnp.maximum(nb, 0) & 31).astype(jnp.uint32)
                words = jnp.take_along_axis(visited, nw, axis=1)
                seen = ((words >> nbit) & 1).astype(bool)
                nb = jnp.where(seen, -1, nb)
                visited = visited.at[rows[:, None], nw].add(
                    jnp.where(nb >= 0, jnp.uint32(1) << nbit,
                              jnp.uint32(0)))
            if variant == "nograph":
                safe = (nb & ((1 << 20) - 1)).astype(jnp.int32)
            else:
                safe = row_map[pids[:, None], jnp.maximum(nb, 0)]
            if variant == "novec":
                x = (safe[:, :, None]
                     * jnp.arange(D, dtype=jnp.int32)[None, None, :]
                     ).astype(vec.dtype)
                nrm = safe.astype(jnp.float32)
            else:
                x = jnp.take(vec, safe, axis=0)
                nrm = jnp.take(norms, safe, axis=0)
            dots = jnp.einsum("qd,qcd->qc", qc, x,
                              preferred_element_type=jnp.float32)
            nd = jnp.where(nb >= 0, nrm - 2.0 * dots, INF)
            if variant != "nobits":
                rb = jnp.take(bits, safe, axis=0)
                ok = jnp.any(rb & masks[:, None, :] != 0, axis=-1)
                nd = jnp.where(ok, nd, nd * 0.5)
            acc = acc + jnp.argmin(nd, axis=1).astype(jnp.int32)
            return visited, acc

        st = jax.lax.fori_loop(0, STEPS, body, (visited, acc0))
        return st[1]

    return functools.partial(run, variant=variant)


for variant in ("all", "novec", "novisited", "nograph", "nobits"):
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
