"""Probe: multi-node expansion for the iterative graph search.

gather_attrib_probe showed the step cost is per-OP latency (visited ops
2.1 ms, graph/row_map 1.5, vec 1.2, bits 0.7 — tracking op count, not
bytes). Classic fix (GPU batched-HNSW style): expand the T closest
unexpanded nodes per step instead of 1 — gather ops stay the same count
but T x wider, steps drop ~T x. Semantics: identical visited set, beam is
popped T at a time (the T nearest unexpanded), so traversal order
interleaves slightly vs 1-at-a-time — recall parity must be re-measured,
termination unchanged.

Times the FULL body (gathers + 3 top_k merges) at T in {1, 2, 4}, with
STEPS scaled so total expansions are constant (64).

Run: PYTHONPATH=. python scripts/expand_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

Q, M0, D, NPAD, EF, K = 2048, 32, 128, 65536, 64, 18
P = 40
TOTAL = 64
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


def make(T):
    steps = TOTAL // T

    @functools.partial(jax.jit, static_argnames=("T",))
    def run(q, pids, vec, norms, bits, graph, row_map, masks, *, T):
        rows = jnp.arange(Q)
        nwords = NPAD // 32 + 1
        visited = jnp.zeros((Q, nwords), jnp.uint32)
        beam_ids = jnp.zeros((Q, EF), jnp.int32)
        beam_d = jnp.zeros((Q, EF), jnp.float32)
        res_d = jnp.full((Q, K), INF)
        res_ids = jnp.full((Q, K), -1, jnp.int32)
        w_d = jnp.full((Q, EF), INF)
        qc = q.astype(vec.dtype)

        def body(t, st):
            beam_ids, beam_d, res_ids, res_d, w_d, visited = st
            # pop the T nearest unexpanded nodes
            negb, selT = jax.lax.top_k(-beam_d, T)            # (Q, T)
            nodes = jnp.take_along_axis(beam_ids, selT, axis=1)
            beam_d = beam_d.at[rows[:, None], selT].set(INF)
            beam_ids = beam_ids.at[rows[:, None], selT].set(-1)
            nb = graph[pids[:, None], jnp.maximum(nodes, 0)]  # (Q, T, M0)
            nb = jnp.where((nodes >= 0)[:, :, None], nb, -1)
            nb = nb.reshape(Q, T * M0)
            nw = jnp.where(nb >= 0, nb >> 5, nwords - 1)
            nbit = (jnp.maximum(nb, 0) & 31).astype(jnp.uint32)
            words = jnp.take_along_axis(visited, nw, axis=1)
            seen = ((words >> nbit) & 1).astype(bool)
            # in-batch duplicate kill (same node from two parents): keep
            # the first occurrence only
            eye = (nb[:, :, None] == nb[:, None, :])
            first = (jax.lax.broadcasted_iota(jnp.int32, (1, T * M0, T * M0), 2)
                     < jax.lax.broadcasted_iota(jnp.int32, (1, T * M0, T * M0), 1))
            dup = jnp.any(eye & first, axis=2)
            nb = jnp.where(seen | dup, -1, nb)
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
            return beam_ids, beam_d, res_ids, res_d, w_d, visited

        st = (beam_ids, beam_d, res_ids, res_d, w_d, visited)
        st = jax.lax.fori_loop(0, steps, body, st)
        return st[3]

    return functools.partial(run, T=T), steps


for T in (1, 2, 4, 8):
    fn, steps = make(T)
    r = fn(q, pids, vec, norms, bits, graph, row_map, masks)
    np.asarray(r)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r = fn(q, pids, vec, norms, bits, graph, row_map, masks)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"T={T}: {dt*1000:7.1f} ms total ({steps} steps, "
          f"{dt/steps*1e3:6.2f} ms/step)", flush=True)
