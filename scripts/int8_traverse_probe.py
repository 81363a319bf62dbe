"""Probe: int8 quantized distances inside the iterative graph traversal.

After the compare-dedup rework the step is ~3.4 ms (Q=2048); the vector
gather is ~1.2 ms of it at bf16 (256 B/row). The arena already keeps an
int8 mirror (ArenaQuant): gathering int8 rows (128 B) and computing
int32 quantized distances (MXU int8 einsum) halves the dominant gather's
traffic. Distances stay monotone in the quantized domain (the flagship
flat kernel already serves from it; SIFT-family corpora are lossless at
scale 1), so beam/window/result ordering is unchanged up to quantization
ties; callers rerank/dedupe on the host as before.

  bf16   shipping traversal (bf16 rows, f32 distances)
  int8   int8 rows, int32 distances cast to f32 for the merges

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/int8_traverse_probe.py
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
vec_f = rng.standard_normal((1 << 20, D)).astype(np.float32) * 20.0
vec = jnp.asarray(vec_f).astype(jnp.bfloat16)
vec8 = jnp.asarray(np.clip(np.round(vec_f), -128, 127).astype(np.int8))
norms = jnp.asarray(np.einsum("nd,nd->n", vec_f, vec_f).astype(np.float32))
norms8 = jnp.asarray(
    np.einsum("nd,nd->n",
              np.clip(np.round(vec_f), -128, 127).astype(np.int32),
              np.clip(np.round(vec_f), -128, 127).astype(np.int32),
              ).astype(np.int32))
bits = jnp.asarray(rng.integers(0, 2**32, (1 << 20, 4), dtype=np.uint32))
graph = jnp.asarray(rng.integers(0, NPAD, (P, NPAD, M0), dtype=np.int32))
row_map = jnp.asarray(rng.integers(0, 1 << 20, (P, NPAD), dtype=np.int32))
q = jnp.asarray((rng.standard_normal((Q, D)) * 20).astype(np.float32))
masks = jnp.asarray(rng.integers(0, 2**32, (Q, 4), dtype=np.uint32))
pids = jnp.asarray(rng.integers(0, P, Q, dtype=np.int32))


def make(variant):
    @functools.partial(jax.jit, static_argnames=("variant",))
    def run(q, pids, vec, norms, vec8, norms8, bits, graph, row_map, masks,
            *, variant):
        rows = jnp.arange(Q)
        history = jnp.full((Q, STEPS), -1, jnp.int32)
        beam_ids = jnp.zeros((Q, EF), jnp.int32)
        beam_d = jnp.zeros((Q, EF), jnp.float32)
        res_d = jnp.full((Q, K), INF)
        res_ids = jnp.full((Q, K), -1, jnp.int32)
        w_d = jnp.full((Q, EF), INF)
        if variant == "int8":
            q8 = jnp.clip(jnp.round(q), -128, 127).astype(jnp.int8)
        qc = q.astype(vec.dtype)

        def body(t, st):
            beam_ids, beam_d, res_ids, res_d, w_d, history = st
            sel = jnp.argmin(beam_d, axis=1)
            node = beam_ids[rows, sel]
            beam_d = beam_d.at[rows, sel].set(INF)
            beam_ids = beam_ids.at[rows, sel].set(-1)
            history = history.at[:, t].set(node)
            nb = graph[pids, jnp.maximum(node, 0)]
            seen = (jnp.any(nb[:, :, None] == beam_ids[:, None, :], axis=-1)
                    | jnp.any(nb[:, :, None] == history[:, None, :], axis=-1))
            nb = jnp.where(seen, -1, nb)
            safe = row_map[pids[:, None], jnp.maximum(nb, 0)]
            if variant == "int8":
                x = jnp.take(vec8, safe, axis=0)
                nrm = jnp.take(norms8, safe, axis=0)
                dots = jnp.einsum("qd,qcd->qc", q8, x,
                                  preferred_element_type=jnp.int32)
                nd = (nrm - 2 * dots).astype(jnp.float32)
            else:
                x = jnp.take(vec, safe, axis=0)
                nrm = jnp.take(norms, safe, axis=0)
                dots = jnp.einsum("qd,qcd->qc", qc, x,
                                  preferred_element_type=jnp.float32)
                nd = nrm - 2.0 * dots
            nd = jnp.where(nb >= 0, nd, INF)
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
            return beam_ids, beam_d, res_ids, res_d, w_d, history

        st = (beam_ids, beam_d, res_ids, res_d, w_d, history)
        st = jax.lax.fori_loop(0, STEPS, body, st)
        return st[3]

    return functools.partial(run, variant=variant)


for variant in ("bf16", "int8"):
    fn = make(variant)
    r = fn(q, pids, vec, norms, vec8, norms8, bits, graph, row_map, masks)
    np.asarray(r)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r = fn(q, pids, vec, norms, vec8, norms8, bits, graph, row_map,
               masks)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{variant:>10}: {dt*1000:7.1f} ms total, "
          f"{dt/STEPS*1e3:6.2f} ms/step", flush=True)
