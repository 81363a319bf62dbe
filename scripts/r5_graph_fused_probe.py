"""Round-5 graph-step ladder (VERDICT-r4 item 6): fuse the gather half.

Attribution so far: gathers 3.45 ms/step vs selection 1.34 (Q=2048,
graph_attrib_probe.py), and XLA's row gather runs at ~50 ns/row — the
step issues THREE 65k-row gathers (bf16 vectors, f32 norms, u32 role
bits). Two untried levers, measured here with the honest hash-fed-index
protocol (indices depend on the previous step's result so nothing can be
hoisted; see graph_attrib_probe.py):

  ship        the shipping gather half: vec (bf16) + norms + bits takes
  packed      ONE gather of the int8 arena row [vq | roles8] (232 B);
              norms RECOMPUTED on the VPU from the gathered int8 code
              (||vq||^2 is exact int32 work), admissibility = in-row
              mask8 dot — 3 big takes -> 1
  packed2     like packed but norms still gathered (isolates the
              recompute-vs-gather trade)
  pallas_dma  a Pallas kernel that gathers the same packed rows with
              per-row async DMAs from HBM (8-deep in flight per program)
              — the "fused Pallas traversal step" lever from VERDICT r4;
              measured as gather+pack only (distance math identical
              after either gather, so the gather IS the comparison)

plus full-step variants (selection merges included) for ship/packed.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_graph_fused_probe.py
"""
import functools
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/artifacts/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import os

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TINY = bool(os.environ.get("R5_TINY"))   # CPU shape/correctness check
if TINY:
    Q, M0, D, NPAD, STEPS, EF, K = 128, 8, 32, 512, 4, 16, 10
else:
    Q, M0, D, NPAD, STEPS, EF, K = 2048, 32, 128, 65536, 64, 64, 18
P = 40
RPAD = 104            # 100-role tree world pads to 104 int8 lanes
ROW = D + RPAD        # packed int8 row: [vq | roles8]
INF = jnp.inf

rng = np.random.default_rng(0)
N = 1 << (20 if not TINY else 12)
vec = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32)).astype(jnp.bfloat16)
norms = jnp.asarray(rng.standard_normal(N).astype(np.float32))
bits = jnp.asarray(rng.integers(0, 2**32, (N, 4), dtype=np.uint32))
packed_np = np.concatenate(
    [rng.integers(-127, 128, (N, D), dtype=np.int64).astype(np.int8),
     (rng.random((N, RPAD)) < 0.05).astype(np.int8)], axis=1)
packed = jnp.asarray(packed_np)
nq_i32 = jnp.asarray(
    (packed_np[:, :D].astype(np.int32) ** 2).sum(1).astype(np.int32))
graph = jnp.asarray(rng.integers(0, NPAD, (P, NPAD, M0), dtype=np.int32))
row_map = jnp.asarray(rng.integers(0, N, (P, NPAD), dtype=np.int32))
qf = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))
q8 = jnp.asarray(rng.integers(-127, 128, (Q, D), dtype=np.int64).astype(np.int8))
masks = jnp.asarray(rng.integers(0, 2**32, (Q, 4), dtype=np.uint32))
mask8 = jnp.asarray((rng.random((Q, RPAD)) < 0.1).astype(np.int8))
pids = jnp.asarray(rng.integers(0, P, Q, dtype=np.int32))
rows_iota = jnp.arange(Q)


def hash_nodes(t, acc):
    th = (t.astype(jnp.uint32) * jnp.uint32(2654435761)
          + rows_iota.astype(jnp.uint32) * jnp.uint32(40503)
          + acc.astype(jnp.uint32))
    return (th & jnp.uint32(NPAD - 1)).astype(jnp.int32)


def gather_ship(node):
    nb = graph[pids, node]
    safe = row_map[pids[:, None], nb]
    x = jnp.take(vec, safe, axis=0)
    nrm = jnp.take(norms, safe, axis=0)
    dots = jnp.einsum("qd,qcd->qc", qf.astype(vec.dtype), x,
                      preferred_element_type=jnp.float32)
    nd = nrm - 2.0 * dots
    rb = jnp.take(bits, safe, axis=0)
    ok = jnp.any(rb & masks[:, None, :] != 0, axis=-1)
    return nd, nb, ok


def gather_packed(node, gather_norms):
    nb = graph[pids, node]
    safe = row_map[pids[:, None], nb]
    rowsv = jnp.take(packed, safe, axis=0)              # (Q, M0, ROW) i8
    v8 = rowsv[..., :D]
    r8 = rowsv[..., D:]
    xf = v8.astype(jnp.float32)
    dots = jnp.einsum("qd,qcd->qc", qf, xf,
                      preferred_element_type=jnp.float32)
    if gather_norms:
        nrm = jnp.take(nq_i32, safe, axis=0).astype(jnp.float32)
    else:
        nrm = jnp.einsum("qcd,qcd->qc", xf, xf,
                         preferred_element_type=jnp.float32)
    nd = nrm - 2.0 * dots
    ok = jnp.einsum("qcr,qr->qc", r8.astype(jnp.float32),
                    mask8.astype(jnp.float32),
                    preferred_element_type=jnp.float32) > 0
    return nd, nb, ok


def make_gather_loop(kind):
    @jax.jit
    def run(acc0):
        def body(t, carry):
            acc, sink = carry
            node = hash_nodes(t, acc)
            if kind == "ship":
                nd, nb, ok = gather_ship(node)
            elif kind == "packed":
                nd, nb, ok = gather_packed(node, gather_norms=False)
            else:
                nd, nb, ok = gather_packed(node, gather_norms=True)
            nd = jnp.where(ok, nd, INF)
            acc = acc + jnp.argmin(nd, axis=1).astype(jnp.int32)
            sink = sink + jnp.min(nd, axis=1)
            return acc, sink

        return jax.lax.fori_loop(
            0, STEPS, body, (acc0, jnp.zeros((Q,), jnp.float32)))

    return run


def make_full_loop(kind):
    @jax.jit
    def run(acc0):
        beam_ids = jnp.zeros((Q, EF), jnp.int32)
        beam_d = jnp.zeros((Q, EF), jnp.float32)
        res_d = jnp.full((Q, K), INF)
        res_ids = jnp.full((Q, K), -1, jnp.int32)
        w_d = jnp.full((Q, EF), INF)
        history = jnp.full((Q, STEPS), -1, jnp.int32)

        def body(t, st):
            beam_ids, beam_d, res_ids, res_d, w_d, history, acc = st
            sel = jnp.argmin(beam_d, axis=1)
            node = hash_nodes(t, acc + beam_ids[rows_iota, sel])
            beam_d = beam_d.at[rows_iota, sel].set(INF)
            beam_ids = beam_ids.at[rows_iota, sel].set(-1)
            history = history.at[:, t].set(node)
            if kind == "ship":
                nd, nb, ok = gather_ship(node)
            else:
                nd, nb, ok = gather_packed(node, gather_norms=False)
            seen = (jnp.any(nb[:, :, None] == beam_ids[:, None, :], axis=-1)
                    | jnp.any(nb[:, :, None] == history[:, None, :], axis=-1))
            nb = jnp.where(seen, -1, nb)
            nd = jnp.where(nb >= 0, nd, INF)
            all_d = jnp.concatenate([beam_d, nd], axis=1)
            all_i = jnp.concatenate([beam_ids, nb], axis=1)
            neg, pos = jax.lax.top_k(-all_d, EF)
            beam_d = -neg
            beam_ids = jnp.take_along_axis(all_i, pos, axis=1)
            neg_w, _ = jax.lax.top_k(
                -jnp.concatenate([w_d, nd], axis=1), EF)
            w_d = -neg_w
            rd = jnp.where(ok, nd, INF)
            r_d = jnp.concatenate([res_d, rd], axis=1)
            r_i = jnp.concatenate([res_ids, nb], axis=1)
            neg2, pos2 = jax.lax.top_k(-r_d, K)
            res_d = -neg2
            res_ids = jnp.take_along_axis(r_i, pos2, axis=1)
            acc = acc + jnp.argmin(nd, axis=1).astype(jnp.int32)
            return beam_ids, beam_d, res_ids, res_d, w_d, history, acc

        st = (beam_ids, beam_d, res_ids, res_d, w_d, history, acc0)
        st = jax.lax.fori_loop(0, STEPS, body, st)
        return st[3], st[6]

    return run


# ---- Pallas DMA row-gather: per-row async copies, 8 in flight --------
TQ = 64 if not TINY else 16   # queries per grid program
DEPTH = 8
INTERPRET = TINY


def _dma_gather_kernel(idx_ref, tbl_ref, out_ref, scratch, sems):
    # idx_ref: FULL (Q, M0) int32 arena rows (scalar-prefetch, SMEM);
    # tbl_ref: (N, ROW) int8 HBM; out: (TQ * M0, ROW) int8 VMEM block;
    # scratch (DEPTH, ROW) VMEM.
    nrows = TQ * M0
    base = pl.program_id(0) * TQ

    def issue(slot, r):
        ri = idx_ref[base + r // M0, r % M0]
        return pltpu.make_async_copy(
            tbl_ref.at[pl.ds(ri, 1), :],
            scratch.at[pl.ds(slot, 1), :],
            sems.at[slot],
        )

    # prime DEPTH DMAs, then steady-state: wait slot, copy to out, reissue
    def prime(r, _):
        issue(r, r).start()
        return 0

    jax.lax.fori_loop(0, DEPTH, prime, 0)

    def step(r, _):
        slot = r % DEPTH
        pltpu.make_async_copy(
            tbl_ref.at[pl.ds(idx_ref[r // M0, r % M0], 1), :],
            scratch.at[pl.ds(slot, 1), :], sems.at[slot]).wait()
        out_ref[pl.ds(r, 1), :] = scratch[pl.ds(slot, 1), :]
        nxt = r + DEPTH

        @pl.when(nxt < nrows)
        def _():
            issue(slot, nxt).start()

        return 0

    jax.lax.fori_loop(0, nrows, step, 0)


@jax.jit
def pallas_dma_gather(idx):
    # idx: (Q, M0) arena row ids
    grid = Q // TQ
    return pl.pallas_call(
        _dma_gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((TQ * M0, ROW), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((DEPTH, ROW), jnp.int8),
                            pltpu.SemaphoreType.DMA((DEPTH,))],
        ),
        out_shape=jax.ShapeDtypeStruct((Q * M0, ROW), jnp.int8),
        interpret=INTERPRET,
    )(idx.reshape(grid, TQ, M0).reshape(grid * TQ, M0), packed)


def time_fn(fn, *args, reps=3):
    r = fn(*args)
    jax.tree_util.tree_map(np.asarray, r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.tree_util.tree_map(np.asarray, r)
    return (time.perf_counter() - t0) / reps


def main():
    out = {"config": f"Q={Q} M0={M0} D={D} steps={STEPS} row={ROW}B "
                     "hash-fed indices (graph_attrib_probe protocol)"}
    acc0 = jnp.zeros((Q,), jnp.int32)

    for kind in ("ship", "packed", "packed2"):
        dt = time_fn(make_gather_loop(kind), acc0)
        out[f"gather_{kind}_ms_per_step"] = round(dt / STEPS * 1e3, 3)
        print(f"gather {kind:>8}: {dt/STEPS*1e3:6.3f} ms/step", flush=True)

    for kind in ("ship", "packed"):
        dt = time_fn(make_full_loop(kind), acc0)
        out[f"full_{kind}_ms_per_step"] = round(dt / STEPS * 1e3, 3)
        print(f"full   {kind:>8}: {dt/STEPS*1e3:6.3f} ms/step", flush=True)

    # Pallas DMA gather: one call gathers the same Q*M0 rows; per-step
    # equivalent cost = one call (indices change per step in real use,
    # so no amortization is possible — time single calls)
    try:
        idx = row_map[pids[:, None], graph[pids, hash_nodes(jnp.int32(1), acc0)]]
        dt = time_fn(pallas_dma_gather, idx)
        out["pallas_dma_gather_ms"] = round(dt * 1e3, 3)
        rate = Q * M0 / dt / 1e6
        out["pallas_dma_rows_per_us"] = round(rate, 2)
        print(f"pallas DMA gather: {dt*1e3:.3f} ms for {Q*M0} rows "
              f"({rate:.1f} rows/us)", flush=True)
        # correctness spot check
        got = np.asarray(pallas_dma_gather(idx))
        want = np.asarray(jnp.take(packed, idx.reshape(-1), axis=0))
        assert (got == want).all(), "pallas gather mismatch"
        out["pallas_dma_correct"] = True
    except Exception as e:  # Mosaic may reject the shape; record honestly
        out["pallas_dma_error"] = repr(e)[:300]
        print("pallas DMA gather failed:", repr(e)[:300], flush=True)

    if not TINY:   # TINY is a CPU shape check — never a results artifact
        with open("results/r5_graph_fused_probe.json", "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
