"""Round-4 admit-dedup lab: shrink the fused kernel's SECOND matmul.

The fused scan pays two int8 MXU matmuls per (chunk, q_tile): distances
(x . q, contraction d=128) and admissibility (roles . user_onehot,
contraction R_pad=128) — each ~6.9 ms/8192q at the measured 250 TOPS
K=128 rate (results/r4_kernel_lab.json: floor 17.5 = 2 matmuls + bare
min; control 23.0). But admissibility depends only on (row, MASK), and
real RBAC workloads have far fewer distinct masks than queries (tree
RBAC 10k users / 100 roles -> exactly 100 distinct masks; a 32k-query
workload repeats each ~328x). If the host groups queries by mask into
SB-query sub-blocks (4.4% padding at SB=32), the admit matmul shrinks
SB-fold: (chunk, R) x (R, TQ/SB), then a lane-space repeat expands
(chunk, TQ/SB) -> (chunk, TQ) on the VPU.

Expected: admit matmul 6.9 -> 0.2 ms + repeat ~1-2 ms => scan 23 ->
~18 ms. This lab measures a lab-local kernel variant against the
shipping kernel (same chained-dispatch protocol as r4_kernel_lab) and
checks bit-identical packed minima on mask-grouped inputs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_admit_lab.py
CPU parity only: JAX_PLATFORMS=cpu python scripts/r4_admit_lab.py --parity
"""

import argparse
import functools
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/artifacts/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import (
    LANES, MASKED_I32, int8_masked_topk,
)

# ---------------------------------------------------------------- variant


def _make_kernel_sb(chunk: int, group: int, sb: int, repeat_mode: str):
    """Sub-block-mask variant of pallas_scan_int8._make_kernel: m_ref is
    (TQ // sb, R) — one user one-hot per SB consecutive queries."""

    def _kernel(q_ref, x_ref, n_ref, r_ref, m_ref, out_ref):
        q = q_ref[:]
        m = m_ref[:]                                  # (TQ/sb, R)
        b_total = x_ref.shape[0]
        tq = q.shape[0]
        nsb = tq // sb
        g_per_chunk = chunk // group
        lane = jax.lax.broadcasted_iota(jnp.int32, (g_per_chunk, group, tq), 1)

        def chunk_body(c, _):
            row0 = pl.multiple_of(c * chunk, LANES)
            x = x_ref[pl.ds(row0, chunk), :]
            r = r_ref[pl.ds(row0, chunk), :]
            dots = jax.lax.dot_general(
                x, q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)     # (chunk, TQ)
            score = n_ref[0, pl.ds(row0, chunk)][:, None] - 2 * dots
            admit_s = jax.lax.dot_general(
                r, m, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)     # (chunk, TQ/sb)
            if repeat_mode == "pltpu":
                # pltpu.repeat is TILE-style (x repeated whole): query j
                # must carry mask column j % nsb (host interleaves)
                admit = pltpu.repeat(admit_s, sb, axis=1)
            elif repeat_mode == "bcast":
                # elementwise grouping: query j carries mask j // sb
                admit = jnp.broadcast_to(
                    admit_s[:, :, None], (chunk, nsb, sb)
                ).reshape(chunk, tq)
            else:  # jnp.repeat lowering
                admit = jnp.repeat(admit_s, sb, axis=1)
            s3 = score.reshape(g_per_chunk, group, tq)
            a3 = admit.reshape(g_per_chunk, group, tq)
            packed = jnp.where(
                a3 > 0, jax.lax.shift_left(s3, 7) | lane,
                jnp.full_like(s3, MASKED_I32))
            mins = jnp.min(packed, axis=1)
            g0 = pl.multiple_of(c * g_per_chunk, 8)
            out_ref[pl.ds(g0, g_per_chunk), :] = mins
            return 0

        jax.lax.fori_loop(0, b_total // chunk, chunk_body, 0)

    return _kernel


@functools.partial(jax.jit, static_argnames=(
    "q_tile", "block_rows", "group", "sb", "repeat_mode", "interpret"))
def scan_sb(queries_q, vectors_q, norms_q, roles8, masks_sb,
            q_tile=2048, block_rows=131072, group=128, sb=32,
            repeat_mode="bcast", interpret=False):
    nq, d = queries_q.shape
    npad = vectors_q.shape[0]
    chunk = 1024 if block_rows % 1024 == 0 else max(group, LANES)
    n_groups = npad // group
    grid = (nq // q_tile, npad // block_rows)
    r_pad = roles8.shape[1]
    return pl.pallas_call(
        _make_kernel_sb(chunk, group, sb, repeat_mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, r_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile // sb, r_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows // group, q_tile),
                               lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_groups, nq), jnp.int32),
        interpret=interpret,
    )(queries_q, vectors_q, norms_q.reshape(1, npad), roles8, masks_sb)


# ---------------------------------------------------------------- helpers


def make_world(nq, n, d, r, n_masks, seed=0, sb=32, block_rows=256):
    rng = np.random.default_rng(seed)
    npad = -(-n // block_rows) * block_rows
    q8 = rng.integers(-100, 100, (nq, d), dtype=np.int8)
    x8 = rng.integers(-100, 100, (n, d), dtype=np.int8)
    roles8 = (rng.random((n, r)) < 0.05).astype(np.int8)
    if npad > n:  # pad rows: all-zero roles = never admissible
        x8 = np.concatenate([x8, np.zeros((npad - n, d), np.int8)])
        roles8 = np.concatenate([roles8, np.zeros((npad - n, r), np.int8)])
    norms = (x8.astype(np.int64) ** 2).sum(1).astype(np.int32)
    # distinct masks, queries GROUPED: query j uses mask j // sb (cycled)
    masks_pool = (rng.random((n_masks, r)) < 0.08).astype(np.int8)
    sub_ids = (np.arange(nq) // sb) % n_masks
    masks_q = masks_pool[sub_ids]                  # per-query (control)
    masks_sb = masks_pool[sub_ids[::sb]]           # per-sub-block (variant)
    return q8, x8, norms, roles8, masks_q, masks_sb, masks_pool


def interleave(nq, q_tile, sb, masks_pool):
    """pltpu.repeat is TILE-style: within a q_tile, query j carries mask
    slot j % nsb (nsb = q_tile // sb). Returns (per-query masks for the
    control, per-slot masks for the variant) under that layout; slot row
    r (global) uses pool mask r % n_masks."""
    n_masks = len(masks_pool)
    nsb = q_tile // sb
    qidx = np.arange(nq)
    mask_id = ((qidx // q_tile) * nsb + (qidx % nsb)) % n_masks
    slot_id = np.arange(nq // sb) % n_masks
    return masks_pool[mask_id], masks_pool[slot_id]


def parity(interpret, sb=8, repeat_mode="bcast", q_tile=32,
           block_rows=256, group=8):
    q8, x8, norms, roles8, masks_q, masks_sb, pool = make_world(
        64, 512, 128, 128, n_masks=5, sb=sb)
    if repeat_mode == "pltpu":  # tile-style repeat: interleaved layout
        masks_q, masks_sb = interleave(64, q_tile, sb, pool)
    ctl = int8_masked_topk(
        jnp.asarray(q8), jnp.zeros(64, jnp.int32), jnp.asarray(x8),
        jnp.asarray(norms), jnp.asarray(roles8), jnp.asarray(masks_q),
        jnp.float32(1.0), k=8, q_tile=q_tile, block_rows=block_rows,
        group=group, merge="none", interpret=interpret)[0]
    var = scan_sb(jnp.asarray(q8), jnp.asarray(x8), jnp.asarray(norms),
                  jnp.asarray(roles8), jnp.asarray(masks_sb),
                  q_tile=q_tile, block_rows=block_rows, group=group, sb=sb,
                  repeat_mode=repeat_mode, interpret=interpret)
    same = bool(jnp.array_equal(ctl, var))
    print(f"parity[{repeat_mode}, sb={sb}]: {'BIT-IDENTICAL' if same else 'MISMATCH'}")
    return same


def chain_time(fn, args, reps=8, chains=4):
    out = fn(*args)
    jax.block_until_ready(out)
    walls = []
    for _ in range(chains):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(out[0, :8] if out.ndim == 2 else out[0][:8])
        walls.append((time.perf_counter() - t0) / reps * 1000)
    return float(np.min(walls))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--sb", type=int, default=32)
    args = ap.parse_args()

    if args.parity or jax.devices()[0].platform == "cpu":
        ok = True
        for mode in ("bcast", "jnp", "pltpu"):
            try:
                ok &= parity(interpret=True, repeat_mode=mode)
            except Exception as e:  # noqa: BLE001 — lab probe
                print(f"parity[{mode}]: LOWERING FAILED: {type(e).__name__}: {e}")
        return

    Q, N, D, R = 8192, 1_000_000, 128, 128
    sb = args.sb
    q8, x8, norms, roles8, masks_q, masks_sb, pool = make_world(
        Q, N, D, R, n_masks=100, sb=sb, block_rows=8192)
    masks_q_il, masks_sb_il = interleave(Q, 2048, sb, pool)
    dev = {k: jnp.asarray(v) for k, v in
           dict(q8=q8, x8=x8, norms=norms, roles8=roles8,
                masks_q=masks_q_il, masks_sb=masks_sb_il).items()}
    qn = jnp.zeros(Q, jnp.int32)
    out = {"sb": sb}

    ctl = lambda: int8_masked_topk(  # noqa: E731
        dev["q8"], qn, dev["x8"], dev["norms"], dev["roles8"],
        dev["masks_q"], jnp.float32(1.0), k=100, q_tile=2048,
        block_rows=8192, group=128, merge="none")[0]
    out["control_none_ms"] = chain_time(lambda: ctl(), (), reps=8)
    print("control scan (merge=none):", round(out["control_none_ms"], 2), "ms",
          flush=True)

    for mode in ("pltpu",):  # bcast/jnp: Mosaic "unsupported shape cast"
        try:
            fn = lambda: scan_sb(  # noqa: E731
                dev["q8"], dev["x8"], dev["norms"], dev["roles8"],
                dev["masks_sb"], q_tile=2048, block_rows=8192,
                group=128, sb=sb, repeat_mode=mode)
            ms = chain_time(lambda: fn(), (), reps=8)
            out[f"sb_{mode}_ms"] = ms
            # device parity vs control (identical packing expected for
            # bcast/jnp; pltpu tile-order differs unless host interleaves)
            same = bool(jnp.array_equal(ctl(), fn()))
            out[f"sb_{mode}_parity"] = same
            print(f"sb[{mode}]: {ms:.2f} ms  parity={same}", flush=True)
        except Exception as e:  # noqa: BLE001 — lab probe
            out[f"sb_{mode}_error"] = f"{type(e).__name__}: {e}"
            print(f"sb[{mode}]: FAILED {type(e).__name__}: {e}", flush=True)

    with open("results/r4_admit_lab.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
