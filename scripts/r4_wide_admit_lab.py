"""Round-4 admit-dedup A/B for the WIDE (d-split) kernel at cohere shapes.

The narrow kernel's admit-dedup (r4_admit_lab.py: scan 20.9 -> 16.0 ms)
wins big at 128-d because the admissibility matmul (contraction
R_pad=128) costs as much as the distance matmul (d=128). At 768-d the
admit matmul is only r_pad/(d_pad+r_pad) ~ 14% of kernel MACs while the
slot padding the host pays (cohere tree-RBAC: 16384 -> 18432 queries,
p=1.125) inflates ALL work. Break-even: p < (d+r/sb... precisely
(d_pad + r_pad) / (d_pad + r_pad/sb) = 896/776 = 1.155 on matmul MACs
alone — the measured number decides whether the wide default stays on.

Legs (shipping int8_masked_topk_wide, chained-dispatch device timing):
  control      Q=16384, per-query masks            [dedup off]
  dedup_p1125  Q=18432, per-slot masks (sb=16)     [real cohere padding]
  dedup_p1     Q=16384, per-slot masks (sb=16)     [zero-padding bound]

Writes results/r4_wide_admit_lab.json.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_wide_admit_lab.py
"""
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/artifacts/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import int8_masked_topk_wide

Q, N, D, R = 16384, 262144, 768, 128
# group=32 keeps n_groups=8192 at N=262144 — the same merge
# shape the shipping index picks at 1M/group=128; merge="pallas"
# is the shipping merge
SB, Q_TILE, BLOCK_ROWS, GROUP, K = 16, 512, 2048, 32, 100
NSB = Q_TILE // SB
N_MASKS = 100

rng = np.random.default_rng(0)
x8 = jnp.asarray(rng.integers(-100, 100, (N, D), dtype=np.int8))
norms = jnp.asarray(
    (np.asarray(rng.integers(-100, 100, (N, D), dtype=np.int8),
                np.int64) ** 2).sum(1).astype(np.int32))
roles8 = jnp.asarray((rng.random((N, R)) < 0.05).astype(np.int8))
pool = (rng.random((N_MASKS, R)) < 0.08).astype(np.int8)


def interleaved(nq):
    """query j of tile t carries slot (j % NSB); slot s uses pool mask
    s % N_MASKS — the layout Int8FlatIndex's finalize scatter produces."""
    qi = np.arange(nq)
    mask_id = ((qi // Q_TILE) * NSB + (qi % NSB)) % N_MASKS
    slot_id = np.arange(nq // SB) % N_MASKS
    return pool[mask_id], pool[slot_id]


def chain_time(fn, reps=6, chains=4):
    out = fn()
    jax.block_until_ready(out)
    walls = []
    for _ in range(chains):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        np.asarray(out[0][:8])
        walls.append((time.perf_counter() - t0) / reps * 1000)
    return float(np.min(walls))


out = {"sb": SB, "shape": f"{N}x{D}, r_pad {R}, q_tile {Q_TILE}, "
                          f"block_rows {BLOCK_ROWS}"}
legs = {}
for name, nq, dedup in [("control", Q, False),
                        ("dedup_p1125", int(Q * 1.125), True),
                        ("dedup_p1", Q, True)]:
    q8 = jnp.asarray(rng.integers(-100, 100, (nq, D), dtype=np.int8))
    qn = jnp.zeros(nq, jnp.int32)
    m_q, m_sb = interleaved(nq)
    masks = jnp.asarray(m_sb if dedup else m_q)
    kw = dict(q_tile=Q_TILE, block_rows=BLOCK_ROWS, group=GROUP,
              merge="pallas", metric="l2")
    if dedup:
        kw["mask_sub_block"] = SB
    fn = lambda: int8_masked_topk_wide(  # noqa: E731
        q8, qn, x8, norms, roles8, masks, jnp.float32(1.0), K, **kw)
    ms = chain_time(fn)
    # every leg SERVES Q=16384 logical queries (padding is overhead the
    # dedup legs pay), so walls compare directly
    legs[name] = {"nq_scanned": nq, "wall_ms": round(ms, 2)}
    print(f"[{name}] nq={nq} {ms:.2f} ms", flush=True)

c = legs["control"]["wall_ms"]
out["legs"] = legs
out["speedup_real_padding"] = round(c / legs["dedup_p1125"]["wall_ms"], 4)
out["speedup_zero_padding"] = round(c / legs["dedup_p1"]["wall_ms"], 4)

with open("results/r4_wide_admit_lab.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out, indent=1))
