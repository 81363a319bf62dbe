"""Round-5 wide-kernel roofline (VERDICT-r4 item 4): the 768-d analog of
results/r4_kernel_roofline.json at the shipping geometry 16k queries x
262k rows x 768-d.

Legs:
  mxu_bound     pure int8 (16k,768)@(262k,768)^T -> int32 einsum — the
                practical MXU ceiling for the distance matmul alone
  merge_only    _merge_group_minima('pallas') on the (2048, 16k) packed
                minima shape — the epilogue's isolated cost
  wide:*        int8_masked_topk_wide geometry ladder (the q-resident
                query block fix is in; d_chunk / block_rows / q_tile
                sweep, full search incl. merge)
  narrow768:*   the NARROW kernel forced at d=768 (x blocks (br, 768)
                resident; no d-split) — viable since br shrinks only ~4x

All legs share one synthetic int8 corpus; each variant's (dists, idx) is
cross-checked against the shipping leg on the first 256 queries.

Writes results/r5_wide_roofline.json.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_wide_roofline.py
"""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/artifacts/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import (
    _merge_group_minima, int8_masked_topk, int8_masked_topk_wide,
)

NQ, N, D, RP, K = 16384, 262144, 768, 128, 10
GROUP = 128

rng = np.random.default_rng(0)
vq = jnp.asarray(rng.integers(-100, 100, (N, D), dtype=np.int8))
nq_ = jnp.asarray((np.asarray(vq, np.int64) ** 2).sum(1).astype(np.int32))
r8 = jnp.asarray((rng.random((N, RP)) < 0.05).astype(np.int8))
q8 = jnp.asarray(rng.integers(-100, 100, (NQ, D), dtype=np.int8))
qn = jnp.asarray((np.asarray(q8, np.int64) ** 2).sum(1).astype(np.int32))
m8 = np.zeros((NQ, RP), np.int8)
m8[np.arange(NQ), rng.integers(0, RP, NQ)] = 1
m8 = jnp.asarray(m8)
inv = jnp.float32(1.0)
# score_shift for 768-d at qclip 100: 3*768*100^2 = 2.3e7 > 2^23 -> shift 2
SHIFT = 2

out = {"config": f"{NQ}q x {N} rows x {D}d, r_pad {RP}, k {K}, group {GROUP}",
       "legs": {}}


def timed(fn, passes=5):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(passes):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / passes, r


# ---- bound: the distance matmul alone ---------------------------------
# The full (16k, 262k) int32 product is 17 GB — over HBM, and writing it
# would be bandwidth-bound (21 ms at 819 GB/s) rather than MXU-bound.
# Tile over queries and fuse a row-min so only (qt,) survives per tile:
# the matmul dominates, the reduce rides the VPU in its shadow.
def _bound(a, b):
    def tile(q):
        s = jax.lax.dot_general(q, b, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.min(s, axis=1)
    return jax.lax.map(tile, a.reshape(-1, 2048, a.shape[1]))

bound_fn = jax.jit(_bound)
t, _ = timed(lambda: bound_fn(q8, vq), passes=3)
out["legs"]["mxu_bound"] = {"ms": round(t * 1000, 2)}
print("mxu_bound", out["legs"]["mxu_bound"], flush=True)

# ---- merge epilogue alone ---------------------------------------------
packed = jnp.asarray(
    rng.integers(1, 2**28, (N // GROUP, NQ), dtype=np.int32))
merge_fn = jax.jit(lambda p: _merge_group_minima(
    p, qn, inv, K, GROUP, "pallas", "l2", None, SHIFT))
t, _ = timed(lambda: merge_fn(packed))
out["legs"]["merge_only"] = {"ms": round(t * 1000, 2)}
print("merge_only", out["legs"]["merge_only"], flush=True)

# ---- kernel ladder -----------------------------------------------------
ref_di = None
LEGS = [
    ("wide:br2048_qt512_dc256", "wide", dict(block_rows=2048, q_tile=512,
                                             d_chunk=256)),
    ("wide:br2048_qt512_dc384", "wide", dict(block_rows=2048, q_tile=512,
                                             d_chunk=384)),
    ("wide:br2048_qt512_dc768", "wide", dict(block_rows=2048, q_tile=512,
                                             d_chunk=768)),
    ("wide:br2048_qt1024_dc256", "wide", dict(block_rows=2048, q_tile=1024,
                                              d_chunk=256)),
    ("wide:br4096_qt512_dc256", "wide", dict(block_rows=4096, q_tile=512,
                                             d_chunk=256)),
    ("wide:br1024_qt2048_dc256", "wide", dict(block_rows=1024, q_tile=2048,
                                              d_chunk=256)),
    ("narrow768:br1024_qt512", "narrow", dict(block_rows=1024, q_tile=512)),
    ("narrow768:br2048_qt512", "narrow", dict(block_rows=2048, q_tile=512)),
    ("narrow768:br2048_qt1024", "narrow", dict(block_rows=2048,
                                               q_tile=1024)),
    ("narrow768:br4096_qt512", "narrow", dict(block_rows=4096, q_tile=512)),
]
for name, kind, kw in LEGS:
    kern = int8_masked_topk_wide if kind == "wide" else int8_masked_topk
    try:
        fn = lambda: kern(q8, qn, vq, nq_, r8, m8, inv, K, group=GROUP,
                          merge="pallas", score_shift=SHIFT, **kw)
        t, (dd, ii) = timed(fn)
    except Exception as e:  # Mosaic VMEM / compile failures are data
        out["legs"][name] = {"error": str(e)[:200]}
        print(name, "FAILED", str(e)[:120], flush=True)
        continue
    ii = np.asarray(ii[:256])
    if ref_di is None:
        ref_di = ii
        match = 1.0
    else:
        match = float((ii == ref_di).mean())
    out["legs"][name] = {"ms": round(t * 1000, 2), "match_vs_ship": match}
    print(name, out["legs"][name], flush=True)

with open("results/r5_wide_roofline.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out, indent=2))
