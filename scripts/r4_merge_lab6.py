"""Merge lab 6: the gather-free all-Pallas merge (v3: meta-tracked
extraction + bitonic pairs2) vs cascade, real shape. Correctness is
cross-checked against the trusted cascade in-process.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_merge_lab6.py
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/artifacts/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from r4_extract_kernel import extract_merge_v3, subgroup_extract_pairs

Q = 8192
NG = 8192
K = 100
REPS = 8

rng = np.random.default_rng(0)
packed_host = (rng.integers(1 << 18, 1 << 29, size=(NG, Q), dtype=np.int64)
               .astype(np.int32) & ~np.int32(127))
packed_host |= rng.integers(0, 128, size=(NG, Q), dtype=np.int64).astype(np.int32)
mins_d = jax.device_put(jnp.asarray(packed_host))

_slice8 = jax.jit(lambda x: x.reshape(-1)[:8])


def timeit(fn, label, reps=REPS):
    out = fn()
    np.asarray(_slice8(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    np.asarray(_slice8(jax.tree_util.tree_leaves(outs[-1])[0]))
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{label:52s} {dt:8.2f} ms/pass", flush=True)
    return out, dt


@functools.partial(jax.jit, static_argnames=("k", "t", "sub"))
def cascade_full(mins, k, t, sub):
    mt = jnp.transpose(mins, (1, 0))
    qn_, ng = mt.shape
    m3 = mt.reshape(qn_, ng // sub, sub)
    negs, poss = jax.lax.top_k(-m3, t)
    base = (jnp.arange(ng // sub, dtype=jnp.int32) * sub)[None, :, None]
    cand_pos = (poss + base).reshape(qn_, -1)
    cand_val = (-negs).reshape(qn_, -1)
    neg_top, sel = jax.lax.top_k(-cand_val, k)
    return -neg_top, jnp.take_along_axis(cand_pos, sel, axis=1)


results = {}
(vc, pc_), t = timeit(lambda: cascade_full(mins_d, K, 24, 128),
                      "C cascade t=24 (the committed config)")
results["cascade_t24"] = t
vc_np, pc_np = np.asarray(vc), np.asarray(pc_)

_, t = timeit(lambda: subgroup_extract_pairs(mins_d, 256, 16, 2048),
              "K extract-pairs alone sub=256 t=16")
results["extract_pairs"] = t

for sub, tt in [(256, 16), (128, 8)]:
    try:
        (v3, p3), t = timeit(lambda s=sub, tt=tt: extract_merge_v3(
            mins_d, K, sub=s, t=tt, keep=128),
            f"V3 gather-free sub={sub} t={tt}")
        results[f"v3_s{sub}_t{tt}"] = t
        v3n, p3n = np.asarray(v3), np.asarray(p3)
        vmatch = float(np.mean(np.sort(v3n, 1) == np.sort(vc_np, 1)))
        pmatch = float(np.mean(np.sort(p3n, 1) == np.sort(pc_np, 1)))
        order_ok = bool((np.diff(v3n, axis=1) >= 0).all())
        print(f"    val-match {vmatch:.4f}  pos-match {pmatch:.4f}  "
              f"sorted {order_ok}", flush=True)
    except Exception as e:
        print(f"V3 sub={sub} t={tt} FAILED: {str(e)[:200]}", flush=True)

print(json.dumps(results, indent=2))
with open("/root/repo/results/r4_merge_lab6.json", "w") as f:
    json.dump(results, f, indent=2)
