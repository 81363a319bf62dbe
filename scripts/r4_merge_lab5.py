"""Merge lab 5: the all-Pallas merge (extraction + bitonic pairs) vs the
committed cascade, real shape (8192q x 8192 groups), interleaved.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_merge_lab5.py
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

from r4_extract_kernel import extract_merge_v2

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
(vc, pc_), t = timeit(lambda: cascade_full(mins_d, K, 12, 128),
                      "C cascade t=12 (committed shape)")
results["cascade_t12"] = t
pc_np = np.asarray(pc_)

for sub, tt, keep in [(128, 8, 128), (128, 16, 128), (64, 8, 128),
                      (128, 8, 104)]:
    try:
        (v3, p3), t = timeit(lambda s=sub, tt=tt, kp=keep: extract_merge_v2(
            mins_d, K, sub=s, t=tt, keep=kp),
            f"V2 extract+bitonic sub={sub} t={tt} keep={keep}")
        results[f"v2_s{sub}_t{tt}_k{keep}"] = t
        same = float(np.mean(np.sort(np.asarray(p3), 1)
                             == np.sort(pc_np, 1)))
        print(f"    pos set-match vs cascade: {same:.4f}", flush=True)
    except Exception as e:
        print(f"V2 sub={sub} t={tt} FAILED: {str(e)[:200]}", flush=True)

print(json.dumps(results, indent=2))
with open("/root/repo/results/r4_merge_lab5.json", "w") as f:
    json.dump(results, f, indent=2)
