"""Merge lab 3: split the cascade's cost (stage-1 subgroup top_k vs
stage-2 final top_k) and try fused unrolled extraction.

Key trick for extraction variants: during the merge we may DROP the 7
lane bits of the packed (score<<7|lane) value and splice in the
position-within-subgroup instead — selection only needs score order;
the final stage re-gathers the EXACT packed values (lane included) by
position. With positions embedded, top-1 per subgroup is a pure min
tree, and t extraction rounds become min + mask repeated — written
UNROLLED (python loop, no lax.scan) so XLA can fuse all rounds into one
HBM pass instead of t round-trips (lab 2's scan-based extraction was
HBM-bound at ~24 ms).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_merge_lab3.py
"""

import functools
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/artifacts/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

Q = 8192
NG = 8192
K = 100
REPS = 6

rng = np.random.default_rng(0)
packed_host = (rng.integers(1 << 18, 1 << 29, size=(NG, Q), dtype=np.int64)
               .astype(np.int32) & ~np.int32(127))
packed_host |= rng.integers(0, 128, size=(NG, Q), dtype=np.int64).astype(np.int32)
mins_d = jax.device_put(jnp.asarray(packed_host))
mins_t_host = packed_host.T.copy()
mins_td = jax.device_put(jnp.asarray(mins_t_host))     # (Q, NG) pre-transposed
cand_host = mins_t_host[:, :768].copy()                # stage-2 stand-in
cand_d = jax.device_put(jnp.asarray(cand_host))

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


results = {}

# ---- split: stage 1 alone (on pre-transposed input) ----------------------
@functools.partial(jax.jit, static_argnames=("t", "sub"))
def stage1(mt, t, sub):
    qn_, ng = mt.shape
    m3 = mt.reshape(qn_, ng // sub, sub)
    negs, poss = jax.lax.top_k(-m3, t)
    return -negs, poss


@functools.partial(jax.jit, static_argnames=("k",))
def stage2(cand, k):
    neg, sel = jax.lax.top_k(-cand, k)
    return -neg, sel


_, t = timeit(lambda: stage1(mins_td, 12, 128), "S1 top_k(12 of 128) x64")
results["stage1_t12"] = t
_, t = timeit(lambda: stage2(cand_d, K), "S2 top_k(100 of 768)")
results["stage2_768"] = t
_, t = timeit(lambda: stage2(mins_td[:, :1536], K), "S2 top_k(100 of 1536)")
results["stage2_1536"] = t

# ---- reference: full cascade on pre-transposed --------------------------
@functools.partial(jax.jit, static_argnames=("k", "t", "sub"))
def cascade_t(mt, k, t, sub):
    qn_, ng = mt.shape
    m3 = mt.reshape(qn_, ng // sub, sub)
    negs, poss = jax.lax.top_k(-m3, t)
    base = (jnp.arange(ng // sub, dtype=jnp.int32) * sub)[None, :, None]
    cand_pos = (poss + base).reshape(qn_, -1)
    cand_val = (-negs).reshape(qn_, -1)
    neg_top, sel = jax.lax.top_k(-cand_val, k)
    return -neg_top, jnp.take_along_axis(cand_pos, sel, axis=1)


(vc, pc_), t = timeit(lambda: cascade_t(mins_td, K, 12, 128),
                      "C cascade t=12 (no transpose)")
results["cascade_pre_t"] = t
pc_np = np.asarray(pc_)

# ---- U: unrolled fused extraction with embedded positions ----------------
@functools.partial(jax.jit, static_argnames=("k", "t", "sub"))
def extract_unrolled(mins, k, t, sub):
    """(NG, Q) layout; positions spliced into the low 7 bits (score order
    preserved: compare on (val & ~127) | pos is score-then-position).
    t unrolled rounds of (min over sub, mask the winner)."""
    ng, qn_ = mins.shape
    nsub = ng // sub
    assert sub <= 128
    pos = jax.lax.broadcasted_iota(jnp.int32, (nsub, sub, qn_), 1)
    y = (mins.reshape(nsub, sub, qn_) & ~jnp.int32(127)) | pos
    vals = []
    for _ in range(t):
        cur = jnp.min(y, axis=1)                        # (nsub, Q)
        vals.append(cur)
        y = jnp.where(y == cur[:, None, :], jnp.int32(2**30), y)
    yv = jnp.stack(vals)                                # (t, nsub, Q)
    base = (jnp.arange(nsub, dtype=jnp.int32) * sub)[None, :, None]
    gpos = (yv & 127) + base                            # global group ids
    cand_pos = jnp.transpose(gpos, (2, 1, 0)).reshape(qn_, -1)
    # exact keys re-gathered by position (restores the true lane bits)
    cand_val = jnp.take_along_axis(
        jnp.transpose(mins, (1, 0)), cand_pos, axis=1)
    neg_top, sel = jax.lax.top_k(-cand_val, k)
    return -neg_top, jnp.take_along_axis(cand_pos, sel, axis=1)


for tt in (12, 8):
    try:
        (v3, p3), t = timeit(lambda tt=tt: extract_unrolled(
            mins_d, K, tt, 128), f"U unrolled extract t={tt}")
        results[f"unrolled_t{tt}"] = t
        same = float(np.mean(np.sort(np.asarray(p3), 1)
                             == np.sort(pc_np, 1)))
        print(f"    set-match vs cascade: {same:.4f}", flush=True)
    except Exception as e:
        print(f"U t={tt} FAILED: {str(e)[:160]}", flush=True)

# ---- V: sort-based stage 2 ------------------------------------------------
@functools.partial(jax.jit, static_argnames=("k",))
def stage2_sort(cand, k):
    s = jnp.sort(cand, axis=1)
    return s[:, :k]


_, t = timeit(lambda: stage2_sort(cand_d, K), "V sort(768) stage2 (values only)")
results["stage2_sort"] = t

# ---- W: cascade with smaller stage-2 (t=8 -> 512 candidates) --------------
(v8, p8), t = timeit(lambda: cascade_t(mins_td, K, 8, 128),
                     "W cascade t=8 (512 cands)")
results["cascade_t8"] = t
print(f"    ids set-match vs t=12: "
      f"{float(np.mean(np.sort(np.asarray(p8),1) == np.sort(pc_np,1))):.4f}",
      flush=True)

print(json.dumps(results, indent=2))
with open("/root/repo/results/r4_merge_lab3.json", "w") as f:
    json.dump(results, f, indent=2)
