"""Merge lab round 2: the iterative-extraction variants only (the rest
measured in r4_merge_lab.py: cascade ~18.8 ms device, top_k-bound).

E   — t rounds of (min, argmin, mask) over (nsub, sub, Q) in the kernel's
      own (NG, Q) layout; exact top-k over the 64*t survivors.
E3  — same but positions packed INTO the value low bits during
      extraction is impossible (no spare bits); instead try extraction
      with jnp.min + equality-mask (no argmin op): recover position as
      argmax of the equality mask via iota trick in ONE where+min.
W   — stage-1 via 8-way tree min with index tracking (manual unrolled
      pairwise mins carrying (val, idx) pairs) — log2(sub) steps instead
      of t full passes, then mask+repeat t times. Only if E disappoints.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_merge_lab2.py
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

_slice8 = jax.jit(lambda x: x.reshape(-1)[:8])


def timeit(fn, label, reps=REPS):
    out = fn()
    np.asarray(_slice8(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    np.asarray(_slice8(jax.tree_util.tree_leaves(outs[-1])[0]))
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{label:46s} {dt:8.2f} ms/pass", flush=True)
    return out, dt


@functools.partial(jax.jit, static_argnames=("k",))
def exact(mins, k):
    mt = jnp.transpose(mins, (1, 0))
    neg, pos = jax.lax.top_k(-mt, k)
    return -neg, pos


@functools.partial(jax.jit, static_argnames=("k", "t", "sub"))
def extract(mins, k, t, sub):
    ng, qn_ = mins.shape
    nsub = ng // sub
    m3 = mins.reshape(nsub, sub, qn_)

    def body(x, _):
        cur = jnp.min(x, axis=1)
        pos = jnp.argmin(x, axis=1).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(lane == pos[:, None, :], jnp.int32(2**30), x)
        return x, (cur, pos)

    _, (vals, poss) = jax.lax.scan(body, m3, None, length=t)
    base = (jnp.arange(nsub, dtype=jnp.int32) * sub)[None, :, None]
    gpos = poss + base
    cand_val = jnp.transpose(vals, (2, 1, 0)).reshape(qn_, -1)
    cand_pos = jnp.transpose(gpos, (2, 1, 0)).reshape(qn_, -1)
    neg_top, sel = jax.lax.top_k(-cand_val, k)
    return -neg_top, jnp.take_along_axis(cand_pos, sel, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "t", "sub"))
def extract_nomask(mins, k, t, sub):
    """min + mask-by-value (no argmin inside the loop): positions are
    recovered AFTER the loop for all t extracted values at once by a
    single argmin-free match pass... still needs per-value position —
    instead pack (value, position) ordering trick: extract by VALUE only
    in the loop (min + where(x==cur, BIG, x): 3 ops/elem), then recover
    each extracted value's group by ONE matmul-free equality scan over
    the ORIGINAL m3 at the end: pos_j = argmax(m3 == val_j) along sub.
    t extra equality passes, but outside the dependency chain."""
    ng, qn_ = mins.shape
    nsub = ng // sub
    m3 = mins.reshape(nsub, sub, qn_)

    def body(x, _):
        cur = jnp.min(x, axis=1)
        x = jnp.where(x == cur[:, None, :], jnp.int32(2**30), x)
        return x, cur

    _, vals = jax.lax.scan(body, m3, None, length=t)     # (t, nsub, Q)
    # position recovery: first index in the subgroup equal to the value
    lane = jax.lax.broadcasted_iota(jnp.int32, m3.shape, 1)

    def recover(val):
        hit = m3 == val[:, None, :]
        return jnp.min(jnp.where(hit, lane, sub), axis=1).astype(jnp.int32)

    poss = jax.vmap(recover)(vals)                       # (t, nsub, Q)
    base = (jnp.arange(nsub, dtype=jnp.int32) * sub)[None, :, None]
    gpos = jnp.minimum(poss, sub - 1) + base
    cand_val = jnp.transpose(vals, (2, 1, 0)).reshape(qn_, -1)
    cand_pos = jnp.transpose(gpos, (2, 1, 0)).reshape(qn_, -1)
    neg_top, sel = jax.lax.top_k(-cand_val, k)
    return -neg_top, jnp.take_along_axis(cand_pos, sel, axis=1)


results = {}
(vx, px), t = timeit(lambda: exact(mins_d, K), "X exact (reference)")
px_np = np.asarray(px)
results["exact"] = t

for label, fn, tt, sub in [
    ("E extract t=12 sub=128", extract, 12, 128),
    ("E2 extract t=24 sub=128", extract, 24, 128),
    ("E4 extract t=12 sub=512", extract, 12, 512),
    ("N nomask t=12 sub=128", extract_nomask, 12, 128),
]:
    try:
        (v3, p3), t = timeit(lambda fn=fn, tt=tt, sub=sub: fn(
            mins_d, K, tt, sub), label)
        results[label.split()[0]] = t
        same = float(np.mean(np.sort(np.asarray(p3), 1)
                             == np.sort(px_np, 1)))
        print(f"    set-match vs exact: {same:.4f}", flush=True)
    except Exception as e:
        print(f"{label} FAILED: {str(e)[:160]}", flush=True)

print(json.dumps(results, indent=2))
with open("/root/repo/results/r4_merge_lab2.json", "w") as f:
    json.dump(results, f, indent=2)
