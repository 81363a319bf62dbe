"""Round-4 kernel roofline lab: attribute and close the 43 ms -> ~11 ms
MXU-bound gap on the fused int8 scan (VERDICT-r3 next-round item 2).

One process, variants interleaved (tunnel weather swings more than most
effects). Timing: enqueue R chained dispatches of one compiled
executable, force a tiny slice fetch of the LAST output (device work
serializes in order; the 8-element fetch is ~free), elapsed/R = per-pass
device time + amortized dispatch floor (~35/R ms).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_kernel_lab.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/artifacts/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from vectorsearch_rbac_tpu.core import Corpus, build_device_arena
from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import int8_masked_topk
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from r4_kernel_variants import int8_masked_topk_lab

Q = 8192
K = 100
REPS = 6

print("loading corpus...", flush=True)
z = np.load("/root/repo/artifacts/corpus_sift1m_1000000_0.npz")
corpus = Corpus(vectors=z["vectors"], doc_ids=z["doc_ids"],
                block_ids=z["block_ids"])
qpool = z["query_pool"]
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
print("building int8 arena...", flush=True)
arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")
quant = arena.quant

rng = np.random.default_rng(1)
uids = rng.integers(0, 10_000, size=Q)
queries = qpool[rng.choice(len(qpool), Q, replace=False)].astype(np.float32)
from vectorsearch_rbac_tpu.rbac.world import query_masks_for
from vectorsearch_rbac_tpu.core import bits_to_onehot8
qmasks = query_masks_for(world.user_masks, uids)
m8 = bits_to_onehot8(qmasks, world.num_roles, quant.r_pad)
q8, qn = quant.quantize_queries(queries)
q8d, qnd, m8d = jnp.asarray(q8), jnp.asarray(qn), jnp.asarray(m8)
inv = jnp.float32(1.0 / quant.scale**2)

_slice8 = jax.jit(lambda x: x.reshape(-1)[:8])


def timeit(fn, label, reps=REPS, check_against=None):
    t_c0 = time.perf_counter()
    out = fn()
    np.asarray(_slice8(jax.tree_util.tree_leaves(out)[0]))
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    np.asarray(_slice8(jax.tree_util.tree_leaves(outs[-1])[0]))
    dt = (time.perf_counter() - t0) / reps * 1000
    ok = ""
    if check_against is not None:
        ids = np.asarray(out[1])
        same = float(np.mean(ids == check_against))
        ok = f"  ids-match={same:.4f}"
    print(f"{label:52s} {dt:8.2f} ms/pass  (first+compile {compile_s:.1f}s)"
          f"{ok}", flush=True)
    return out, dt


results = {}

# A: control — the committed kernel, production tiles, merge=none isolates
# the Pallas kernel from the group-minima merge
_, t = timeit(lambda: int8_masked_topk(
    q8d, qnd, quant.vectors_q, quant.norms_q, quant.roles8, m8d, inv, K,
    q_tile=2048, block_rows=8192, group=128, merge="none"),
    "A control qt=2048 br=8192 g=128 (merge=none)")
results["control_none"] = t

# control ids for correctness cross-checks (full merge)
(dc, ic), t = timeit(lambda: int8_masked_topk(
    q8d, qnd, quant.vectors_q, quant.norms_q, quant.roles8, m8d, inv, K,
    q_tile=2048, block_rows=8192, group=128, merge="cascade"),
    "A control + cascade merge (e2e device)")
results["control_cascade"] = t
ic_np = np.asarray(ic)

# B: op-trim epilogue
(dv, iv), t = timeit(lambda: int8_masked_topk_lab(
    q8d, qnd, quant.vectors_q, quant.norms_q, quant.roles8, m8d, inv, K,
    q_tile=2048, block_rows=8192, group=128, merge="cascade",
    variant="trim"), "B trim (fused <<7 pack)", check_against=ic_np)
results["trim"] = t

# C: trim + unroll=2 (MXU/VPU overlap across chunk iterations)
for qt in (2048, 1024):
    try:
        _, t = timeit(lambda qt=qt: int8_masked_topk_lab(
            q8d, qnd, quant.vectors_q, quant.norms_q, quant.roles8, m8d,
            inv, K, q_tile=qt, block_rows=8192, group=128, merge="cascade",
            variant="trim", unroll=2),
            f"C trim unroll=2 qt={qt}", check_against=ic_np)
        results[f"trim_u2_qt{qt}"] = t
    except Exception as e:
        print(f"C qt={qt} FAILED: {str(e)[:200]}", flush=True)

# D: floor probe — matmuls + bare min (NOT correct; attribution only)
_, t = timeit(lambda: int8_masked_topk_lab(
    q8d, qnd, quant.vectors_q, quant.norms_q, quant.roles8, m8d, inv, K,
    q_tile=2048, block_rows=8192, group=128, merge="none",
    variant="floor"), "D floor probe (matmuls + bare min)")
results["floor"] = t

# E: raw MXU rate — K=128 vs K=256 int8 (does K=128 halve the int8 rate?)
import functools


@functools.partial(jax.jit, static_argnames=())
def raw_i8(a, b):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32).sum()


a128 = quant.vectors_q[:262144]                       # (262144, 128)
a256 = jnp.concatenate([a128, a128], axis=1)          # (262144, 256)
q256 = jnp.concatenate([q8d, q8d], axis=1)
_, t = timeit(lambda: raw_i8(q8d[:4096], a128), "E raw i8 4096x262144 K=128")
results["raw_k128"] = t
_, t = timeit(lambda: raw_i8(q256[:4096], a256), "E raw i8 4096x262144 K=256")
results["raw_k256"] = t

# F: chunk retune on the trim variant
for chunk in (512, 2048):
    try:
        _, t = timeit(lambda ch=chunk: int8_masked_topk_lab(
            q8d, qnd, quant.vectors_q, quant.norms_q, quant.roles8, m8d,
            inv, K, q_tile=2048, block_rows=8192, group=128,
            merge="cascade", chunk=ch, variant="trim"),
            f"F trim chunk={chunk}", check_against=ic_np)
        results[f"trim_chunk{chunk}"] = t
    except Exception as e:
        print(f"F chunk={chunk} FAILED: {str(e)[:200]}", flush=True)

print(json.dumps(results, indent=2))
with open("/root/repo/results/r4_kernel_lab.json", "w") as f:
    json.dump(results, f, indent=2)
