"""Round-4 e2e integration check: the full fused scan with merge="pallas"
vs "cascade" on the REAL 1M corpus + RBAC world — ids parity, recall vs
committed expectations, and the kernel+merge device time the VERDICT
roofline item tracks (43 ms round-3 -> target <= 25 ms).

Also refreshes scripts/kernel_bench.py's role as the roofline artifact:
writes results/r4_kernel_roofline.json with the measured pass times and
the implied device-only QPS ceiling.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_e2e_merge.py
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

from vectorsearch_rbac_tpu.core import Corpus, build_device_arena, bits_to_onehot8
from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import int8_masked_topk
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.rbac.world import query_masks_for

Q = 8192
K = 100
REPS = 8

print("loading corpus...", flush=True)
z = np.load("/root/repo/artifacts/corpus_sift1m_1000000_0.npz")
corpus = Corpus(vectors=z["vectors"], doc_ids=z["doc_ids"],
                block_ids=z["block_ids"])
qpool = z["query_pool"]
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")
quant = arena.quant

rng = np.random.default_rng(1)
uids = rng.integers(0, 10_000, size=Q)
queries = qpool[rng.choice(len(qpool), Q, replace=False)].astype(np.float32)
qmasks = query_masks_for(world.user_masks, uids)
m8 = bits_to_onehot8(qmasks, world.num_roles, quant.r_pad)
q8, qn = quant.quantize_queries(queries)
q8d, qnd, m8d = jnp.asarray(q8), jnp.asarray(qn), jnp.asarray(m8)
inv = jnp.float32(1.0 / quant.scale**2)

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


def run(merge):
    return int8_masked_topk(
        q8d, qnd, quant.vectors_q, quant.norms_q, quant.roles8, m8d, inv,
        K, q_tile=2048, block_rows=8192, group=128, merge=merge)


results = {}
(dc, ic), t = timeit(lambda: run("cascade"), "kernel + cascade merge")
results["cascade_ms"] = t
(dp, ip_), t = timeit(lambda: run("pallas"), "kernel + PALLAS merge")
results["pallas_ms"] = t
_, t = timeit(lambda: run("none"), "kernel only (merge=none)")
results["kernel_only_ms"] = t

ic_np, ip_np = np.asarray(ic), np.asarray(ip_)
dc_np, dp_np = np.asarray(dc), np.asarray(dp)
idmatch = float(np.mean(np.sort(ic_np, 1) == np.sort(ip_np, 1)))
dmatch = bool(np.allclose(np.sort(dc_np, 1), np.sort(dp_np, 1)))
print(f"ids set-match pallas vs cascade: {idmatch:.6f}  dists: {dmatch}",
      flush=True)

# recall vs exact float oracle on a 128-query sample (host numpy; the
# ids set-match against the r3-validated cascade above is the real check)
bits = corpus.vector_role_bits(world)
ns = 128
hits = 0
for qi in range(ns):
    dist = ((corpus.vectors.astype(np.float32) - queries[qi]) ** 2).sum(1)
    dist[~(bits & qmasks[qi]).any(axis=1)] = np.inf
    want = set(np.argsort(dist, kind="stable")[:K].tolist())
    got = set(int(x) for x in ip_np[qi] if x >= 0)
    hits += len(want & got)
recall = hits / (ns * K)
print(f"pallas-merge recall@100 vs exact oracle: {recall:.4f}", flush=True)

results["ids_match"] = idmatch
results["recall_at_100"] = round(recall, 4)
floor = 35.0 / REPS
dev_ms = results["pallas_ms"] - floor
results["device_ms_est"] = round(dev_ms, 1)
results["implied_device_qps_ceiling"] = round(Q / dev_ms * 1000, 0)
results["note"] = ("8192q x 1M fused scan. Round-3 PERF roofline entry: "
                   "43 ms (kernel+cascade). MXU bound ~11 ms. Wall times "
                   f"include ~{floor:.1f} ms amortized dispatch floor.")
print(json.dumps(results, indent=2))
with open("/root/repo/results/r4_kernel_roofline.json", "w") as f:
    json.dump(results, f, indent=2)
