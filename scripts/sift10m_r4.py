"""SIFT10M int8 serving — round 4: the all-Pallas merge at 10M scale.

Round 3 (results/sift10m_int8.json): cascade 18.9k QPS @ 0.9993 — at 10M
the kernel emits ~78.8k group minima per query and the merge dominated
the pass. The pallas merge's geometry is n_groups-invariant (nsub=32,
sub = n_groups/32 = 2464 here, npc=512 survivors, miss tail ~1e-8), so
the 10M merge costs the same VPU work per element as the 1M one.

Measures pallas vs cascade on the same corpus/truth; also the ids wire.
Writes results/sift10m_r4.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sift10m_r4.py
"""
import gc
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/artifacts/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from vectorsearch_rbac_tpu.bench import generate_query_workload
from vectorsearch_rbac_tpu.bench.ground_truth import (
    GroundTruthOracle, compute_recall,
)
from vectorsearch_rbac_tpu.bench.queries import QueryWorkload
from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.rbac.world import query_masks_for

N, NQ, K, NS = 10_000_000, 8192, 100, 1024

t0 = time.perf_counter()
corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
print(f"corpus+world {time.perf_counter()-t0:.0f}s", flush=True)
workload = generate_query_workload(corpus, world, num_queries=NQ, topk=K,
                                   zipf_param=0, query_pool=qpool, seed=1)
queries = workload.vectors.astype(np.float32)
uids = workload.user_ids
qmasks = np.asarray(query_masks_for(world.user_masks, uids), np.uint32)
sample = np.arange(NS)
wl_s = QueryWorkload(vectors=queries[sample], user_ids=uids[sample],
                     topk=K, selectivities=workload.selectivities[sample],
                     repetitions=workload.repetitions[sample])

gt_arena = build_device_arena(corpus, world, block_rows=65536,
                              dtype="float32", with_aug=False)
oracle = GroundTruthOracle(gt_arena, cache_dir="artifacts",
                           block_rows=65536, query_batch=512)
t0 = time.perf_counter()
truth = oracle.compute(corpus, world, wl_s, K)
print(f"truth {time.perf_counter()-t0:.0f}s", flush=True)
del oracle, gt_arena
gc.collect()

arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")
out = {"config": "10M x 128 sift-like, tree RBAC 100 roles, 8192 queries, "
                 "top-100; merge + wire legs on one corpus/truth",
       "hardware": "TPU v5e (axon tunnel)", "legs": {}}

for name, merge, wire in [("pallas_ids", "pallas", "ids"),
                          ("pallas_u8", "pallas", "u8"),
                          ("cascade_u8", "cascade", "u8")]:
    idx = Int8FlatIndex(arena, None, query_batch=2048, q_tile=2048,
                        wire=wire, merge=merge)
    idx.search(queries[:2048], qmasks[:2048], K)
    idx.search(queries, qmasks, K)
    walls = []
    d = i = None
    for _ in range(5):
        t0 = time.perf_counter()
        d, i = idx.search(queries, qmasks, K)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    rec = compute_recall(i[sample], truth)
    leg = {"merge": merge, "wire": wire,
           "recall_at_100": round(float(rec), 4),
           "qps": round(NQ / wall, 1),
           "pass_walls_ms": [round(w * 1000, 1) for w in walls]}
    print(f"[{name}] recall {rec:.4f}  qps {NQ/wall:,.0f}", flush=True)
    out["legs"][name] = leg
    del idx
    gc.collect()

with open("results/sift10m_r4.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out["legs"], indent=1))
