"""SIFT10M int8 serving refresh (round 3): cascade merge vs round-2 auto.

Round 2 measured 24.7k QPS @ 0.9899 with approx_min_k 2x-overfetch at
10M-scale group counts (results/sift10m_int8.json) — approx was 4x faster
than one exact lax.top_k over ~78k group minima but cost 1% recall. The
cascade merge shipped later (two-stage per-subgroup top-t + exact top-k
over survivors, miss probability ~1e-13) and is now the default
(index/flat_int8.py merge="cascade"); this refresh measures all three at
10M and updates the artifact.

Protocol: 10M x 128 sift-like, tree RBAC 100 roles, 8192 queries,
top-100, recall vs the exact f32 oracle on a 1024-query sample.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sift10m_refresh.py
"""
import gc
import json
import time

import numpy as np

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
workload = generate_query_workload(corpus, world, num_queries=NQ, topk=K,
                                   zipf_param=0, query_pool=qpool, seed=1)
print(f"corpus+world {time.perf_counter()-t0:.0f}s", flush=True)
queries = workload.vectors.astype(np.float32)
uids = workload.user_ids
qmasks = np.asarray(query_masks_for(world.user_masks, uids), np.uint32)
sample = np.arange(NS)
wl_s = QueryWorkload(vectors=queries[sample], user_ids=uids[sample],
                     topk=K, selectivities=workload.selectivities[sample],
                     repetitions=workload.repetitions[sample])

t0 = time.perf_counter()
gt_arena = build_device_arena(corpus, world, block_rows=65536,
                              dtype="float32", with_aug=False)
oracle = GroundTruthOracle(gt_arena, cache_dir="artifacts",
                           block_rows=65536, query_batch=512)
truth = oracle.compute(corpus, world, wl_s, K)
del oracle, gt_arena
gc.collect()
print(f"truth {time.perf_counter()-t0:.0f}s", flush=True)

arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")
out = {"config": ("SIFT10M-shaped corpus (10M x 128-d), tree RBAC 100 "
                  "roles, 8192 queries, top-100, int8 fused kernel, "
                  "batch 2048, u8 wire"),
       "hardware": "TPU v5e (axon tunnel)", "sweep": []}

for merge in ("cascade", "exact", "approx"):
    idx = Int8FlatIndex(arena, None, query_batch=2048, q_tile=2048,
                        wire="u8", merge=merge)
    idx.search(queries[:2048], qmasks[:2048], K)   # compile
    idx.search(queries, qmasks, K)                 # warm
    walls = []
    d = i = None
    for _ in range(3):
        t0 = time.perf_counter()
        d, i = idx.search(queries, qmasks, K)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    rec = compute_recall(i[sample], truth)
    leg = {"merge": merge, "recall_at_100": round(float(rec), 4),
           "qps": round(NQ / wall, 1),
           "pass_walls_ms": [round(w * 1000, 1) for w in walls]}
    out["sweep"].append(leg)
    print(json.dumps(leg), flush=True)
    del idx
    gc.collect()

out["round2"] = {"approx_auto_qps": 24702.8, "approx_auto_recall": 0.9899,
                 "exact_qps": 6109.0, "bf16_round1_qps": 6900.0}
with open("results/sift10m_int8.json", "w") as f:
    json.dump(out, f, indent=2)
print("written results/sift10m_int8.json", flush=True)
