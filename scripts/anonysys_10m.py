"""AnonySys dynamic partitioning at 10M: the planner + two-tier tiled
engine at 10x the headline corpus (scaling evidence for the PARTITIONED
path — results/sift10m_int8.json covers only the global RLS scan).

Memory plan (v5e 16 GB HBM): int8 quant arrays ~1.4 GB + bf16 mirror
2.6 GB + norms/bits ~0.6 GB; the two-tier engine gathers int8 copies of
big partitions (alpha=2.0 -> ~2x rows = ~2.6 GB) + chunk slabs for the
rest. Ground truth runs on a throwaway f32 arena (5.4 GB) BEFORE the
serving arena is built, then frees it.

Writes results/anonysys_10m.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/anonysys_10m.py
"""
import gc
import json
import time

import numpy as np

from vectorsearch_rbac_tpu.bench import generate_query_workload
from vectorsearch_rbac_tpu.bench.ground_truth import compute_recall
from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.index.flat import FlatIndex
from vectorsearch_rbac_tpu.partition import build_searcher
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.rbac.world import query_masks_for
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig

N, NQ, TOPK = 10_000_000, 8192, 10

t0 = time.perf_counter()
corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
workload = generate_query_workload(corpus, world, num_queries=NQ,
                                   topk=TOPK, zipf_param=0,
                                   query_pool=qpool, seed=1)
print(f"corpus+world {time.perf_counter()-t0:.0f}s "
      f"(avg sel {world.average_user_selectivity():.4f})", flush=True)
queries, user_ids = workload.vectors, workload.user_ids
qmasks = query_masks_for(world.user_masks, user_ids)

t0 = time.perf_counter()
gt_arena = build_device_arena(corpus, world, block_rows=65536,
                              dtype="float32", with_aug=False)
oracle = FlatIndex(gt_arena, None, block_rows=65536, mode="exact",
                   query_batch=512)
td, ti = oracle.search(queries, qmasks, TOPK)
del oracle, gt_arena
gc.collect()
print(f"ground truth {time.perf_counter()-t0:.0f}s", flush=True)

t0 = time.perf_counter()
arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")
print(f"arena {time.perf_counter()-t0:.0f}s", flush=True)

cfg = FrameworkConfig(seed=0)
cfg.search.batch_size = 2048
cfg.optimizer.storage_alpha = 2.0
cfg.optimizer.topk = TOPK
# at 10M the big tier's gathered int8 copies (~2x rows at alpha=2.0)
# alone exceed HBM on top of the arena — serve big partitions from the
# shared arena by row gather (first run OOMed in the warm pass)
cfg.index.big_logical = True

t0 = time.perf_counter()
s = build_searcher("dynamic", corpus, world, arena, cfg)
plan_build_s = time.perf_counter() - t0
print(f"plan+build {plan_build_s:.0f}s "
      f"({len(s.plan.assignment)} partitions)", flush=True)

s.search_batch(queries, user_ids, world.user_masks, TOPK)  # warm
walls = []
d = i = None
for _ in range(5):
    t0 = time.perf_counter()
    d, i = s.search_batch(queries, user_ids, world.user_masks, TOPK)
    walls.append(time.perf_counter() - t0)
wall = float(np.median(walls))
rec = compute_recall(i, ti)
rep = s.storage_report()
out = {
    "config": "AnonySys alpha=2.0 at 10M x 128 (clustered sift-like), "
              "tree RBAC 100 roles / 10k users, top-10, 8192 queries, "
              "two-tier tiled int8 engine (big tier logical/no-copy)",
    "hardware": "TPU v5e (axon tunnel)",
    "partitions": len(s.plan.assignment),
    "plan_and_build_s": round(plan_build_s, 1),
    "recall_at_10": round(float(rec), 4),
    "qps": round(NQ / wall, 1),
    "pass_walls_ms": [round(w * 1000, 1) for w in walls],
    "storage_mb": round(rep["total_mb"], 1),
    "scaling_note": "1M protocol: 38.6k QPS @ 0.9992 "
                    "(results/strategy_compare_1m_r3.json dynamic)",
}
print(json.dumps(out, indent=1), flush=True)
with open("results/anonysys_10m.json", "w") as f:
    json.dump(out, f, indent=2)
