"""1M dynamic-partition serving measurement (VERDICT round-2 item 1).

Three executors over the SAME AnonySys plan (alpha=2.0, tree RBAC 100
roles, 1M x 128 clustered SIFT-like, top-10):

  A. per-partition HNSW with iterative rescan + per-comb admissible entry
     points (pgvector hnsw.iterative_scan analog);
  B. hybrid: HNSW graphs where within-partition selectivity holds, fused
     int8 flat chunks for mixed partitions;
  C. packed int8 tiled flat scan (the round-1 production fallback, 408 QPS).

Writes results/anonysys_hnsw_1m_r3.json (round-3: graph probes batched
into multi-graph slab dispatches, partition/graph_batch.py — the round-2
artifact measured 318 QPS from 100+ per-(comb,partition) dispatches).
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

N = 1_000_000
TOPK = 10
NQ = 4096   # amortizes the tunnel's fixed per-pass costs (see
           # strategy_compare_1m.py — 1024-query passes bias QPS down)

t0 = time.perf_counter()
corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
print(f"corpus+world {time.perf_counter()-t0:.0f}s, "
      f"avg sel {world.average_user_selectivity():.4f}", flush=True)

workload = generate_query_workload(corpus, world, num_queries=NQ, topk=TOPK,
                                   zipf_param=0, query_pool=qpool, seed=1)
queries, user_ids = workload.vectors, workload.user_ids

# exact ground truth on a throwaway f32 arena
t0 = time.perf_counter()
gt_arena = build_device_arena(corpus, world, block_rows=65536,
                              dtype="float32", with_aug=False)
oracle = FlatIndex(gt_arena, None, block_rows=65536, mode="exact",
                   query_batch=1024)
qmasks = query_masks_for(world.user_masks, user_ids)
td, ti = oracle.search(queries, qmasks, TOPK)
del oracle, gt_arena
gc.collect()
print(f"ground truth {time.perf_counter()-t0:.0f}s", flush=True)

# serving arena: int8 (hybrid flat parts) + bf16 mirror (graphs)
t0 = time.perf_counter()
arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")
print(f"arena {time.perf_counter()-t0:.0f}s", flush=True)

cfg = FrameworkConfig(seed=0)
cfg.search.ef_search = 40
cfg.search.batch_size = 1024
cfg.optimizer.storage_alpha = 2.0
cfg.optimizer.topk = TOPK


def measure(searcher, label):
    t = time.perf_counter()
    d, i = searcher.search_batch(queries, user_ids, world.user_masks, TOPK)
    warm = time.perf_counter() - t
    t = time.perf_counter()
    d, i = searcher.search_batch(queries, user_ids, world.user_masks, TOPK)
    dt = time.perf_counter() - t
    rec = compute_recall(i, ti)
    qps = NQ / dt
    print(f"{label}: recall@10 {rec:.4f}  QPS {qps:.0f} "
          f"(warm pass {warm:.1f}s, timed {dt:.1f}s)", flush=True)
    return {"recall_at_10": round(rec, 4), "qps": round(qps, 1),
            "warm_s": round(warm, 1)}


out = {"config": "AnonySys alpha=2.0, 1M clustered sift-like, tree RBAC "
                 "100 roles, top-10, 4096 queries",
       "hardware": "TPU v5e (axon tunnel)"}

# C first (also plans once; reuse the plan for A/B)
t0 = time.perf_counter()
s_flat = build_searcher("dynamic", corpus, world, arena, cfg)
plan = s_flat.plan
out["plan_partitions"] = len(plan.assignment)
out["plan_s"] = round(time.perf_counter() - t0, 1)
out["tiled_flat"] = measure(s_flat, "C tiled int8 flat")
del s_flat
gc.collect()

# A: pure per-partition HNSW, iterative probes
cfg_h = FrameworkConfig(seed=0)
cfg_h.search.ef_search = 40
cfg_h.search.batch_size = 1024
cfg_h.optimizer.storage_alpha = 2.0
cfg_h.optimizer.topk = TOPK
cfg_h.index.kind = "hnsw"
t0 = time.perf_counter()
s_hnsw = build_searcher("dynamic", corpus, world, arena, cfg_h, plan=plan,
                        packed=False)
out["hnsw_build_s"] = round(time.perf_counter() - t0, 1)
print(f"hnsw build {out['hnsw_build_s']}s", flush=True)
out["hnsw_iterative"] = measure(s_hnsw, "A hnsw iterative+entries")
del s_hnsw
gc.collect()

# B: hybrid
cfg_y = FrameworkConfig(seed=0)
cfg_y.search.ef_search = 40
cfg_y.search.batch_size = 1024
cfg_y.optimizer.storage_alpha = 2.0
cfg_y.optimizer.topk = TOPK
cfg_y.index.kind = "hybrid"
t0 = time.perf_counter()
s_hyb = build_searcher("dynamic", corpus, world, arena, cfg_y, plan=plan,
                       packed=False)
out["hybrid_build_s"] = round(time.perf_counter() - t0, 1)
ngraph = sum(1 for p in s_hyb.partitions.values()
             if type(p.index).__name__ == "HNSWIndex")
out["hybrid_graph_partitions"] = ngraph
out["hybrid"] = measure(s_hyb, f"B hybrid ({ngraph} graph partitions)")

with open("results/anonysys_hnsw_1m_r3.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out, indent=2))
