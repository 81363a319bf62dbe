"""QDTree multiprobe-radius ladder at 1M (VERDICT-r4 item 3 follow-up):
the row-level tree (block-vector centroid predicates + geometric
hyperplane-margin multiprobe) measured through the full tiled engine on
TPU, against ROLE in the SAME process/weather for an honest ratio.

Writes results/qdtree_radius_sweep_1m.json.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/qdtree_radius_sweep.py
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/artifacts/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

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
NQ = 4096

corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
workload = generate_query_workload(corpus, world, num_queries=NQ, topk=TOPK,
                                   zipf_param=0, query_pool=qpool, seed=1)
queries, user_ids = workload.vectors, workload.user_ids
qmasks = query_masks_for(world.user_masks, user_ids)

gt_arena = build_device_arena(corpus, world, block_rows=65536,
                              dtype="float32", with_aug=False)
oracle = FlatIndex(gt_arena, None, block_rows=65536, mode="exact",
                   query_batch=1024)
td, ti = oracle.search(queries, qmasks, TOPK)
del oracle, gt_arena
gc.collect()
print("ground truth done", flush=True)

arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")

searchers = {}
cfg = FrameworkConfig(seed=0)
cfg.search.batch_size = 1024
cfg.optimizer.topk = TOPK
t0 = time.perf_counter()
searchers["role"] = (build_searcher("role", corpus, world, arena, cfg),
                     time.perf_counter() - t0)
for scale in (0.2, 0.25, 0.3):
    t0 = time.perf_counter()
    s = build_searcher("qdtree", corpus, world, arena, cfg,
                       workload=workload, radius_scale=scale)
    searchers[f"qdtree@{scale}"] = (s, time.perf_counter() - t0)
    print(f"built qdtree@{scale}: {len(s.partitions)} partitions",
          flush=True)

# interleaved passes (weather robustness): warm once, then 3 rounds
for name, (s, _) in searchers.items():
    s.search_batch(queries, user_ids, world.user_masks, TOPK)
walls = {k: [] for k in searchers}
rec = {}
for _ in range(3):
    for name, (s, _) in searchers.items():
        t0 = time.perf_counter()
        d, i = s.search_batch(queries, user_ids, world.user_masks, TOPK)
        walls[name].append(time.perf_counter() - t0)
        rec[name] = compute_recall(i, ti)

out = {}
for name, (s, build_s) in searchers.items():
    w = float(np.median(walls[name]))
    rep = s.storage_report()
    out[name] = {
        "recall_at_10": round(rec[name], 4),
        "qps": round(NQ / w, 1),
        "partitions": rep.get("num_partitions", 1),
        "storage_mb": round(rep["total_mb"], 1),
        "build_s": round(build_s, 1),
    }
    print(name, json.dumps(out[name]), flush=True)

with open("results/qdtree_radius_sweep_1m.json", "w") as f:
    json.dump(out, f, indent=2)
