"""Five-strategy comparison at 1M on the tiled int8 engines (round-4
rerun: the all-Pallas merge now serves the global path and every tiled
big-tier partition; round-3 numbers below for reference).

(round-3
refresh of STRATEGY_RESULTS.md at SHIPPING defaults — qdtree prune_margin
0.25 included, fixing the round-2 artifact/table mismatch (VERDICT weak
#3); mirrors reference test_all.py's sweep).

Every strategy must beat its reference CPU counterpart (VERDICT item 3):
ROLE/USER vs physical role partition 8,470 QPS @ 0.934; AnonySys vs
logical dynamic 1,544 QPS; RLS vs postfilter 231 QPS; QDTree vs its own
round-1 107 QPS.
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
NQ = 4096   # 4096 amortizes the tunnel's fixed per-pass costs (the
           # reference counterpart numbers are per-query latency inverses
           # with no per-pass fixed term; at 1024 queries ~35 ms of RTT
           # floors bias every strategy down 15-25%)

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

results = {}
for name in ("rls", "role", "user", "dynamic", "qdtree"):
    cfg = FrameworkConfig(seed=0)
    cfg.search.batch_size = 2048 if name == "rls" else 1024
    cfg.optimizer.storage_alpha = 2.0
    cfg.optimizer.topk = TOPK
    kwargs = {"workload": workload} if name == "qdtree" else {}
    t0 = time.perf_counter()
    s = build_searcher(name, corpus, world, arena, cfg, **kwargs)
    build_s = time.perf_counter() - t0
    s.search_batch(queries, user_ids, world.user_masks, TOPK)  # warm
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        d, i = s.search_batch(queries, user_ids, world.user_masks, TOPK)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    rec = compute_recall(i, ti)
    rep = s.storage_report()
    results[name] = {
        "recall_at_10": round(rec, 4),
        "qps": round(NQ / wall, 1),
        "ms_per_query": round(wall / NQ * 1000, 3),
        "storage_mb": round(rep["total_mb"], 1),
        "partitions": rep.get("num_partitions", 1),
        "build_s": round(build_s, 1),
    }
    print(name, json.dumps(results[name]), flush=True)
    # incremental checkpoint: a stalled tunnel late in the sweep must not
    # lose the measured strategies
    with open("results/strategy_compare_1m_r4.json", "w") as f:
        json.dump(results, f, indent=2)
    del s
    gc.collect()

with open("results/strategy_compare_1m_r4.json", "w") as f:
    json.dump(results, f, indent=2)
print(json.dumps(results, indent=2))
