"""768-d artifact refresh: both rerank modes per metric.

After cohere_bisect.py pinned the recall cap to the BATCH-scale
dequantized-query rebuild, quantize_queries_ip moved to per-query scales
and the rerank grew an f16 shipped-query accuracy leg. This measures
both modes on the full 16384-query protocol per metric and refreshes
results/cohere_768d_1m_r3.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/cohere_f16_check.py
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
from vectorsearch_rbac_tpu.data import resolve_dataset
from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.rbac.world import query_masks_for

N, NQ, K, NS = 1_000_000, 16384, 100, 2048

corpus, qpool = resolve_dataset("cohere", num_vectors=N, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
workload = generate_query_workload(corpus, world, num_queries=NQ,
                                   topk=K, zipf_param=0,
                                   query_pool=qpool, seed=1)
queries = workload.vectors.astype(np.float32)
uids = workload.user_ids
qmasks = np.asarray(query_masks_for(world.user_masks, uids), np.uint32)
sample = np.arange(NS)
wl_s = QueryWorkload(vectors=queries[sample], user_ids=uids[sample],
                     topk=K, selectivities=workload.selectivities[sample],
                     repetitions=workload.repetitions[sample])

out = {"config": ("cohere/wikipedia-shaped corpus: 1M x 768-d "
                  "unit-normalized, tree RBAC 100 roles, 16384 queries, "
                  "top-100, int8 arena, d-split wide kernel, u8 wire, "
                  "single-upload pass; rerank margin 32, per-query "
                  "int8 scales. Two legs per metric: dequant rebuild "
                  "(default, upload-free) and f16 shipped queries "
                  "(accuracy, +1.5 KB/query)"),
       "hardware": "TPU v5e (axon tunnel)", "legs": {}}

MODES = (("dequant", True), ("f16ship", False))
for metric in ("cosine", "l2"):
    gt_arena = build_device_arena(corpus, world, block_rows=65536,
                                  dtype="float32", with_aug=False,
                                  metric=metric)
    oracle = GroundTruthOracle(gt_arena, cache_dir="artifacts",
                               block_rows=65536, query_batch=1024)
    truth = oracle.compute(corpus, world, wl_s, K)
    del oracle, gt_arena
    gc.collect()

    arena = build_device_arena(corpus, world, block_rows=131072,
                               dtype="int8", metric=metric)
    for mode, dq in MODES:
        idx = Int8FlatIndex(arena, None, query_batch=2048, q_tile=2048,
                            wire="u8", rerank_dequant=dq)
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
        leg = {"metric": metric, "recall_at_100": round(float(rec), 4),
               "qps": round(NQ / wall, 1),
               "pass_walls_ms": [round(w * 1000, 1) for w in walls],
               "tiles": {"block_rows": idx.block_rows,
                         "q_tile": idx.q_tile, "wide_kernel": idx.wide},
               "rerank": {"dequant": idx.rerank_dequant,
                          "qhalf": idx.rerank_qhalf,
                          "margin": idx.rerank_margin}}
        print(f"[{metric}/{mode}] recall {rec:.4f}  qps {NQ/wall:,.0f}",
              flush=True)
        out["legs"][f"{metric}_{mode}"] = leg
        del idx
        gc.collect()
    del arena
    gc.collect()

with open("results/cohere_768d_1m_r3.json", "w") as f:
    json.dump(out, f, indent=2)
print("written results/cohere_768d_1m_r3.json", flush=True)
