"""768-d 1M cosine serving — round-4: the int8-RESIDUAL rerank wire.

VERDICT-r3 item 6: the round-3 default (dequant rebuild) measured 0.9855
recall@100 at 19.5k QPS; the >=0.99 leg (f16 shipped queries) halved QPS
to 9.9k. The residual wire ships ONE extra byte per component (reusing
the kernel's int8 code) and rebuilds a ~16-bit fixed-point query on
device — finer than f16 at half its extra bytes.

Legs (cosine, same corpus/workload/truth):
  dequant       — round-3 default (0 extra upload B)         [fast leg]
  residual      — round-4 default (+768 B/query)             [new]
  residual+ids  — residual with the ids result wire          [headline]
  f16           — round-3 accuracy leg (+1536 B/query)       [reference]

Writes results/cohere_768d_1m_r4.json.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/cohere_768d_r4.py
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
from vectorsearch_rbac_tpu.data import resolve_dataset
from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.rbac.world import query_masks_for

N, NQ, K, NS = 1_000_000, 16384, 100, 2048
METRIC = "cosine"

out = {"config": ("cohere/wikipedia-shaped 1M x 768-d unit-normalized, "
                  "tree RBAC 100 roles, 16384 queries, top-100, cosine; "
                  "rerank-query-source legs on one corpus/truth"),
       "hardware": "TPU v5e (axon tunnel)", "legs": {}}

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

gt_arena = build_device_arena(corpus, world, block_rows=65536,
                              dtype="float32", with_aug=False,
                              metric=METRIC)
oracle = GroundTruthOracle(gt_arena, cache_dir="artifacts",
                           block_rows=65536, query_batch=1024)
t0 = time.perf_counter()
truth = oracle.compute(corpus, world, wl_s, K)
print(f"truth {time.perf_counter()-t0:.1f}s", flush=True)
del oracle, gt_arena
gc.collect()

arena = build_device_arena(corpus, world, block_rows=131072,
                           dtype="int8", metric=METRIC)

for name, mode, wire in [("dequant", "dequant", "u8"),
                         ("residual", "residual", "u8"),
                         ("residual_ids", "residual", "ids"),
                         ("f16", "f16", "u8")]:
    idx = Int8FlatIndex(arena, None, query_batch=2048, q_tile=2048,
                        wire=wire, rerank_mode=mode)
    idx.search(queries[:2048], qmasks[:2048], K)   # compile
    idx.search(queries, qmasks, K)                 # warm full
    walls = []
    d = i = None
    for _ in range(5):
        t0 = time.perf_counter()
        d, i = idx.search(queries, qmasks, K)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    rec = compute_recall(i[sample], truth)
    leg = {"rerank_mode": mode, "wire": wire,
           "recall_at_100": round(float(rec), 4),
           "qps": round(NQ / wall, 1),
           "pass_walls_ms": [round(w * 1000, 1) for w in walls]}
    print(f"[{name}] recall {rec:.4f}  qps {NQ/wall:,.0f}", flush=True)
    out["legs"][name] = leg
    del idx
    gc.collect()

with open("results/cohere_768d_1m_r4.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out["legs"], indent=1))
