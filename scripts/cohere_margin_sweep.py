"""768-d recall-vs-margin sweep: how deep must the int8 pool be?

cohere_768d.py measured recall@100 0.962-0.964 with rerank_margin=32
(pool 132) and group=128. Loss candidates: (a) int8 ranking error pushing
true neighbors below the pool boundary — fixed by a deeper pool; (b)
group-minima collisions (one candidate per 128-row group, ~0.63%
expected at k=100) — fixed by a finer group. This sweep measures
recall@100 on the 2048-query GT sample for margin x group combos, and
one timed full pass for the chosen config.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/cohere_margin_sweep.py
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
METRIC = "cosine"

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
truth = oracle.compute(corpus, world, wl_s, K)
del oracle, gt_arena
gc.collect()
print("truth ready", flush=True)

arena = build_device_arena(corpus, world, block_rows=131072,
                           dtype="int8", metric=METRIC)

for group, margin in ((128, 32), (128, 156), (128, 412), (32, 32),
                      (32, 156)):
    idx = Int8FlatIndex(arena, None, query_batch=2048, q_tile=2048,
                        wire="u8", group=group, rerank_margin=margin)
    d, i = idx.search(queries[:NS], qmasks[:NS], K)
    rec = compute_recall(i, truth)
    t0 = time.perf_counter()
    d, i = idx.search(queries[:NS], qmasks[:NS], K)
    dt = time.perf_counter() - t0
    print(f"group={group:4d} margin={margin:4d}: recall@100 {rec:.4f} "
          f"sample-pass {dt*1000:.0f} ms", flush=True)
    del idx
    gc.collect()
