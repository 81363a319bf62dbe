"""Device bisect: which stage loses the 768-d cosine recall?

Host emulation (cohere_pool_host_probe.py) shows the int8 ordering keeps
~99.9% of truth-100 within rank 132 — the device pipeline at the same
config measures 0.984. One of the device stages between the kernel's
candidate pool and the returned ids must be dropping ~1.5 ids/query.
Legs (2048 queries, cosine, group=32, margin=32 unless noted):

  default          shipping config              (expect 0.984)
  norerank         rerank=False                 (= raw int8 top-100)
  f32query         rerank_dequant=False         (ship f32 queries)
  f32wire          wire="f32"                   (no u8 distance coding)
  exactmerge       merge="exact"                (no cascade)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/cohere_bisect.py
"""
import gc

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

N, K, NS = 1_000_000, 100, 2048
METRIC = "cosine"

corpus, qpool = resolve_dataset("cohere", num_vectors=N, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
workload = generate_query_workload(corpus, world, num_queries=16384,
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

LEGS = [
    ("default", {}),
    ("norerank", {"rerank": False}),
    ("f32query", {"rerank_dequant": False}),
    ("f32wire", {"wire": "f32"}),
    ("exactmerge", {"merge": "exact"}),
]
for name, kw in LEGS:
    base = dict(query_batch=2048, q_tile=2048, wire="u8", group=32,
                rerank_margin=32)
    base.update(kw)
    idx = Int8FlatIndex(arena, None, **base)
    d, i = idx.search(queries[:NS], qmasks[:NS], K)
    rec = compute_recall(i, truth)
    print(f"{name:>10}: recall@100 {rec:.4f}", flush=True)
    del idx
    gc.collect()
