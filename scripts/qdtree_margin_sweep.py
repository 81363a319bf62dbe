"""QDTree centroid-prune margin sweep at 1M (VERDICT item 9: >=1k QPS at
>=0.95 recall). One tree + one packed searcher; the margin only changes the
router, so sweep by swapping the vector_router closure."""
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
NQ = 1024

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
cfg = FrameworkConfig(seed=0)
cfg.search.batch_size = 1024
s = build_searcher("qdtree", corpus, world, arena, cfg, workload=workload)
tree = s.tree

user_docs_cache = {}


def make_router(margin):
    def vr(uid, qvec):
        if uid not in user_docs_cache:
            user_docs_cache[uid] = set(world.user_docs(uid))
        pids = tree.route(user_docs_cache[uid], qvec, True,
                          prune_margin=margin)
        return tuple(p for p in pids if p in s.partitions)
    return vr


out = {}
for margin in (0.0, 0.1, 0.2, 0.3, 0.5):
    s.vector_router = make_router(margin)
    s.search_batch(queries, user_ids, world.user_masks, TOPK)  # warm
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        d, i = s.search_batch(queries, user_ids, world.user_masks, TOPK)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    rec = compute_recall(i, ti)
    fan = np.mean([len(s.vector_router(int(u), queries[j]))
                   for j, u in enumerate(user_ids[:256])])
    out[margin] = {"recall_at_10": round(rec, 4),
                   "qps": round(NQ / wall, 1),
                   "avg_leaves": round(float(fan), 1)}
    print(margin, json.dumps(out[margin]), flush=True)

with open("results/qdtree_margin_sweep_1m.json", "w") as f:
    json.dump(out, f, indent=2)
