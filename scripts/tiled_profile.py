"""Stage profile of the tiled dynamic engine at 1M (dynamic = 496 QPS,
target: beat the reference's 1,544 QPS logical dynamic partitioning).

Prints the searcher's StageTimer report + per-dispatch breakdown.
"""
import time

import numpy as np

from vectorsearch_rbac_tpu.bench import generate_query_workload
from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.partition import build_searcher
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig

N = 1_000_000
TOPK = 10
NQ = 1024

corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
workload = generate_query_workload(corpus, world, num_queries=NQ, topk=TOPK,
                                   zipf_param=0, query_pool=qpool, seed=1)
queries, user_ids = workload.vectors, workload.user_ids

arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")

cfg = FrameworkConfig(seed=0)
cfg.search.batch_size = 1024
cfg.optimizer.storage_alpha = 2.0
cfg.optimizer.topk = TOPK
t0 = time.perf_counter()
s = build_searcher("dynamic", corpus, world, arena, cfg)
print(f"build {time.perf_counter()-t0:.1f}s; "
      f"{len(s.part_chunks)} partitions, "
      f"chunk counts: {sorted(len(c) for c in s.part_chunks.values())}",
      flush=True)

s.search_batch(queries, user_ids, world.user_masks, TOPK)  # warm
s.timer.reset()
walls = []
for _ in range(3):
    t0 = time.perf_counter()
    s.search_batch(queries, user_ids, world.user_masks, TOPK)
    walls.append(time.perf_counter() - t0)
wall = float(np.median(walls))
print(f"wall {wall*1000:.0f} ms  QPS {NQ/wall:.0f}", flush=True)
for name, st in s.timer.report().items():
    print(f"  stage {name:14s} mean {st['mean_ms']:8.1f} ms  "
          f"calls {st['count']}", flush=True)
