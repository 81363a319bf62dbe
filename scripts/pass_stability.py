"""Back-to-back pass walls at the bench shape: tunnel weather vs
self-inflicted congestion. 12 consecutive 32k-query passes; if walls
degrade monotonically the serving pipeline is congesting something, if
they bounce it's tunnel weather."""
import time

import numpy as np

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.rbac.world import query_masks_for

N, NQ, K = 1_000_000, 32768, 100
corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
rng = np.random.default_rng(1)
uids = rng.integers(0, 10_000, size=NQ)
queries = qpool[rng.choice(len(qpool), NQ, replace=True)].astype(np.float32)
qmasks = np.asarray(query_masks_for(world.user_masks, uids), np.uint32)
arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")
print("arena up", flush=True)

idx = Int8FlatIndex(arena, None, query_batch=2048, q_tile=2048)
idx.search(queries[:2048], qmasks[:2048], K)  # compile small
t0 = time.perf_counter()
idx.search(queries, qmasks, K)               # compile full + warm
print(f"warm {time.perf_counter()-t0:.1f}s", flush=True)
walls = []
for r in range(12):
    t0 = time.perf_counter()
    fin = idx.search_deferred(queries, qmasks, K)
    t_enq = time.perf_counter() - t0
    fin()
    w = time.perf_counter() - t0
    walls.append(w)
    print(f"pass {r:2d}: {w*1000:7.1f} ms  ({NQ/w:7.0f} QPS)  "
          f"enqueue {t_enq*1000:7.1f} ms  drain {(w-t_enq)*1000:7.1f} ms",
          flush=True)
print("median", np.median(walls) * 1000, "best", min(walls) * 1000)
