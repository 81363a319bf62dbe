"""Batch-size re-sweep under the round-3 pipeline (single stacked upload,
fused per-batch dispatch, eager threaded fetch). The round-2 sweep that
chose batch 2048 predates all three; with 16 dispatches per 32k pass the
per-dispatch tunnel overhead may now dominate the drain."""
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

for bs, qt in ((4096, 2048), (8192, 2048), (2048, 2048)):
    idx = Int8FlatIndex(arena, None, query_batch=bs, q_tile=qt)
    t0 = time.perf_counter()
    idx.search(queries, qmasks, K)   # compile + warm
    print(f"bs={bs} qt={qt} warm {time.perf_counter()-t0:.0f}s", flush=True)
    walls = []
    for r in range(8):
        t0 = time.perf_counter()
        fin = idx.search_deferred(queries, qmasks, K)
        t_enq = time.perf_counter() - t0
        fin()
        w = time.perf_counter() - t0
        walls.append(w)
        print(f"  bs={bs} pass {r}: {w*1000:7.1f} ms ({NQ/w:6.0f} QPS) "
              f"enq {t_enq*1000:6.1f} drain {(w-t_enq)*1000:7.1f}",
              flush=True)
    print(f"bs={bs}: median {np.median(walls)*1000:.1f} ms "
          f"({NQ/np.median(walls):,.0f} QPS)  best {min(walls)*1000:.1f}",
          flush=True)
    del idx
