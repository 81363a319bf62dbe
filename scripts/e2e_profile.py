"""E2E serving-path profile at 1M: bf16 aug scan vs int8 fused kernel.

Breaks a 16k-query pass into enqueue vs finalize wall time per engine to
find where the int8 path loses its kernel advantage end-to-end (bench
shows 8.9k QPS int8 vs 19.4k bf16 round-1 despite a faster kernel).
"""
import time

import numpy as np

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.index.flat import FlatIndex
from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.rbac.world import query_masks_for

N = 1_000_000
NQ = 16384
K = 100

corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
rng = np.random.default_rng(1)
uids = rng.integers(0, 10_000, size=NQ)
queries = qpool[rng.choice(len(qpool), NQ, replace=True)].astype(np.float32)
qmasks = query_masks_for(world.user_masks, uids)

print("building arenas...", flush=True)
arena8 = build_device_arena(corpus, world, block_rows=131072, dtype="int8")
arena16 = build_device_arena(corpus, world, block_rows=131072, dtype="bfloat16")


def profile(idx, label, reps=3):
    fin = idx.search_deferred(queries, qmasks, K)
    fin()  # compile + warm
    enq = fine = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        fin = idx.search_deferred(queries, qmasks, K)
        t1 = time.perf_counter()
        d, i = fin()
        t2 = time.perf_counter()
        enq += t1 - t0
        fine += t2 - t1
    total = (enq + fine) / reps
    print(f"{label:28s} enqueue {enq/reps*1000:7.1f} ms  "
          f"finalize {fine/reps*1000:7.1f} ms  total {total*1000:7.1f} ms  "
          f"QPS {NQ/total:8.0f}", flush=True)
    return d, i


d8, i8 = profile(Int8FlatIndex(arena8, None, query_batch=4096,
                               block_rows=8192, group=128), "int8 g128 qb4096")
profile(Int8FlatIndex(arena8, None, query_batch=8192,
                      block_rows=8192, group=128), "int8 g128 qb8192")
profile(Int8FlatIndex(arena8, None, query_batch=16384,
                      block_rows=8192, group=128), "int8 g128 qb16384")
d16, i16 = profile(FlatIndex(arena16, None, block_rows=131072, mode="approx",
                             query_batch=4096), "bf16 aug approx qb4096")

agree = np.mean([
    len(set(i8[q][i8[q] >= 0].tolist()) & set(i16[q][i16[q] >= 0].tolist())) / K
    for q in range(0, NQ, 37)
])
print(f"int8 vs bf16 top-{K} overlap: {agree:.3f}")
