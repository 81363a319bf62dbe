"""Two probes for the next headline step:

A) cross-pass overlap capacity: enqueue pass B's upload+dispatches while
   pass A drains. If 2-pass total << 2x single-pass wall, a streaming
   (double-buffered) serving loop is worth building; if equal, the tunnel
   serializes H2D/compute/D2H and only byte/FLOP cuts help.
B) block_rows 8192 vs 4096: halves grid steps/epilogue executions at
   2.1 MB VMEM per block (still under the 3.7 MB probed bound).
"""
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
idx.search(queries, qmasks, K)   # compile + warm
print("warm A", flush=True)

print("--- A: single-pass walls", flush=True)
singles = []
for r in range(4):
    t0 = time.perf_counter()
    idx.search(queries, qmasks, K)
    singles.append(time.perf_counter() - t0)
    print(f"  single {r}: {singles[-1]*1000:.1f} ms", flush=True)

print("--- A: overlapped pairs", flush=True)
pairs = []
for r in range(4):
    t0 = time.perf_counter()
    f1 = idx.search_deferred(queries, qmasks, K)
    f2 = idx.search_deferred(queries, qmasks, K)
    f1(); f2()
    pairs.append(time.perf_counter() - t0)
    print(f"  pair {r}: {pairs[-1]*1000:.1f} ms "
          f"(vs 2x single {2*np.median(singles)*1000:.1f})", flush=True)
print(f"single med {np.median(singles)*1000:.1f}  "
      f"pair med {np.median(pairs)*1000:.1f}  "
      f"overlap gain {2*np.median(singles)/np.median(pairs):.2f}x",
      flush=True)
del idx

print("--- B: block_rows 8192", flush=True)
idx8 = Int8FlatIndex(arena, None, query_batch=2048, q_tile=2048,
                     block_rows=8192)
t0 = time.perf_counter()
idx8.search(queries, qmasks, K)
print(f"warm B {time.perf_counter()-t0:.0f}s "
      f"(block_rows={idx8.block_rows})", flush=True)
for r in range(6):
    t0 = time.perf_counter()
    fin = idx8.search_deferred(queries, qmasks, K)
    te = time.perf_counter() - t0
    fin()
    w = time.perf_counter() - t0
    print(f"  br8192 pass {r}: {w*1000:7.1f} ms ({NQ/w:6.0f} QPS) "
          f"enq {te*1000:5.1f} drain {(w-te)*1000:7.1f}", flush=True)
