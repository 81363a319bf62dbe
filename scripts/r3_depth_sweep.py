"""Streaming-depth sweep in ONE process (weather-controlled A/B).

Hypothesis from r3_overlap_probe's 2.2x pair gain: the pass drain is
fetch-bandwidth-bound with kernel time hiding inside it, so a deeper
in-flight window converges per-pass cost to the D2H floor (~11.7 MB /
75 MB/s ~ 156 ms = ~200k QPS) instead of enqueue+kernel+fetch.

Runs repeated rounds of [depth1, depth2, depth3, depth4], 6 passes each,
interleaved so minute-scale tunnel weather hits all depths equally.
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
idx = Int8FlatIndex(arena, None, query_batch=2048, q_tile=2048)
idx.search(queries, qmasks, K)   # compile + warm
print("warm", flush=True)


def run_depth(depth, n_passes=6):
    walls = []
    fins = []
    for _ in range(depth):               # prime
        fins.append(idx.search_deferred(queries, qmasks, K))
    t_prev = time.perf_counter()
    for p in range(n_passes):
        if p + depth < n_passes + depth:
            fins.append(idx.search_deferred(queries, qmasks, K))
        fins.pop(0)()
        now = time.perf_counter()
        walls.append(now - t_prev)
        t_prev = now
    while fins:                           # drain the pipe (untimed)
        fins.pop(0)()
    return walls


results = {d: [] for d in (1, 2, 3, 4)}
for rnd in range(3):
    for d in (1, 2, 3, 4):
        w = run_depth(d)
        results[d].extend(w)
        print(f"round {rnd} depth {d}: "
              + " ".join(f"{x*1000:6.1f}" for x in w), flush=True)

for d, w in results.items():
    med = np.median(w)
    print(f"depth {d}: median {med*1000:7.1f} ms ({NQ/med:7.0f} QPS)  "
          f"best {min(w)*1000:7.1f} ({NQ/min(w):7.0f} QPS)", flush=True)
