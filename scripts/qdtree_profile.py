"""QDTree stage attribution at 1M (VERDICT-r4 item 3): where do the
~0.53 s/pass that separate QDTree (6.3k QPS) from ROLE (33k) go?

Host-side stages (route, scan_pack_host, merge) are backend-independent,
so this profile runs on the CPU backend when the TPU is busy (pass
--tpu to time device_scan for real). Prints the TiledSearcher StageTimer
plus routing fan-out and chunk-class histograms.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=cpu \
       python scripts/qdtree_profile.py
"""
import argparse
import collections
import json
import os
import sys
import time

ap = argparse.ArgumentParser()
ap.add_argument("--tpu", action="store_true")
ap.add_argument("--nq", type=int, default=4096)
args = ap.parse_args()
if not args.tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/artifacts/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
if not args.tpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from vectorsearch_rbac_tpu.bench import generate_query_workload
from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.partition import build_searcher
from vectorsearch_rbac_tpu.partition.tiled import chunk_class
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig

N = 1_000_000
TOPK = 10

corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
workload = generate_query_workload(corpus, world, num_queries=args.nq,
                                   topk=TOPK, zipf_param=0,
                                   query_pool=qpool, seed=1)
queries, user_ids = workload.vectors, workload.user_ids

arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")
cfg = FrameworkConfig(seed=0)
cfg.search.batch_size = 1024
cfg.optimizer.topk = TOPK
s = build_searcher("qdtree", corpus, world, arena, cfg, workload=workload)

# ---- structural stats ------------------------------------------------
nrows = s._part_nrows
ncs = {pid: len(c) for pid, c in s.part_chunks.items()}
classes = collections.Counter(
    chunk_class(nc, 8) for nc in ncs.values())
pids_per_q = s.batch_router(queries, user_ids)
fan = np.array([len(p) for p in pids_per_q])
rows_visited = np.array([sum(nrows.get(p, 0) for p in pp)
                         for pp in pids_per_q])
print(json.dumps({
    "partitions": len(s.partitions), "big": len(s._big),
    "chunk_class_hist": {str(k): v for k, v in sorted(classes.items())},
    "rows_hist": {"min": int(min(nrows.values())),
                  "med": int(np.median(list(nrows.values()))),
                  "max": int(max(nrows.values()))},
    "fanout": {"avg": round(float(fan.mean()), 2),
               "p50": int(np.median(fan)), "max": int(fan.max())},
    "rows_visited_per_q": {"avg": int(rows_visited.mean()),
                           "frac_of_n": round(float(rows_visited.mean())/N, 3)},
}, indent=2), flush=True)

# ---- timed passes ----------------------------------------------------
s.search_batch(queries, user_ids, world.user_masks, TOPK)  # warm/compile
s.timer.reset()
t0 = time.perf_counter()
PASSES = 3
for _ in range(PASSES):
    s.search_batch(queries, user_ids, world.user_masks, TOPK)
wall = (time.perf_counter() - t0) / PASSES
rep = {k: round(st.total_s / PASSES, 4)
       for k, st in s.timer.stages.items()}
print(json.dumps({"backend": jax.default_backend(),
                  "wall_per_pass_s": round(wall, 4),
                  "qps": round(args.nq / wall, 1),
                  "stages_per_pass_s": rep}, indent=2), flush=True)
