"""A/B: dynamic+HNSW recall at small scale — fixed-budget traversal vs
iterative rescan with per-comb admissible entry points.

CPU-runnable sanity check before the 1M on-chip measurement (VERDICT item 1).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")  # undo axon sitecustomize override

import time

import numpy as np

from vectorsearch_rbac_tpu.bench import generate_query_workload
from vectorsearch_rbac_tpu.bench.ground_truth import compute_recall
from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.index.flat import FlatIndex
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.partition import build_searcher
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.rbac.world import query_masks_for
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig

N_DOCS = 600            # x 100 blocks = 60k rows
TOPK = 10
NQ = 256
ALPHA = 1.3             # tight budget -> big mixed remainder partitions

corpus, _qpool = sift_like_corpus(num_vectors=N_DOCS * 100, blocks_per_doc=100,
                                  dim=64, seed=3)
world = TreeRBACGenerator(num_users=500, num_roles=60, num_docs=N_DOCS,
                          h=4, b0=3, b1=3, seed=7).generate()
print(f"corpus {corpus.n} rows, avg user sel {world.average_user_selectivity():.3f}")

arena = build_device_arena(corpus, world, block_rows=4096, dtype="float32")
workload = generate_query_workload(corpus, world, num_queries=NQ, topk=TOPK,
                                   zipf_param=0, seed=11)
queries, user_ids = workload.vectors, workload.user_ids
masks = world.user_masks
qmasks = query_masks_for(masks, user_ids)

# exact oracle
oracle = FlatIndex(arena, None, block_rows=4096, mode="exact", query_batch=NQ)
td, ti = oracle.search(queries, qmasks, TOPK)

cfg = FrameworkConfig(seed=0)
cfg.index.kind = "hnsw"
cfg.search.ef_search = 40
cfg.search.batch_size = NQ
cfg.optimizer.storage_alpha = ALPHA
cfg.optimizer.topk = TOPK

t0 = time.perf_counter()
searcher = build_searcher("dynamic", corpus, world, arena, cfg, packed=False)
print(f"dynamic searcher built in {time.perf_counter() - t0:.1f}s, "
      f"{len(searcher.partitions)} partitions")

# per-partition within-comb selectivity profile
plan = searcher.plan
sels = []
for comb, parts in plan.trackers.items():
    cdocs = set()
    for r in comb:
        cdocs.update(world.role_to_docs.get(r, ()))
    for pid in parts:
        pdocs = plan.assignment.get(pid, set())
        if pdocs:
            sels.append(len(cdocs & pdocs) / len(pdocs))
print(f"within-partition selectivity: min {min(sels):.2f} "
      f"median {np.median(sels):.2f} mean {np.mean(sels):.2f}")

# A: round-1 fixed-budget path (disable probe_params)
pp = searcher.probe_params
searcher.probe_params = None
t0 = time.perf_counter()
d_a, i_a = searcher.search_batch(queries, user_ids, masks, TOPK)
t_a = time.perf_counter() - t0
r_a = compute_recall(i_a, ti)
print(f"A fixed-budget ef=40:      recall@10 {r_a:.4f}  {t_a:.1f}s")

# B: iterative rescan + per-comb admissible entries
searcher.probe_params = pp
t0 = time.perf_counter()
d_b, i_b = searcher.search_batch(queries, user_ids, masks, TOPK)
t_b = time.perf_counter() - t0
r_b = compute_recall(i_b, ti)
print(f"B iterative + entries:     recall@10 {r_b:.4f}  {t_b:.1f}s")

# C: hybrid executor (graphs only where selectivity holds; flat otherwise)
import copy

cfg_h = copy.deepcopy(cfg)
cfg_h.index.kind = "hybrid"
t0 = time.perf_counter()
searcher_h = build_searcher("dynamic", corpus, world, arena, cfg_h,
                            plan=plan, packed=False)
print(f"hybrid built in {time.perf_counter() - t0:.1f}s")
t0 = time.perf_counter()
d_c, i_c = searcher_h.search_batch(queries, user_ids, masks, TOPK)
t_c = time.perf_counter() - t0
r_c = compute_recall(i_c, ti)
print(f"C hybrid graphs+flat:      recall@10 {r_c:.4f}  {t_c:.1f}s")
