"""Hybrid graph serving: step-budget sweep (recall vs QPS).

graph_term_probe measured that NO query terminates before the 64-step
budget (the classic fmin >= W[ef-1] rule never fires within ef=64 steps),
so dispatch time scales linearly with max_steps. This sweeps a clamp on
the per-(comb,partition) budget over the persisted hybrid_lab state to
find the recall/QPS knee.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/graph_budget_sweep.py
"""
import pickle
import time

import numpy as np

from vectorsearch_rbac_tpu.bench import generate_query_workload
from vectorsearch_rbac_tpu.bench.ground_truth import compute_recall
from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.partition import build_searcher
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig

N, TOPK, NQ = 1_000_000, 10, 4096
STATE = "state/hybrid_lab"

corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
workload = generate_query_workload(corpus, world, num_queries=NQ,
                                   topk=TOPK, zipf_param=0,
                                   query_pool=qpool, seed=1)
queries, user_ids = workload.vectors, workload.user_ids
ti = np.load(f"{STATE}/truth.npz")["ti"]

arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")
with open(f"{STATE}/plan.pkl", "rb") as f:
    plan = pickle.load(f)
z = np.load(f"{STATE}/graphs.npz")
graph_states = {int(k.split("_")[0]): None for k in z.files}
graph_states = {pid: {"neighbors": z[f"{pid}_neighbors"],
                      "entry": z[f"{pid}_entry"]} for pid in graph_states}

cfg = FrameworkConfig(seed=0)
cfg.search.ef_search = 40
cfg.search.batch_size = 1024
cfg.optimizer.storage_alpha = 2.0
cfg.optimizer.topk = TOPK
cfg.index.kind = "hybrid"
searcher = build_searcher("dynamic", corpus, world, arena, cfg, plan=plan,
                          packed=False, graph_states=graph_states)
orig_pp = searcher.probe_params

for ms_clamp, ef_clamp in ((64, 64), (48, 64), (32, 64), (48, 48),
                           (32, 32)):
    def pp(uid, pid, _o=orig_pp, _m=ms_clamp, _e=ef_clamp):
        kw = _o(uid, pid)
        if kw is not None:
            kw = dict(kw)
            kw["max_steps"] = min(int(kw.get("max_steps", 64)), _m)
            kw["ef_search"] = min(int(kw.get("ef_search", 64)), _e)
        return kw
    searcher.probe_params = pp
    searcher.search_batch(queries, user_ids, world.user_masks, TOPK)  # warm
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        d, i = searcher.search_batch(queries, user_ids, world.user_masks,
                                     TOPK)
        walls.append(time.perf_counter() - t0)
    rec = compute_recall(i, ti)
    print(f"ms<={ms_clamp} ef<={ef_clamp}: recall@10 {rec:.4f}  "
          f"QPS {NQ/float(np.median(walls)):,.0f}", flush=True)
