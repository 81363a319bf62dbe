"""Hybrid dynamic graph-serving lab: cached-state perf iteration.

The full anonysys_hnsw_1m.py protocol costs ~15 min per run, almost all of
it in HNSW partition builds — useless when iterating on SERVING. This lab
splits the protocol:

  prepare  build everything once (corpus, world, plan, ground truth,
           hybrid searcher) and persist the expensive parts — the plan
           pickle and every graph partition's graph_state npz — under
           state/hybrid_lab/ (the analog of the reference persisting
           per-partition faiss index files, load_result_to_database.py).
  serve    reload the state (arena rebuild + graph uploads only, ~2 min),
           run measured passes with the engine StageTimer breakdown and
           GraphProbeBatcher per-group dispatch walls.

Usage: PYTHONPATH=. python scripts/hybrid_lab.py prepare|serve
"""
import json
import os
import pickle
import sys
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
NQ = 4096
STATE = "state/hybrid_lab"


def make_cfg():
    cfg = FrameworkConfig(seed=0)
    cfg.search.ef_search = 40
    cfg.search.batch_size = 1024
    cfg.optimizer.storage_alpha = 2.0
    cfg.optimizer.topk = TOPK
    cfg.index.kind = "hybrid"
    return cfg


def build_world_workload():
    t0 = time.perf_counter()
    corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100,
                                     seed=0)
    world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                              num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                              seed=0).generate()
    workload = generate_query_workload(corpus, world, num_queries=NQ,
                                       topk=TOPK, zipf_param=0,
                                       query_pool=qpool, seed=1)
    print(f"corpus+world+workload {time.perf_counter()-t0:.0f}s", flush=True)
    return corpus, world, workload


def prepare():
    os.makedirs(STATE, exist_ok=True)
    corpus, world, workload = build_world_workload()
    queries, user_ids = workload.vectors, workload.user_ids

    t0 = time.perf_counter()
    gt_arena = build_device_arena(corpus, world, block_rows=65536,
                                  dtype="float32", with_aug=False)
    oracle = FlatIndex(gt_arena, None, block_rows=65536, mode="exact",
                       query_batch=1024)
    qmasks = query_masks_for(world.user_masks, user_ids)
    td, ti = oracle.search(queries, qmasks, TOPK)
    del oracle, gt_arena
    print(f"ground truth {time.perf_counter()-t0:.0f}s", flush=True)
    np.savez(f"{STATE}/truth.npz", ti=ti, td=td)

    t0 = time.perf_counter()
    arena = build_device_arena(corpus, world, block_rows=131072,
                               dtype="int8")
    print(f"arena {time.perf_counter()-t0:.0f}s", flush=True)

    cfg = make_cfg()
    t0 = time.perf_counter()
    searcher = build_searcher("dynamic", corpus, world, arena, cfg,
                              packed=False)
    print(f"hybrid build {time.perf_counter()-t0:.0f}s", flush=True)

    with open(f"{STATE}/plan.pkl", "wb") as f:
        pickle.dump(searcher.plan, f)
    graphs = {}
    from vectorsearch_rbac_tpu.index.hnsw import HNSWIndex
    for pid, part in searcher.partitions.items():
        if isinstance(part.index, HNSWIndex):
            st = part.index.graph_state()
            graphs[f"{pid}_neighbors"] = st["neighbors"]
            graphs[f"{pid}_entry"] = st["entry"]
    np.savez_compressed(f"{STATE}/graphs.npz", **graphs)
    print(f"saved {len(graphs)//2} graph partitions -> {STATE}", flush=True)
    serve(preloaded=(corpus, world, workload, ti, arena, searcher))


def load_graph_states():
    z = np.load(f"{STATE}/graphs.npz")
    pids = sorted({int(k.split("_")[0]) for k in z.files})
    return {pid: {"neighbors": z[f"{pid}_neighbors"],
                  "entry": z[f"{pid}_entry"]} for pid in pids}


def serve(preloaded=None):
    if preloaded is not None:
        corpus, world, workload, ti, arena, searcher = preloaded
    else:
        corpus, world, workload = build_world_workload()
        ti = np.load(f"{STATE}/truth.npz")["ti"]
        t0 = time.perf_counter()
        arena = build_device_arena(corpus, world, block_rows=131072,
                                   dtype="int8")
        print(f"arena {time.perf_counter()-t0:.0f}s", flush=True)
        with open(f"{STATE}/plan.pkl", "rb") as f:
            plan = pickle.load(f)
        t0 = time.perf_counter()
        searcher = build_searcher("dynamic", corpus, world, arena,
                                  make_cfg(), plan=plan, packed=False,
                                  graph_states=load_graph_states())
        print(f"searcher reload {time.perf_counter()-t0:.0f}s", flush=True)

    queries, user_ids = workload.vectors, workload.user_ids
    # warm (compiles)
    t0 = time.perf_counter()
    d, i = searcher.search_batch(queries, user_ids, world.user_masks, TOPK)
    print(f"warm pass {time.perf_counter()-t0:.1f}s "
          f"recall {compute_recall(i, ti):.4f}", flush=True)

    batcher = getattr(searcher, "graph_batcher", None)
    walls = []
    for it in range(4):
        searcher.timer.reset()
        t0 = time.perf_counter()
        d, i = searcher.search_batch(queries, user_ids, world.user_masks,
                                     TOPK)
        w = time.perf_counter() - t0
        walls.append(w)
        print(f"pass {it}: {w*1000:.0f} ms  QPS {NQ/w:,.0f}  "
              f"stages {searcher.timer.report()}", flush=True)
    # one debug-timed pass: per-group dispatch walls
    if batcher is not None:
        batcher.debug_timing = True
        searcher.timer.reset()
        t0 = time.perf_counter()
        d, i = searcher.search_batch(queries, user_ids, world.user_masks,
                                     TOPK)
        w = time.perf_counter() - t0
        batcher.debug_timing = False
        print(f"debug pass: {w*1000:.0f} ms  "
              f"stages {searcher.timer.report()}", flush=True)
        for st in batcher.last_stats:
            print("  group", json.dumps(st), flush=True)
    rec = compute_recall(i, ti)
    best = min(walls)
    print(f"RESULT recall@10 {rec:.4f}  best QPS {NQ/best:,.0f}  "
          f"median QPS {NQ/float(np.median(walls)):,.0f}", flush=True)


if __name__ == "__main__":
    {"prepare": prepare, "serve": serve}[sys.argv[1]]()
