"""QD-tree shape vs max_depth at 1M (VERDICT-r4 item 3, CPU-only).

The depth-8 default leaves ~85% of the corpus in ONE leaf (served by the
big tier as a near-global scan). Does a deeper tree split it into
centroid-routable leaves without blowing up per-query fan-out?

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=cpu \
       python scripts/qdtree_depth_probe.py
"""
import json
import time

import numpy as np

from vectorsearch_rbac_tpu.bench import generate_query_workload
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.partition.qdtree import build_qd_tree
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator

N = 1_000_000
NQ = 512

corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
workload = generate_query_workload(corpus, world, num_queries=NQ, topk=10,
                                   zipf_param=0, query_pool=qpool, seed=1)
queries, user_ids = workload.vectors, workload.user_ids
users = np.unique(user_ids)[:64]
query_docsets = [world.user_docs(int(u)) for u in users]

rows_per_doc = 100
out = {}
for depth in (8, 10, 12, 14):
    t0 = time.perf_counter()
    tree = build_qd_tree(corpus, world, query_docsets, min_leaf=64,
                         max_depth=depth, seed=0)
    build_s = time.perf_counter() - t0
    sizes = np.array([len(d) * rows_per_doc for d in tree.leaf_docs])
    ucache = {}
    fan, rows_v, big_hits = [], [], 0
    for qi in range(NQ):
        uid = int(user_ids[qi])
        if uid not in ucache:
            ucache[uid] = set(world.user_docs(uid))
        pids = tree.route(ucache[uid], queries[qi], True, 0.25)
        fan.append(len(pids))
        rv = int(sizes[pids].sum())
        rows_v.append(rv)
        big_hits += int(any(sizes[p] > 96_000 for p in pids))
    out[str(depth)] = {
        "build_s": round(build_s, 1),
        "leaves": len(tree.leaf_docs),
        "leaf_rows": {"p50": int(np.median(sizes)),
                      "max": int(sizes.max()),
                      "n_big": int((sizes > 96_000).sum())},
        "fanout": {"avg": round(float(np.mean(fan)), 2),
                   "max": int(max(fan))},
        "rows_visited": {"avg": int(np.mean(rows_v)),
                         "frac": round(float(np.mean(rows_v)) / N, 4)},
        "queries_hitting_big_leaf": big_hits / NQ,
    }
    print(depth, json.dumps(out[str(depth)]), flush=True)

with open("results/qdtree_depth_probe.json", "w") as f:
    json.dump(out, f, indent=2)
