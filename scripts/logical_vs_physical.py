"""Logical (no-copy) vs physical partition serving A/B at 1M — the
reference's central memory-sharing experiment, reproduced TPU-side.

Mirrors /root/reference/logical_partition_benchmark/benchmark/src/
role_partition_results.json + physical_role_partition_results.json
(pointer-HNSW over one shared vector table vs per-role gathered copies:
2,171.8 MB vs 4,852.6 MB at ~equal recall) and the dynamic-partition pair.

Axes here:
  layout   x  serving mode
  ROLE (100 per-role partitions)   logical | physical
  DYNAMIC (AnonySys plan)          logical | physical
Index: HNSW graphs (M=16), iterative search with sampled entries, plus the
storage split (graph/index bytes vs shared vs duplicated vector bytes).

Writes results/logical_vs_physical.json.
"""
import json
import time

import numpy as np

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.index.hnsw import HNSWIndex
from vectorsearch_rbac_tpu.bench.ground_truth import GroundTruthOracle, compute_recall
from vectorsearch_rbac_tpu.bench.queries import QueryWorkload
from vectorsearch_rbac_tpu.partition.base import BuiltPartition, PartitionedSearcher
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig
from vectorsearch_rbac_tpu.partition.dynamic import build_dynamic_searcher
from vectorsearch_rbac_tpu.partition.dynamic.optimizer import PlannerInputs
from vectorsearch_rbac_tpu.partition.dynamic.materialize import plan_dynamic_partitions
from vectorsearch_rbac_tpu.models.cost import CostModelParams

N = 1_000_000
NQ = 1024
K = 10          # reference protocol: top-10, per-role HNSW
EF = 48

print("corpus...", flush=True)
corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
rng = np.random.default_rng(1)
uids = rng.integers(0, 10_000, size=NQ)
queries = qpool[rng.choice(len(qpool), NQ, replace=True)].astype(np.float32)

arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")
print("arena up", flush=True)

wl = QueryWorkload(vectors=queries, user_ids=uids, topk=K,
                   selectivities=np.zeros(NQ), repetitions=np.ones(NQ))
gt_arena = build_device_arena(corpus, world, block_rows=65536,
                              dtype="float32", with_aug=False)
oracle = GroundTruthOracle(gt_arena, cache_dir="artifacts", block_rows=65536,
                           query_batch=1024)
truth = oracle.compute(corpus, world, wl, K)
del oracle, gt_arena
print("ground truth done", flush=True)


def build_role_graph_searcher(logical: bool) -> PartitionedSearcher:
    partitions = {}
    t0 = time.perf_counter()
    for role, docs in sorted(world.role_to_docs.items()):
        rows = corpus.rows_for_docs(
            np.fromiter(docs, dtype=np.int64, count=len(docs)))
        if not len(rows):
            continue
        idx = HNSWIndex(arena, rows, m=16, ef_construction=64,
                        ef_search=EF, query_batch=1024, seed=role,
                        logical=logical)
        partitions[role] = BuiltPartition(pid=role, rows=rows, index=idx,
                                          label=f"role_{role}")
    build_s = time.perf_counter() - t0
    u2r = world.user_to_roles

    def router(uid):
        return tuple(r for r in u2r.get(uid, ()) if r in partitions)

    s = PartitionedSearcher(arena, partitions, router,
                            name=f"role_hnsw_{'logical' if logical else 'physical'}")

    def probe_params(uid, pid):
        return {"iterative": True, "ef_search": EF, "sampled_entry": True}
    s.probe_params = probe_params
    if logical:
        from vectorsearch_rbac_tpu.partition.graph_batch import GraphProbeBatcher
        s.graph_batcher = GraphProbeBatcher(
            arena, {pid: p.index for pid, p in partitions.items()})
    s.build_s = build_s
    return s


def build_dynamic_graph_searcher(logical: bool):
    cfg = FrameworkConfig(seed=0)
    cfg.index.kind = "hybrid"
    cfg.index.hnsw_m = 16
    cfg.index.hnsw_ef_construction = 64
    cfg.search.ef_search = EF
    cfg.optimizer.storage_alpha = 1.5
    cfg.optimizer.topk = K
    t0 = time.perf_counter()
    s = build_dynamic_searcher(corpus, world, arena, cfg, packed=False)
    s.build_s = time.perf_counter() - t0
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex

    if not logical:
        # physical arm: rebuild graph partitions as gathered copies and
        # drop the batcher (per-partition dispatches, like the reference's
        # per-table indexes)
        if hasattr(s, "graph_batcher"):
            del s.graph_batcher
        for pid, p in s.partitions.items():
            if isinstance(p.index, HNSWIndex) and p.index.logical:
                p.index = HNSWIndex(
                    arena, p.rows, m=16, ef_construction=64, ef_search=EF,
                    query_batch=1024, seed=pid, logical=False,
                    graph_state=p.index.graph_state())
    else:
        # logical arm all the way down: flat-tier partitions also serve
        # no-copy from the shared quant arena
        for pid, p in s.partitions.items():
            if isinstance(p.index, Int8FlatIndex) and not p.index.logical \
                    and p.rows is not None:
                p.index = Int8FlatIndex(
                    arena, p.rows, query_batch=2048, block_rows=8192,
                    dist16=False, logical=True)
    return s


def measure(searcher):
    masks = world.user_masks
    searcher.search_batch(queries, uids, masks, K)   # warm/compile
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        d, ids = searcher.search_batch(queries, uids, masks, K)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    rec = compute_recall(ids, truth)
    st = searcher.storage_report()
    return {
        "recall_at_%d" % K: round(rec, 4),
        "qps": round(NQ / wall, 1),
        "avg_latency_ms": round(wall / NQ * 1000, 4),
        "storage": {
            "shared_vector_mb": round(st["arena_vectors_mb"]
                                      + st["arena_aux_mb"], 1),
            "partition_vector_mb": round(st["partition_vectors_mb"], 1),
            "partition_index_mb": round(st["partition_index_mb"], 1),
            "total_mb": round(st["total_mb"], 1),
        },
        "num_partitions": st["num_partitions"],
        "build_s": round(getattr(searcher, "build_s", 0.0), 1),
    }


out = {
    "protocol": {
        "n": N, "dim": corpus.dim, "queries": NQ, "topk": K, "ef": EF,
        "world": "tree RBAC 100 roles / 10k users",
        "reference_mirror": "logical_partition_benchmark/benchmark/src/"
                            "{role,physical_role,dynamic,physical_dynamic}"
                            "_partition_results.json",
    },
}
for layout, builder in (("role", build_role_graph_searcher),
                        ("dynamic", build_dynamic_graph_searcher)):
    for mode in ("logical", "physical"):
        key = f"{layout}_{mode}"
        print(f"== {key} ==", flush=True)
        s = builder(mode == "logical")
        out[key] = measure(s)
        print(json.dumps(out[key]), flush=True)
        del s

with open("results/logical_vs_physical.json", "w") as f:
    json.dump(out, f, indent=2)
print("wrote results/logical_vs_physical.json")
