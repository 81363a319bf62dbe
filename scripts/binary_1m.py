"""Binary-quantization lab at 1M: the pgvector bit(d)/binary_quantize
recipe measured on the RBAC-filtered SIFT1M protocol.

Questions answered (results/binary_1m.json):
- recall@100 of hamming candidates + shared-arena rerank vs rerank width
  (pgvector's documented BQ re-ranking recipe);
- QPS vs the int8 flagship: the bit payload is 16 B/row vs 128 B/row,
  so the HBM-bound scan leg reads 8x less — how much survives end-to-end
  through the tunnel;
- storage split: the BQ index adds ONLY packed bits (no vector copy).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/binary_1m.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectorsearch_rbac_tpu.bench import GroundTruthOracle
from vectorsearch_rbac_tpu.bench.queries import generate_query_workload
from vectorsearch_rbac_tpu.core import Corpus, build_device_arena
from vectorsearch_rbac_tpu.data import resolve_dataset
from vectorsearch_rbac_tpu.index.binary import BinaryQuantIndex
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    n, nq, k = 1_000_000, 8192, 100
    cache = f"artifacts/corpus_sift1m_{n}_0.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        corpus = Corpus(vectors=z["vectors"], doc_ids=z["doc_ids"],
                        block_ids=z["block_ids"])
        query_pool = z["query_pool"] if z["query_pool"].size else None
        log(f"corpus cache hit: {cache}")
    else:
        corpus, query_pool = resolve_dataset("sift1m", num_vectors=n, seed=0)
    world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                              num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                              seed=0).generate()
    workload = generate_query_workload(corpus, world, num_queries=nq,
                                       topk=k, zipf_param=0,
                                       query_pool=query_pool, seed=1)

    # oracle on a sample (reuses the bench GT digest/cache when shapes match)
    gt_arena = build_device_arena(corpus, world, block_rows=65536,
                                  dtype="float32", with_aug=False)
    oracle = GroundTruthOracle(gt_arena, cache_dir="artifacts",
                               block_rows=65536, query_batch=1024)
    ns = 2048
    from vectorsearch_rbac_tpu.bench.queries import QueryWorkload
    sub = QueryWorkload(vectors=workload.vectors[:ns],
                        user_ids=workload.user_ids[:ns], topk=k,
                        selectivities=workload.selectivities[:ns],
                        repetitions=workload.repetitions[:ns])
    t0 = time.perf_counter()
    truth = oracle.compute(corpus, world, sub, k)
    log(f"ground truth: {time.perf_counter() - t0:.1f}s")

    # serving arena: bf16 rows (the rerank source), bits built from host f32
    arena = build_device_arena(corpus, world, block_rows=131072,
                               dtype="bfloat16", with_aug=False)
    masks = world.user_masks[workload.user_ids].astype(np.uint32)
    out = {"config": f"1M x 128-d sift-like, tree RBAC 100 roles, {nq} "
                     f"queries, top-{k}, bf16 arena + packed-bit index, "
                     f"median thresholds",
           "hardware": "TPU v5e (axon tunnel)", "sweeps": {}}

    for mult in (2, 4, 8):
        t0 = time.perf_counter()
        idx = BinaryQuantIndex(arena, None, block_rows=131072,
                               query_batch=2048, rerank=True,
                               rerank_mult=mult, mode="exact")
        build_s = time.perf_counter() - t0
        # warm
        idx.search(workload.vectors[:2048], masks[:2048], k)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            d, ids = idx.search(workload.vectors, masks, k)
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        hits = tot = 0
        for qi in range(ns):
            ref = set(int(r) for r in truth[qi] if r >= 0)
            got = set(int(r) for r in ids[qi] if r >= 0)
            hits += len(ref & got)
            tot += len(ref)
        rec = hits / max(tot, 1)
        st = idx.storage_bytes()
        row = {"rerank_mult": mult, "recall_at_100": round(rec, 4),
               "qps": round(nq / wall, 1),
               "pass_walls_s": [round(w, 3) for w in walls],
               "build_s": round(build_s, 1),
               "index_mb": round(st["index"] / 1e6, 1),
               "vector_copy_mb": st["vectors"] / 1e6}
        out["sweeps"][f"mult{mult}"] = row
        log(json.dumps(row))

    # raw <~> operator leg (no rerank): hamming distances end-to-end
    idx = BinaryQuantIndex(arena, None, block_rows=131072, query_batch=2048,
                           rerank=False, mode="exact")
    idx.search(workload.vectors[:2048], masks[:2048], k)
    t0 = time.perf_counter()
    d, ids = idx.search(workload.vectors, masks, k)
    wall = time.perf_counter() - t0
    hits = tot = 0
    for qi in range(ns):
        ref = set(int(r) for r in truth[qi] if r >= 0)
        got = set(int(r) for r in ids[qi] if r >= 0)
        hits += len(ref & got)
        tot += len(ref)
    out["raw_hamming"] = {"recall_at_100_vs_l2_gt": round(hits / max(tot, 1), 4),
                          "qps": round(nq / wall, 1)}
    log(json.dumps(out["raw_hamming"]))

    with open("results/binary_1m.json", "w") as f:
        json.dump(out, f, indent=2)
    log("wrote results/binary_1m.json")


if __name__ == "__main__":
    main()
