"""Binary-quantization lab at 1M: the pgvector bit(d)/binary_quantize
recipe measured on RBAC-filtered corpora (results/binary_1m.json).

Two legs:
- 128-d SIFT-like (the repo's headline corpus): EXPECTED to under-deliver
  — 128-bit signatures bucket a ~36k-row masked candidate set into 129
  hamming levels, so top-100 candidates are tie-dominated. Measured to
  document the boundary honestly.
- 768-d cohere-shaped cosine (unit vectors): the regime pgvector's
  binary_quantize recipe targets (bit signatures ~ embedding width).
  Here the packed-bit payload is 96 B/row vs 768 B int8 — the scan leg
  reads 8x less HBM — and sign bits preserve cosine neighborhoods.

First run's lesson (2026-08-18): block_rows=131072 x query_batch=2048
with exact per-block top-k built (Q, B) 1-GB score planes and k*mult-wide
exact sorts — 6 s/pass compute-bound. This version uses 32768-row blocks,
512-query batches, approx candidate reduction.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/binary_1m.py
"""

import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectorsearch_rbac_tpu.bench import GroundTruthOracle
from vectorsearch_rbac_tpu.bench.queries import (
    QueryWorkload, generate_query_workload,
)
from vectorsearch_rbac_tpu.core import Corpus, build_device_arena
from vectorsearch_rbac_tpu.data import resolve_dataset
from vectorsearch_rbac_tpu.index.binary import BinaryQuantIndex
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator


def log(m):
    print(m, file=sys.stderr, flush=True)


def run_leg(corpus, query_pool, metric, nq, k, ns, mults, out, leg):
    world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                              num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                              seed=0).generate()
    workload = generate_query_workload(corpus, world, num_queries=nq,
                                       topk=k, zipf_param=0,
                                       query_pool=query_pool, seed=1)
    sub = QueryWorkload(vectors=workload.vectors[:ns],
                        user_ids=workload.user_ids[:ns], topk=k,
                        selectivities=workload.selectivities[:ns],
                        repetitions=workload.repetitions[:ns])
    gt_arena = build_device_arena(corpus, world, block_rows=65536,
                                  dtype="float32", with_aug=False,
                                  metric=metric)
    oracle = GroundTruthOracle(gt_arena, cache_dir="artifacts",
                               block_rows=65536, query_batch=1024)
    t0 = time.perf_counter()
    truth = oracle.compute(corpus, world, sub, k)
    log(f"[{leg}] ground truth: {time.perf_counter() - t0:.1f}s")
    del oracle, gt_arena
    gc.collect()

    arena = build_device_arena(corpus, world, block_rows=32768,
                               dtype="bfloat16", with_aug=False,
                               metric=metric)
    masks = world.user_masks[workload.user_ids].astype(np.uint32)
    rows = {}
    for mult in mults:
        t0 = time.perf_counter()
        idx = BinaryQuantIndex(arena, None, block_rows=32768,
                               query_batch=512, rerank=True,
                               rerank_mult=mult, mode="approx")
        build_s = time.perf_counter() - t0
        idx.search(workload.vectors[:512], masks[:512], k)  # warm
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
        st = idx.storage_bytes()
        row = {"rerank_mult": mult,
               "recall_at_100": round(hits / max(tot, 1), 4),
               "qps": round(nq / wall, 1),
               "pass_walls_s": [round(w, 3) for w in walls],
               "build_s": round(build_s, 1),
               "bits_mb": round(idx._bits.size * 4 / 1e6, 1),
               "index_mb": round(st["index"] / 1e6, 1),
               "vector_copy_mb": st["vectors"] / 1e6}
        rows[f"mult{mult}"] = row
        log(f"[{leg}] " + json.dumps(row))
        del idx
        gc.collect()
    out["legs"][leg] = rows
    del arena
    gc.collect()


def main():
    n, nq, k, ns = 1_000_000, 8192, 100, 2048
    out = {"config": "binary_quantize + shared-arena rerank (pgvector bit "
                     "recipe): median-threshold sign bits, approx hamming "
                     "candidates (rerank_mult*k wide), bf16 rerank; "
                     f"{nq} queries, top-{k}, tree RBAC 100 roles",
           "hardware": "TPU v5e (axon tunnel)", "legs": {}}

    cache = f"artifacts/corpus_sift1m_{n}_0.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        corpus = Corpus(vectors=z["vectors"], doc_ids=z["doc_ids"],
                        block_ids=z["block_ids"])
        qpool = z["query_pool"] if z["query_pool"].size else None
    else:
        corpus, qpool = resolve_dataset("sift1m", num_vectors=n, seed=0)
    run_leg(corpus, qpool, "l2", nq, k, ns, (4, 16), out, "sift128_l2")
    del corpus
    gc.collect()

    corpus, qpool = resolve_dataset("cohere", num_vectors=n, seed=0)
    run_leg(corpus, qpool, "cosine", nq, k, ns, (2, 4), out,
            "cohere768_cosine")

    with open("results/binary_1m.json", "w") as f:
        json.dump(out, f, indent=2)
    log("wrote results/binary_1m.json")


if __name__ == "__main__":
    main()
