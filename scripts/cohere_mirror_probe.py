"""Probe: is the 768-d residual recall loss the bfloat16 rerank mirror?

cohere_margin_sweep showed recall@100 stuck at 0.981/0.984 regardless of
rerank pool depth (margin 32 -> 412 changes nothing) — the lost neighbors
are IN the pool but the rerank misorders them. The int8 arena's
full-precision mirror is bfloat16 (core.build_device_arena); on a
unit-normalized 768-d corpus the top-100 distance gaps are small enough
that bf16 component rounding (~2^-9 relative) can flip boundary ranks,
while the ground-truth oracle ranks in f32. This probe swaps the mirror
to f32 and re-measures.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/cohere_mirror_probe.py
"""
import gc
import time

import numpy as np

from vectorsearch_rbac_tpu.bench import generate_query_workload
from vectorsearch_rbac_tpu.bench.ground_truth import (
    GroundTruthOracle, compute_recall,
)
from vectorsearch_rbac_tpu.bench.queries import QueryWorkload
from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import resolve_dataset
from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.rbac.world import query_masks_for

N, NQ, K, NS = 1_000_000, 16384, 100, 2048
METRIC = "cosine"

corpus, qpool = resolve_dataset("cohere", num_vectors=N, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
workload = generate_query_workload(corpus, world, num_queries=NQ,
                                   topk=K, zipf_param=0,
                                   query_pool=qpool, seed=1)
queries = workload.vectors.astype(np.float32)
uids = workload.user_ids
qmasks = np.asarray(query_masks_for(world.user_masks, uids), np.uint32)
sample = np.arange(NS)
wl_s = QueryWorkload(vectors=queries[sample], user_ids=uids[sample],
                     topk=K, selectivities=workload.selectivities[sample],
                     repetitions=workload.repetitions[sample])

gt_arena = build_device_arena(corpus, world, block_rows=65536,
                              dtype="float32", with_aug=False,
                              metric=METRIC)
oracle = GroundTruthOracle(gt_arena, cache_dir="artifacts",
                           block_rows=65536, query_batch=1024)
truth = oracle.compute(corpus, world, wl_s, K)
del oracle, gt_arena
gc.collect()
print("truth ready", flush=True)

arena = build_device_arena(corpus, world, block_rows=131072,
                           dtype="int8", metric=METRIC)

for mirror in ("bf16", "f32"):
    if mirror == "f32":
        import dataclasses

        import jax

        vecs = np.zeros((arena.n_padded, corpus.dim), np.float32)
        vecs[: corpus.n] = corpus.vectors
        nrm = np.linalg.norm(vecs[: corpus.n], axis=1, keepdims=True)
        vecs[: corpus.n] /= np.maximum(nrm, 1e-30)
        arena = dataclasses.replace(arena, vectors=jax.device_put(vecs))
    for group, margin in ((32, 32), (32, 156)):
        idx = Int8FlatIndex(arena, None, query_batch=2048, q_tile=2048,
                            wire="u8", group=group, rerank_margin=margin)
        d, i = idx.search(queries[:NS], qmasks[:NS], K)
        rec = compute_recall(i, truth)
        print(f"mirror={mirror} group={group:3d} margin={margin:4d}: "
              f"recall@100 {rec:.4f}", flush=True)
        del idx
        gc.collect()
