"""768-d 1M cosine serving — round-5: single-chunk wide kernel + the
nibble residual wire (VERDICT-r4 item 4).

Round-4 left the 768-d default leg at 11.2k QPS @ 0.9924 with an
unexplained ids-wire anomaly (residual+ids measured SLOWER than
residual+u8 across pass walls spanning 1.6-2.7 s — weather). Round-5
changes measured here:
  - the wide kernel runs single-chunk (d_chunk = d_pad) at 768-d:
    29.9 ms vs the old dc256 default's 42.8 ms per 16k q x 262k rows
    (results/r5_wide_roofline.json)
  - residual4: nibble-packed residual codes (+384 B/query, ~12-bit
    device rebuild) halve the residual wire on the upload-bound pass
  - legs run INTERLEAVED (one pass per leg per round, 5 rounds) so all
    legs share the same weather distribution instead of each owning a
    window — the protocol fix for the round-4 anomaly.

Legs (cosine, one corpus/workload/truth):
  dequant        0 extra upload B              [speed control]
  residual_u8    +768 B/q, u8 result wire      [round-4 default]
  residual_ids   +768 B/q, ids result wire     [the anomaly re-measure]
  residual4_u8   +384 B/q, u8 result wire
  residual4_ids  +384 B/q, ids result wire     [round-5 candidate]

Writes results/cohere_768d_1m_r5.json.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/cohere_768d_r5.py
"""
import gc
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/artifacts/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

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

N, NQ, K, NS, REPS = 1_000_000, 16384, 100, 2048, 5
METRIC = "cosine"

out = {"config": ("cohere/wikipedia-shaped 1M x 768-d unit-normalized, "
                  "tree RBAC 100 roles, 16384 queries, top-100, cosine; "
                  "single-chunk wide kernel; legs INTERLEAVED per round "
                  "to share weather"),
       "hardware": "TPU v5e (axon tunnel)", "legs": {}}

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
t0 = time.perf_counter()
truth = oracle.compute(corpus, world, wl_s, K)
print(f"truth {time.perf_counter()-t0:.1f}s", flush=True)
del oracle, gt_arena
gc.collect()

arena = build_device_arena(corpus, world, block_rows=131072,
                           dtype="int8", metric=METRIC)

LEGS = [("dequant", "dequant", "u8"),
        ("residual_u8", "residual", "u8"),
        ("residual_ids", "residual", "ids"),
        ("residual4_u8", "residual4", "u8"),
        ("residual4_ids", "residual4", "ids")]

idxs = {}
for name, mode, wire in LEGS:
    idxs[name] = Int8FlatIndex(arena, None, query_batch=2048, q_tile=2048,
                               wire=wire, rerank_mode=mode)
    idxs[name].search(queries[:2048], qmasks[:2048], K)   # compile
    print(f"[{name}] compiled", flush=True)

walls = {name: [] for name, _, _ in LEGS}
last = {}
for rep in range(REPS):
    for name, _, _ in LEGS:
        t0 = time.perf_counter()
        last[name] = idxs[name].search(queries, qmasks, K)
        walls[name].append(time.perf_counter() - t0)
    print(f"round {rep}: " + "  ".join(
        f"{n} {walls[n][-1]*1000:,.0f}ms" for n, _, _ in LEGS), flush=True)

for name, mode, wire in LEGS:
    w = walls[name]
    best = float(np.min(w))
    med = float(np.median(w))
    rec = compute_recall(last[name][1][sample], truth)
    leg = {"rerank_mode": mode, "wire": wire,
           "recall_at_100": round(float(rec), 4),
           "qps_median": round(NQ / med, 1),
           "qps_best": round(NQ / best, 1),
           "pass_walls_ms": [round(x * 1000, 1) for x in w]}
    print(f"[{name}] recall {rec:.4f}  qps med {NQ/med:,.0f} "
          f"best {NQ/best:,.0f}", flush=True)
    out["legs"][name] = leg

with open("results/cohere_768d_1m_r5.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out["legs"], indent=1))
