"""Host-side emulation: where do truth-100 ids rank in the int8 ordering?

cohere probes showed recall@100 stuck at ~0.984 independent of rerank
pool depth (32..412), group (128..32), and mirror precision (bf16/f32).
So ~1.6 of 100 true neighbors are EXCLUDED from the kernel's candidate
pool. This script emulates the cosine kernel's scoring exactly on host
(int8 corpus codes x int8 query codes, score >> score_shift, per-group
minima, admissibility mask) for a few queries and reports, per truth id:
its int8 rank, whether it loses its group, and the depth needed.

CPU-only (no TPU). Run: PYTHONPATH=/root/repo python scripts/cohere_pool_host_probe.py
"""
import numpy as np

from vectorsearch_rbac_tpu.bench import generate_query_workload
from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import resolve_dataset
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.rbac.world import query_masks_for

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

N, K, NQ_PROBE = 1_000_000, 100, 8
GROUP = 32

corpus, qpool = resolve_dataset("cohere", num_vectors=N, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
workload = generate_query_workload(corpus, world, num_queries=2048,
                                   topk=K, zipf_param=0,
                                   query_pool=qpool, seed=1)
queries = workload.vectors.astype(np.float32)[:NQ_PROBE]
uids = workload.user_ids[:NQ_PROBE]
qmasks = np.asarray(query_masks_for(world.user_masks, uids), np.uint32)

arena = build_device_arena(corpus, world, block_rows=131072,
                           dtype="int8", metric="cosine")
q = arena.quant
x8 = q.host_vectors_q.astype(np.int32)          # (npad, d_pad)
bits = np.zeros((arena.n_padded, world.words), np.uint32)
bits[: corpus.n] = corpus.vector_role_bits(world)
s = q.score_shift
print(f"scale={q.scale:.2f} qclip={q.qclip} score_shift={s} "
      f"lossless={q.lossless}", flush=True)

# normalized f32 corpus for truth
vf = corpus.vectors.astype(np.float32)
vf = vf / np.maximum(np.linalg.norm(vf, axis=1, keepdims=True), 1e-30)

q8, inv, bias = q.quantize_queries_ip(queries, cosine=True)
q8 = q8.astype(np.int32)

for t in range(NQ_PROBE):
    ok = (bits & qmasks[t][None, :]).any(axis=1)
    ok_n = ok[: corpus.n]
    qf = queries[t] / max(np.linalg.norm(queries[t]), 1e-30)
    cos = vf @ qf
    tru = np.argsort(-np.where(ok_n, cos, -np.inf))[:K]

    score = -(x8 @ q8[t])                        # int32, kernel pre-shift
    score >>= s
    score = np.where(ok, score, np.iinfo(np.int32).max)
    # per-group minima with lane tie-break: pack (score << 7 | lane)
    n_pad = len(score)
    lanes = np.arange(n_pad) % GROUP
    packed = (score.astype(np.int64) << 7) | lanes
    gmin = packed.reshape(-1, GROUP).min(axis=1)
    # the winner row of each group
    win = packed.reshape(-1, GROUP).argmin(axis=1)
    winner_row = np.arange(0, n_pad, GROUP) + win
    order = np.argsort(gmin, kind="stable")
    pool_rank = {int(winner_row[g]): r for r, g in enumerate(order)}

    missing132, missing512, grouped_out = [], [], 0
    for tid in tru:
        r = pool_rank.get(int(tid))
        if r is None:
            grouped_out += 1      # lost its group to a closer row
        else:
            if r >= 132:
                missing132.append(r)
            if r >= 512:
                missing512.append(r)
    print(f"q{t}: truth outside pool132 = {len(missing132) + grouped_out} "
          f"(group-lost {grouped_out}, deep {sorted(missing132)[:6]}), "
          f"outside pool512 = {len(missing512) + grouped_out}", flush=True)
