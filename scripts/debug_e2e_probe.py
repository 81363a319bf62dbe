"""Instrument one (comb, partition) probe of the e2e dynamic+HNSW path."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.partition import build_searcher
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.rbac.world import query_masks_for
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig

N_DOCS = 600
TOPK = 10

corpus, qpool = sift_like_corpus(num_vectors=N_DOCS * 100, blocks_per_doc=100,
                                 dim=64, seed=3)
world = TreeRBACGenerator(num_users=500, num_roles=60, num_docs=N_DOCS,
                          h=4, b0=3, b1=3, seed=7).generate()
arena = build_device_arena(corpus, world, block_rows=4096, dtype="float32")

cfg = FrameworkConfig(seed=0)
cfg.index.kind = "hnsw"
cfg.search.ef_search = 40
cfg.search.batch_size = 64
cfg.optimizer.storage_alpha = 1.3
cfg.optimizer.topk = TOPK

searcher = build_searcher("dynamic", corpus, world, arena, cfg, packed=False)
plan = searcher.plan

# find a (user, pid) with low selectivity
rng = np.random.default_rng(1)
probe = None
for uid in range(world.num_users):
    comb = tuple(world.user_to_roles.get(uid, ()))
    for pid in searcher.router(uid):
        kw = searcher.probe_params(uid, pid)
        pdocs = plan.assignment[pid]
        cdocs = set()
        for r in comb:
            cdocs.update(world.role_to_docs.get(r, ()))
        sel = len(cdocs & pdocs) / len(pdocs)
        if 0.03 < sel < 0.12 and len(pdocs) > 50:
            probe = (uid, pid, comb, sel, kw)
            break
    if probe:
        break
uid, pid, comb, sel, kw = probe
print(f"user {uid} comb {comb} pid {pid} sel {sel:.3f} kw {kw}")

part = searcher.partitions[pid]
rows = part.rows
print(f"partition rows {len(rows)}")

nq = 32
queries = qpool[rng.choice(len(qpool), nq, replace=False)].astype(np.float32)
qmasks = query_masks_for(world.user_masks, np.full(nq, uid))

# per-partition admissible oracle
cdocs = set()
for r in comb:
    cdocs.update(world.role_to_docs.get(r, ()))
adm_rows_mask = np.isin(corpus.doc_ids[rows], np.fromiter(cdocs, dtype=np.int64))
vec = corpus.vectors[rows]
d2 = np.einsum("nd,nd->n", vec, vec)[None, :] - 2 * queries @ vec.T
d2[:, ~adm_rows_mask] = np.inf
order = np.argsort(d2, axis=1, kind="stable")[:, :TOPK]
truth = rows[order]  # arena row ids


def recall(ids):
    ids = np.asarray(ids)
    hits = sum(
        len(set(ids[i][ids[i] >= 0].tolist()) & set(truth[i].tolist()))
        for i in range(nq))
    return hits / (nq * TOPK)


d_a, i_a = part.index.search(queries, qmasks, TOPK)
print(f"fixed default:      recall {recall(i_a):.3f}")

d_b, i_b = part.index.search(queries, qmasks, TOPK, **kw)
print(f"probe kwargs (e2e): recall {recall(i_b):.3f}")

kw2 = dict(kw)
kw2["harvest_2hop"] = True
d_c, i_c = part.index.search(queries, qmasks, TOPK, **kw2)
print(f"probe + 2hop:       recall {recall(i_c):.3f}")

# sanity: admissibility of returned ids
bad = 0
for i in range(nq):
    for x in np.asarray(i_b)[i]:
        if x >= 0 and corpus.doc_ids[int(x)] not in cdocs:
            bad += 1
print(f"inadmissible returned: {bad}")

# unfiltered sanity: does the graph navigate at all?
allmask = np.ones((nq, world.words), dtype=np.uint32) * 0xFFFFFFFF
d2u = np.einsum("nd,nd->n", vec, vec)[None, :] - 2 * queries @ vec.T
orderu = np.argsort(d2u, axis=1, kind="stable")[:, :TOPK]
truth_u = rows[orderu]
d_u, i_u = part.index.search(queries, allmask, TOPK, ef_search=128)
ids = np.asarray(i_u)
hits = sum(len(set(ids[i][ids[i] >= 0].tolist()) & set(truth_u[i].tolist()))
           for i in range(nq))
print(f"UNFILTERED recall (graph quality): {hits / (nq * TOPK):.3f}")
print("sample truth rows:", truth_u[0][:5], "graph got:", ids[0][:5])
