"""Per-query termination-step distribution of the hybrid graph dispatch.

The slab dispatch's while_loop exits when ALL queries are done; a
difficulty-split (two dispatches: early finishers together) only pays if
a big fraction of queries individually terminate well before the step
bound. This instruments the shipping iterative loop (same state, same
termination rule) with a done-at-step carry, on the persisted
hybrid_lab serving state (real 1M graphs + real routed queries).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/graph_term_probe.py
"""
import pickle
import time

import numpy as np

from vectorsearch_rbac_tpu.bench import generate_query_workload
from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.partition import build_searcher
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.rbac.world import query_masks_for
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
qmasks = np.asarray(query_masks_for(world.user_masks, user_ids), np.uint32)

arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")
with open(f"{STATE}/plan.pkl", "rb") as f:
    plan = pickle.load(f)
z = np.load(f"{STATE}/graphs.npz")
pids_avail = sorted({int(k.split("_")[0]) for k in z.files})
graph_states = {pid: {"neighbors": z[f"{pid}_neighbors"],
                      "entry": z[f"{pid}_entry"]} for pid in pids_avail}

cfg = FrameworkConfig(seed=0)
cfg.search.ef_search = 40
cfg.search.batch_size = 1024
cfg.optimizer.storage_alpha = 2.0
cfg.optimizer.topk = TOPK
cfg.index.kind = "hybrid"
searcher = build_searcher("dynamic", corpus, world, arena, cfg, plan=plan,
                          packed=False, graph_states=graph_states)
batcher = searcher.graph_batcher

# reconstruct the batcher's job stream exactly as PartitionedSearcher does
import jax
import jax.numpy as jnp

jobs = []
for qi in range(NQ):
    pids = searcher.router(int(user_ids[qi]))
    for pid in pids:
        if pid in batcher.pids:
            kw = searcher.probe_params(int(user_ids[qi]), pid)
            jobs.append((pid, [qi], kw))
# group like the batcher: one slab class, collect (query, slot, entry, ms)
shape = next(iter(batcher.slabs))
g3, rm2 = batcher.slabs[shape]
qis, pvec, evec, bvec = [], [], [], []
efs = set()
for pid, qsub, kw in jobs:
    qis.extend(qsub)
    pvec.append(batcher.slot_of[pid])
    evec.append(int(kw.get("entry_local", batcher.entry_of[pid])))
    bvec.append(int(kw.get("max_steps", 256)))
    efs.add(int(kw.get("ef_search", 64)))
print(f"{len(qis)} probe rows, ef set {sorted(efs)}, "
      f"ms buckets {sorted(set(bvec))[:6]}", flush=True)

Q = 1 << (len(qis) - 1).bit_length()
qb = np.zeros((Q, queries.shape[1]), np.float32)
mb = np.zeros((Q, qmasks.shape[1]), np.uint32)
pb = np.zeros(Q, np.int32)
eb = np.zeros(Q, np.int32)
bb = np.zeros(Q, np.int32)
qb[: len(qis)] = queries[qis]
mb[: len(qis)] = qmasks[qis]
pb[: len(qis)] = pvec
eb[: len(qis)] = evec
bb[: len(qis)] = bvec

ef = max(max(efs), TOPK + 9)
kk = TOPK + 8
ms_bound = 64

# instrumented copy of the shipping loop: records each query's done step
from vectorsearch_rbac_tpu.ops import graph_search as gs


def instrumented(q, vecs, norms, bits, graph, masks, entries, pids,
                 budgets):
    qf = q.astype(jnp.float32)
    nq = qf.shape[0]
    qc = qf.astype(vecs.dtype)
    rows = jnp.arange(nq)

    def _rows(ids):
        return rm2[pids[:, None], jnp.maximum(ids, 0)]

    def dist_to(ids):
        safe = _rows(ids)
        x = jnp.take(vecs, safe, axis=0)
        nrm = jnp.take(norms, safe, axis=0)
        dots = jnp.einsum("qd,qcd->qc", qc, x,
                          preferred_element_type=jnp.float32)
        return jnp.where(ids >= 0, nrm - 2.0 * dots, jnp.inf)

    def allowed(ids):
        b = jnp.take(bits, _rows(ids), axis=0)
        ok = jnp.any(jnp.bitwise_and(masks[:, None, :], b) != 0, axis=-1)
        return jnp.logical_and(ok, ids >= 0)

    entry_ids = entries.astype(jnp.int32).reshape(nq, 1)
    entry_d = dist_to(entry_ids)
    beam_ids = jnp.concatenate(
        [entry_ids, jnp.full((nq, ef - 1), -1, jnp.int32)], axis=1)
    beam_d = jnp.concatenate([entry_d, jnp.full((nq, ef - 1), jnp.inf)], 1)
    res_d = jnp.full((nq, kk), jnp.inf)
    res_ids = jnp.full((nq, kk), -1, jnp.int32)
    e_ok = allowed(entry_ids)
    res_d = res_d.at[:, 0].set(jnp.where(e_ok[:, 0], entry_d[:, 0], jnp.inf))
    w_d = jnp.concatenate([entry_d, jnp.full((nq, ef - 1), jnp.inf)], 1)
    history = jnp.full((nq, ms_bound), -1, jnp.int32)
    done_at = jnp.full((nq,), -1, jnp.int32)

    def _done(t, beam_d, res_d, w_d):
        fmin = jnp.min(beam_d, axis=1)
        res_full = jnp.isfinite(res_d[:, -1])
        done = ~jnp.isfinite(fmin) | ((fmin >= w_d[:, -1]) & res_full)
        return done | (t >= budgets)

    def body(t, st):
        beam_ids, beam_d, res_ids, res_d, w_d, history, done_at = st
        dn = _done(t, beam_d, res_d, w_d)
        done_at = jnp.where((done_at < 0) & dn, t, done_at)
        sel = jnp.argmin(beam_d, axis=1)
        active = jnp.isfinite(beam_d[rows, sel]) & ~dn
        node = jnp.where(active, beam_ids[rows, sel], -1)
        beam_d = beam_d.at[rows, sel].set(jnp.inf)
        beam_ids = beam_ids.at[rows, sel].set(-1)
        history = history.at[:, t].set(node)
        nb = graph[pids, jnp.maximum(node, 0)]
        nb = jnp.where((node >= 0)[:, None], nb, -1)
        seen = (jnp.any(nb[:, :, None] == beam_ids[:, None, :], axis=-1)
                | jnp.any(nb[:, :, None] == history[:, None, :], axis=-1))
        nb = jnp.where(seen, -1, nb)
        nd = dist_to(nb)
        all_d = jnp.concatenate([beam_d, nd], axis=1)
        all_i = jnp.concatenate([beam_ids, nb], axis=1)
        neg, pos = jax.lax.top_k(-all_d, ef)
        beam_d = -neg
        beam_ids = jnp.take_along_axis(all_i, pos, axis=1)
        neg_w, _ = jax.lax.top_k(-jnp.concatenate([w_d, nd], axis=1), ef)
        w_d = -neg_w
        rd = jnp.where(allowed(nb), nd, jnp.inf)
        r_d = jnp.concatenate([res_d, rd], axis=1)
        r_i = jnp.concatenate([res_ids, nb], axis=1)
        neg2, pos2 = jax.lax.top_k(-r_d, kk)
        res_d = -neg2
        res_ids = jnp.take_along_axis(r_i, pos2, axis=1)
        return beam_ids, beam_d, res_ids, res_d, w_d, history, done_at

    st = (beam_ids, beam_d, res_ids, res_d, w_d, history, done_at)
    st = jax.lax.fori_loop(0, ms_bound, body, st)
    return st[6]


fn = jax.jit(instrumented)
t0 = time.perf_counter()
done_at = np.asarray(fn(jnp.asarray(qb), arena.vectors, arena.norms,
                        arena.role_bits, g3, jnp.asarray(mb),
                        jnp.asarray(eb), jnp.asarray(pb), jnp.asarray(bb)))
print(f"instrumented pass {time.perf_counter()-t0:.1f}s", flush=True)
da = done_at[: len(qis)]
da = np.where(da < 0, ms_bound, da)   # never-done = ran the full bound
print(f"done-step percentiles over {len(da)} probe rows: "
      f"p10={np.percentile(da,10):.0f} p25={np.percentile(da,25):.0f} "
      f"p50={np.percentile(da,50):.0f} p75={np.percentile(da,75):.0f} "
      f"p90={np.percentile(da,90):.0f} p99={np.percentile(da,99):.0f} "
      f"max={da.max()}", flush=True)
print(f"fraction done by step 16/24/32/48: "
      f"{(da<=16).mean():.2f}/{(da<=24).mean():.2f}/"
      f"{(da<=32).mean():.2f}/{(da<=48).mean():.2f}", flush=True)
