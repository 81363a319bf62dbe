"""Stage profile of the int8 serving path at 1M: kernel vs merge vs fetch.

e2e_profile.py shows finalize ~430 ms per 2x8192-query pass while the
roofline (HBM 4 GB + int8 MXU ~21 ms) predicts ~25 ms — find the eater.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import int8_masked_topk
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.rbac.world import query_masks_for

N = 1_000_000
NQ = 8192
K = 100

corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
rng = np.random.default_rng(1)
uids = rng.integers(0, 10_000, size=NQ)
queries = qpool[rng.choice(len(qpool), NQ, replace=True)].astype(np.float32)
qmasks = query_masks_for(world.user_masks, uids)

arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")
q = arena.quant
q8, qn = q.quantize_queries(queries)
m8 = q.quantize_masks(np.asarray(qmasks, np.uint32), None)
inv = jnp.float32(1.0 / q.scale**2)
q8j, qnj, m8j = jnp.asarray(q8), jnp.asarray(qn), jnp.asarray(m8)

def bench(label, fn, reps=3):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:34s} {dt*1000:8.1f} ms   QPS {NQ/dt:9.0f}", flush=True)
    return out

def run(merge, qt, br, g):
    d, i = int8_masked_topk(q8j, qnj, q.vectors_q, q.norms_q, q.roles8,
                            m8j, inv, K, q_tile=qt, block_rows=br,
                            group=g, merge=merge)
    return d

# 1. kernel only (merge="none"), sync via scalar fetch
bench("kernel only (g128, qt512, br8192)",
      lambda: np.asarray(jnp.sum(run("none", 512, 8192, 128))))
# 2. kernel + approx merge, scalar fetch
bench("kernel+approx merge, scalar sync",
      lambda: np.asarray(jnp.sum(run("approx", 512, 8192, 128))))
# 3. kernel + exact top_k merge, scalar fetch
bench("kernel+exact merge, scalar sync",
      lambda: np.asarray(jnp.sum(run("exact", 512, 8192, 128))))
# 4. full: approx merge + fetch (Q,k) d+i
def full():
    d, i = int8_masked_topk(q8j, qnj, q.vectors_q, q.norms_q, q.roles8,
                            m8j, inv, K, q_tile=512, block_rows=8192,
                            group=128, merge="approx")
    return np.asarray(d), np.asarray(i)
bench("full approx + result fetch", full)
# 5. q_tile variants on the kernel
bench("kernel only qt1024",
      lambda: np.asarray(jnp.sum(run("none", 1024, 8192, 128))))
bench("kernel only qt2048",
      lambda: np.asarray(jnp.sum(run("none", 2048, 8192, 128))))
# 6. group=64 (2x output, maybe better final recall/merge trade)
bench("kernel only g64",
      lambda: np.asarray(jnp.sum(run("none", 512, 8192, 64))))
