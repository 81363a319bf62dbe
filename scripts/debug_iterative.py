"""Single-partition iterative-rescan debug: does the iterative filtered
graph search reach the true nearest admissible rows at low selectivity?"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.ops.graph_search import (
    graph_search_fn, graph_search_iterative_fn,
)
from vectorsearch_rbac_tpu import native

N = 8192  # one partition's worth
SEL = 0.06
K = 10
NQ = 64

corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=1, dim=64, seed=5)
vec = corpus.vectors.astype(np.float32)
rng = np.random.default_rng(9)

# admissible set: uniform random SEL fraction (the hard case from
# results/anonysys_hnsw_1m.json)
adm = rng.random(N) < SEL
bits = np.zeros((N, 1), dtype=np.uint32)
bits[adm, 0] = 1
print(f"{adm.sum()} admissible of {N}")

# build graph (classic native builder)
assert native.available()
nbr, levels, entry, _ = native.hnsw_build(vec, m=16, ef_construction=64, seed=0)
print(f"graph M0={nbr.shape[1]}, avg deg {(nbr >= 0).sum(1).mean():.1f}")

queries = qpool[rng.choice(len(qpool), NQ, replace=False)].astype(np.float32)
masks = np.ones((NQ, 1), dtype=np.uint32)

norms = np.einsum("nd,nd->n", vec, vec).astype(np.float32)
# exact admissible oracle
d2 = norms[None, :] - 2 * queries @ vec.T
d2[:, ~adm] = np.inf
truth = np.argsort(d2, axis=1, kind="stable")[:, :K]

gv = jnp.asarray(vec)
gn = jnp.asarray(norms)
gb = jnp.asarray(bits)
gg = jnp.asarray(nbr)
gq = jnp.asarray(queries)
gm = jnp.asarray(masks)

# admissible medoid entry
adm_idx = np.nonzero(adm)[0]
sub = vec[adm_idx]
entry_adm = int(adm_idx[np.argmin(((sub - sub.mean(0)) ** 2).sum(1))])
ents = jnp.full((NQ,), entry_adm, dtype=jnp.int32)
ents_global = jnp.full((NQ,), int(entry), dtype=jnp.int32)


def recall(ids):
    ids = np.asarray(ids)
    hits = sum(len(set(ids[i][ids[i] >= 0].tolist()) & set(truth[i].tolist()))
               for i in range(NQ))
    return hits / (NQ * K)


for label, fn in [
    ("fixed ef=40", lambda: graph_search_fn(gq, gv, gn, gb, gg, gm,
                                            int(entry), K, 40)),
    ("fixed ef=160", lambda: graph_search_fn(gq, gv, gn, gb, gg, gm,
                                             int(entry), K, 160)),
    ("iter ef=32 ms=256", lambda: graph_search_iterative_fn(
        gq, gv, gn, gb, gg, gm, ents_global, K, 32, 256, False)),
    ("iter ef=32 ms=1024", lambda: graph_search_iterative_fn(
        gq, gv, gn, gb, gg, gm, ents_global, K, 32, 1024, False)),
    ("iter ef=128 ms=1024", lambda: graph_search_iterative_fn(
        gq, gv, gn, gb, gg, gm, ents_global, K, 128, 1024, False)),
    ("iter ef=128 ms=4096", lambda: graph_search_iterative_fn(
        gq, gv, gn, gb, gg, gm, ents_global, K, 128, 4096, False)),
    ("iter+2hop ef=32 ms=256", lambda: graph_search_iterative_fn(
        gq, gv, gn, gb, gg, gm, ents_global, K, 32, 256, True)),
    ("iter+2hop ef=128 ms=1024", lambda: graph_search_iterative_fn(
        gq, gv, gn, gb, gg, gm, ents_global, K, 128, 1024, True)),
    ("iter+2hop admentry ef=128 ms=1024", lambda: graph_search_iterative_fn(
        gq, gv, gn, gb, gg, gm, ents, K, 128, 1024, True)),
]:
    d, i = fn()
    found = int((np.asarray(i) >= 0).sum(1).mean())
    print(f"{label:36s} recall@10 {recall(i):.3f}  avg found {found}")
