import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorsearch_rbac_tpu.ops.kmeans import kmeans_fit, kmeans_init, sharded_kmeans_step
from vectorsearch_rbac_tpu.ops.scan import masked_scan_topk
from vectorsearch_rbac_tpu.parallel import make_mesh, shard_arena_arrays, sharded_masked_topk


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    n, d, w = 1024, 32, 2
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    norms = np.einsum("nd,nd->n", vecs, vecs).astype(np.float32)
    bits = rng.integers(1, 2**31, size=(n, w)).astype(np.uint32)
    q = rng.standard_normal((16, d)).astype(np.float32)
    masks = rng.integers(1, 2**31, size=(16, w)).astype(np.uint32)
    return vecs, norms, bits, q, masks


@pytest.mark.parametrize("n_repl", [1, 2])
def test_sharded_scan_matches_single_chip(problem, n_repl):
    vecs, norms, bits, q, masks = problem
    mesh = make_mesh(8, n_replicas=n_repl)
    dv, dn, db = shard_arena_arrays(mesh, vecs, norms, bits)
    d_sh, i_sh = sharded_masked_topk(
        mesh, jnp.asarray(q), dv, dn, db, jnp.asarray(masks),
        k=8, block_rows=64, mode="exact",
    )
    d_1, i_1 = masked_scan_topk(
        jnp.asarray(q), jnp.asarray(vecs), jnp.asarray(norms),
        jnp.asarray(bits), jnp.asarray(masks), k=8, block_rows=64,
    )
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_1), rtol=1e-4, atol=1e-4)
    # id sets match modulo float near-ties
    mism = sum(len(set(a.tolist()) ^ set(b.tolist()))
               for a, b in zip(np.asarray(i_sh), np.asarray(i_1)))
    assert mism <= 2


def test_sharded_kmeans_matches_single_chip(problem):
    vecs, _, _, _, _ = problem
    mesh = make_mesh(8, n_replicas=1)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vectorsearch_rbac_tpu.parallel.mesh import SHARD_AXIS

    dv = jax.device_put(vecs, NamedSharding(mesh, P(SHARD_AXIS, None)))
    init = jnp.asarray(kmeans_init(vecs, 8, seed=1))
    new_sharded, assign = sharded_kmeans_step(mesh, dv, init)

    # single-chip one Lloyd step
    from vectorsearch_rbac_tpu.ops.kmeans import _update_step
    new_single, _ = _update_step(jnp.asarray(vecs), init)
    np.testing.assert_allclose(np.asarray(new_sharded), np.asarray(new_single),
                               rtol=1e-4, atol=1e-4)


def test_multihost_ingest_single_process_parity(small_world, small_corpus):
    """multihost_quant_arena on a single process must produce the same
    globally-sharded quant arrays as the plain sharded upload — the code
    path multi-host ingestion shares (make_array_from_process_local_data
    degenerates to device_put at process_count()==1)."""
    import jax
    import numpy as np

    from vectorsearch_rbac_tpu.parallel.mesh import make_mesh, SHARD_AXIS
    from vectorsearch_rbac_tpu.parallel.multihost import (
        local_row_range, multihost_quant_arena,
    )
    from vectorsearch_rbac_tpu.parallel.searcher import ShardedGlobalSearcher
    from vectorsearch_rbac_tpu.parallel.sharded import sharded_int8_topk
    import jax.numpy as jnp

    mesh = make_mesh(8, n_replicas=2)
    s, e = local_row_range(small_corpus.n, block_rows=64)
    assert (s, e) == (0, small_corpus.n)   # single process owns everything

    bits = small_corpus.vector_role_bits(small_world)
    vq, nq_d, r8, (scale, center, qclip) = multihost_quant_arena(
        small_corpus.vectors[s:e], bits[s:e], small_world, mesh,
        n_global=small_corpus.n, block_rows=64)
    assert vq.shape[0] % mesh.shape[SHARD_AXIS] == 0

    # serve the flagship kernel over the multihost-assembled arena and
    # check against the single-path ShardedGlobalSearcher
    ref = ShardedGlobalSearcher(small_corpus, small_world, mesh=mesh,
                                block_rows=128, dtype="int8")
    rng = np.random.default_rng(5)
    nq, k = 8, 5
    q = rng.standard_normal((nq, small_corpus.dim)).astype(np.float32)
    users = rng.integers(0, small_world.num_users, nq)
    d_ref, i_ref = ref.search_batch(q, users, small_world.user_masks, k)

    quant = ref._quant
    q8, qn = quant.quantize_queries(q)
    m8 = quant.quantize_masks(small_world.user_masks[users],
                              small_world.num_roles)
    # pad queries to the replica x q_tile grid
    import math
    q_tile = 8
    pad = (-nq) % (2 * q_tile)
    if pad:
        q8 = np.concatenate([q8, np.zeros((pad, q8.shape[1]), np.int8)])
        qn = np.concatenate([qn, np.zeros(pad, np.int32)])
        m8 = np.concatenate([m8, np.zeros((pad, m8.shape[1]), np.int8)])
    d_mh, i_mh = sharded_int8_topk(
        mesh, jnp.asarray(q8), jnp.asarray(qn), vq, nq_d, r8,
        jnp.asarray(m8), jnp.float32(1.0 / scale**2), k,
        q_tile=q_tile, block_rows=128, group=8, interpret=True)
    d_mh, i_mh = np.asarray(d_mh)[:nq], np.asarray(i_mh)[:nq]
    for qi in range(nq):
        got = set(int(x) for x in i_mh[qi] if x >= 0)
        want = set(int(x) for x in i_ref[qi] if x >= 0)
        assert len(got & want) >= max(len(want) - 1, 0)
