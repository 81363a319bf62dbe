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
