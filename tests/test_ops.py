import numpy as np
import pytest

import jax.numpy as jnp

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.ops import masked_scan_topk, merge_topk_host
from vectorsearch_rbac_tpu.rbac.bitset import pack_role_sets


def _numpy_oracle(queries, vectors, bits, qmasks, k):
    out_d = np.full((len(queries), k), np.inf)
    out_i = np.full((len(queries), k), -1, dtype=np.int64)
    for qi, (q, m) in enumerate(zip(queries, qmasks)):
        allowed = (bits & m).any(axis=1)
        d = ((vectors - q) ** 2).sum(axis=1).astype(np.float64)
        d[~allowed] = np.inf
        order = np.argsort(d, kind="stable")[:k]
        for j, o in enumerate(order):
            if np.isinf(d[o]):
                break
            out_d[qi, j] = d[o]
            out_i[qi, j] = o
    return out_d, out_i


@pytest.mark.parametrize("mode", ["exact", "approx"])
def test_masked_scan_matches_oracle(small_world, small_corpus, mode):
    world, corpus = small_world, small_corpus
    arena = build_device_arena(corpus, world, block_rows=128)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((16, corpus.dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, 16)
    masks = world.user_masks[users]

    d, i = masked_scan_topk(
        jnp.asarray(q), arena.vectors, arena.norms, arena.role_bits,
        jnp.asarray(masks), k=10, block_rows=128, mode=mode,
    )
    d, i = np.asarray(d), np.asarray(i)
    od, oi = _numpy_oracle(q, corpus.vectors, np.asarray(arena.role_bits)[:corpus.n], masks, 10)
    if mode == "exact":
        # distances must match the float64 oracle closely; id order may flip
        # only between float32 near-ties, so compare distance arrays and
        # id sets rather than exact positions
        valid = oi >= 0
        # the norm-expansion form loses ~1e-3 relative vs direct (x-q)^2 in
        # float64; only ordering (ids) needs to be near-exact
        np.testing.assert_allclose(d[valid], od[valid], rtol=1e-2, atol=1e-2)
        flips = 0
        for qi in range(len(q)):
            flips += len(set(oi[qi][oi[qi] >= 0]) - set(i[qi][i[qi] >= 0]))
        assert flips <= 2, f"{flips} id mismatches beyond near-tie tolerance"
    else:
        # approx must still never violate permissions and stay high-recall
        bits = np.asarray(arena.role_bits)
        for qi in range(16):
            for rid in i[qi]:
                if rid >= 0:
                    assert (bits[rid] & masks[qi]).any()
        hits = sum(len(set(a[a >= 0]) & set(b[b >= 0])) for a, b in zip(i, oi))
        total = (oi >= 0).sum()
        assert hits / max(total, 1) > 0.9


def test_masked_scan_fewer_than_k(small_corpus, small_world):
    """User with one tiny role: fewer admissible rows than k."""
    world, corpus = small_world, small_corpus
    # find the role with the fewest docs
    role, docs = min(world.role_to_docs.items(), key=lambda kv: len(kv[1]))
    arena = build_device_arena(corpus, world, block_rows=128)
    mask = pack_role_sets([{role}], world.num_roles)
    q = np.zeros((1, corpus.dim), dtype=np.float32)
    n_rows = len(corpus.rows_for_docs(np.fromiter(docs, dtype=np.int64)))
    k = n_rows + 5
    d, i = masked_scan_topk(
        jnp.asarray(q), arena.vectors, arena.norms, arena.role_bits,
        jnp.asarray(mask), k=k, block_rows=128, mode="exact",
    )
    i = np.asarray(i)[0]
    assert (i >= 0).sum() == n_rows
    assert np.all(i[n_rows:] == -1)
    assert np.all(np.isinf(np.asarray(d)[0][n_rows:]))


def test_merge_topk_host_dedupes():
    d1 = np.array([[1.0, 3.0]])
    i1 = np.array([[10, 30]])
    d2 = np.array([[1.0, 2.0]])
    i2 = np.array([[10, 20]])  # 10 duplicated
    md, mi = merge_topk_host([d1, d2], [i1, i2], k=3)
    assert mi[0].tolist() == [10, 20, 30]
    assert md[0].tolist() == [1.0, 2.0, 3.0]


def test_merge_topk_host_pads():
    d1 = np.array([[np.inf]])
    i1 = np.array([[-1]])
    md, mi = merge_topk_host([d1], [i1], k=2)
    assert mi[0].tolist() == [-1, -1]
    assert np.all(np.isinf(md))
