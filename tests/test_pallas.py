"""Group-min semantics of the fused Pallas scan, interpret mode (CPU).

Regression note: rounds 1-2 carried two prototype bf16+bitset kernels
(ops/legacy/pallas_scan{,2}.py, removed round 4). Their two properties —
(a) per-128-group partial-reduce agreement with an exact oracle and
(b) an all-masked query returns only -1/inf — are preserved here against
the CURRENT int8 kernel, which is what actually serves. On TPU the same
code compiles via Mosaic — validated separately on hardware (PERF.md).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import (
    int8_masked_topk, int8_masked_topk_reference,
)


@pytest.fixture(scope="module")
def prob():
    rng = np.random.default_rng(0)
    n, d, r, q = 8192, 128, 128, 64
    vecs = rng.integers(-100, 100, size=(n, d)).astype(np.int8)
    norms = np.einsum("nd,nd->n", vecs.astype(np.int64),
                      vecs.astype(np.int64)).astype(np.int32)
    roles8 = (rng.random((n, r)) < 0.05).astype(np.int8)
    roles8[:, 0] |= (rng.random(n) < 0.3)  # a popular role
    queries = rng.integers(-100, 100, size=(q, d)).astype(np.int8)
    qnorms = np.einsum("qd,qd->q", queries.astype(np.int64),
                       queries.astype(np.int64)).astype(np.int32)
    masks = (rng.random((q, r)) < 0.1).astype(np.int8)
    masks[:, 0] = 1
    return vecs, norms, roles8, queries, qnorms, masks


def _group_oracle(vecs, norms, roles8, queries, masks, k, group):
    """Exact per-group partial-reduce oracle: the best admissible candidate
    per `group` rows, then exact top-k over groups — the kernel's contract."""
    n = len(vecs)
    out = []
    for q, m in zip(queries, masks):
        s = norms.astype(np.int64) - 2 * (vecs.astype(np.int64) @ q.astype(np.int64))
        s[(roles8 @ m) == 0] = 2**40
        g = s.reshape(n // group, group)
        gmin = g.min(axis=1)
        glane = g.argmin(axis=1)
        order = np.argsort(gmin, kind="stable")[:k]
        ids = order * group + glane[order]
        ids[gmin[order] >= 2**40] = -1
        out.append(ids)
    return np.asarray(out)


@pytest.mark.parametrize("group", [64, 128])
def test_int8_kernel_matches_group_oracle(prob, group):
    vecs, norms, roles8, queries, qnorms, masks = prob
    d_, i_ = int8_masked_topk(
        jnp.asarray(queries), jnp.asarray(qnorms), jnp.asarray(vecs),
        jnp.asarray(norms), jnp.asarray(roles8), jnp.asarray(masks),
        jnp.float32(1.0), 10, q_tile=64, block_rows=2048, group=group,
        merge="exact", interpret=True,
    )
    i_ = np.asarray(i_)
    want = _group_oracle(vecs, norms, roles8, queries, masks, 10, group)
    agree = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10 for a, b in zip(i_, want)
    ])
    assert agree > 0.99, f"agreement {agree}"
    # permissions: every returned row must share a role with its query
    for qi, row in enumerate(i_):
        for rid in row:
            if rid >= 0:
                assert roles8[rid] @ masks[qi] > 0


def test_int8_kernel_zero_mask(prob):
    vecs, norms, roles8, queries, qnorms, masks = prob
    zmask = np.zeros_like(masks[:8])
    d_, i_ = int8_masked_topk(
        jnp.asarray(queries[:8]), jnp.asarray(qnorms[:8]), jnp.asarray(vecs),
        jnp.asarray(norms), jnp.asarray(roles8), jnp.asarray(zmask),
        jnp.float32(1.0), 5, q_tile=8, block_rows=2048, merge="exact",
        interpret=True,
    )
    assert np.all(np.asarray(i_) == -1)
    assert np.all(np.isinf(np.asarray(d_)))


def test_int8_kernel_reference_twin_agrees(prob):
    vecs, norms, roles8, queries, qnorms, masks = prob
    args = (jnp.asarray(queries[:16]), jnp.asarray(qnorms[:16]),
            jnp.asarray(vecs), jnp.asarray(norms), jnp.asarray(roles8),
            jnp.asarray(masks[:16]), jnp.float32(1.0), 10)
    d_k, i_k = int8_masked_topk(*args, q_tile=16, block_rows=2048,
                                group=8, merge="exact", interpret=True)
    d_r, i_r = int8_masked_topk_reference(*args)
    # group=8 at n=8192 leaves 1024 groups for k=10: collisions possible but
    # the top-10 should match the flat oracle here (spread-out int8 data)
    agree = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(np.asarray(i_k), np.asarray(i_r))
    ])
    assert agree > 0.95, f"agreement {agree}"
