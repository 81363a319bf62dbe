"""Pallas fused-scan kernels, interpret mode (CPU). On TPU the same code
compiles via Mosaic — validated separately on hardware (PERF.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorsearch_rbac_tpu.ops.legacy.pallas_scan import pallas_masked_topk
from vectorsearch_rbac_tpu.ops.legacy.pallas_scan2 import pallas_masked_topk_v2


@pytest.fixture(scope="module")
def prob():
    rng = np.random.default_rng(0)
    n, d, w, q = 16384, 128, 2, 128
    vecs = rng.standard_normal((n, d), dtype=np.float32)
    norms = np.einsum("nd,nd->n", vecs, vecs).astype(np.float32)
    bits = rng.integers(1, 2**31, size=(n, w)).astype(np.uint32)
    queries = rng.standard_normal((q, d), dtype=np.float32)
    masks = rng.integers(1, 2**31, size=(q, w)).astype(np.uint32)
    return vecs, norms, bits, queries, masks


def _group_oracle(vecs, bits, queries, masks, k):
    """Exact per-128-group partial-reduce oracle: the best candidate per
    128-row group, then exact top-k over groups — what both kernels compute."""
    n = len(vecs)
    out = []
    for q, m in zip(queries, masks):
        d = ((vecs - q) ** 2).sum(axis=1)
        d[~(bits & m).any(axis=1)] = np.inf
        g = d.reshape(n // 128, 128)
        gmin = g.min(axis=1)
        glane = g.argmin(axis=1)
        order = np.argsort(gmin, kind="stable")[:k]
        ids = order * 128 + glane[order]
        ids[~np.isfinite(gmin[order])] = -1
        out.append(ids)
    return np.asarray(out)


@pytest.mark.parametrize("kernel,kw", [
    (pallas_masked_topk, dict(q_tile=128, block_rows=16384)),
    (pallas_masked_topk_v2, dict()),
])
def test_pallas_kernels_match_group_oracle(prob, kernel, kw):
    vecs, norms, bits, queries, masks = prob
    d_, i_ = kernel(
        jnp.asarray(queries), jnp.asarray(vecs), jnp.asarray(norms),
        jnp.asarray(bits), jnp.asarray(masks), 10, interpret=True, **kw,
    )
    i_ = np.asarray(i_)
    want = _group_oracle(vecs, bits, queries, masks, 10)
    agree = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10 for a, b in zip(i_, want)
    ])
    assert agree > 0.99, f"agreement {agree}"
    # permissions
    for qi, row in enumerate(i_):
        for rid in row:
            if rid >= 0:
                assert (bits[rid] & masks[qi]).any()


def test_pallas_zero_mask(prob):
    vecs, norms, bits, queries, masks = prob
    zmask = np.zeros_like(masks[:8])
    d_, i_ = pallas_masked_topk_v2(
        jnp.asarray(queries[:8]), jnp.asarray(vecs), jnp.asarray(norms),
        jnp.asarray(bits), jnp.asarray(zmask), 5, interpret=True,
    )
    assert np.all(np.asarray(i_) == -1)
    assert np.all(np.isinf(np.asarray(d_)))
