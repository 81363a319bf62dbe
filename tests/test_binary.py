"""Binary (bit-packed) index: pgvector bit(d) / binary_quantize analog.

Covers: pack_bits correctness, hamming & jaccard distances vs a numpy
oracle, RBAC mask enforcement inside the bit scan, the rerank tier's
recall on a clustered corpus, and the 32x storage story.
"""

import numpy as np
import pytest

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import synthetic_corpus
from vectorsearch_rbac_tpu.ops.binary_scan import (
    binary_topk_fn, masked_binary_topk, pack_bits,
)
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator


@pytest.fixture(scope="module")
def world():
    return TreeRBACGenerator(
        num_users=80, num_roles=16, num_docs=150, h=3, b0=2, b1=2, seed=5
    ).generate()


@pytest.fixture(scope="module")
def corpus():
    return synthetic_corpus(num_docs=150, blocks_per_doc=8, dim=48, seed=4)


def _unpack(packed: np.ndarray, d: int) -> np.ndarray:
    n, w = packed.shape
    out = np.zeros((n, w * 32), dtype=np.uint8)
    for j in range(w * 32):
        out[:, j] = (packed[:, j // 32] >> np.uint32(j % 32)) & np.uint32(1)
    return out[:, :d]


def test_pack_bits_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((37, 70)).astype(np.float32)
    thr = rng.standard_normal(70).astype(np.float32) * 0.1
    packed = pack_bits(v, thr)
    assert packed.shape == (37, 3)  # ceil(70/32)
    assert (_unpack(packed, 70) == (v > thr[None, :])).all()


def _bit_oracle(bits_a: np.ndarray, bits_b: np.ndarray, metric: str):
    """bits as (n, d) uint8 0/1 rows; returns distance of a vs each b."""
    if metric == "hamming":
        return (bits_a[None, :] != bits_b).sum(axis=1).astype(np.float64)
    inter = (bits_a[None, :] & bits_b).sum(axis=1).astype(np.float64)
    union = (bits_a[None, :] | bits_b).sum(axis=1).astype(np.float64)
    # pgvector bitutils.c: empty intersection -> distance 1
    return np.where(inter > 0, 1.0 - inter / np.maximum(union, 1), 1.0)


@pytest.mark.parametrize("metric", ["hamming", "jaccard"])
def test_binary_scan_matches_oracle(corpus, world, metric):
    import jax.numpy as jnp

    n, d = corpus.n, corpus.dim
    thr = np.median(corpus.vectors, axis=0)
    packed = pack_bits(corpus.vectors, thr)
    bitsu8 = _unpack(packed, d)
    role_bits = corpus.vector_role_bits(world)

    block = 256
    npad = ((n + block - 1) // block) * block
    packed_p = np.zeros((npad, packed.shape[1]), np.uint32)
    packed_p[:n] = packed
    rb = np.zeros((npad, role_bits.shape[1]), np.uint32)
    rb[:n] = role_bits

    rng = np.random.default_rng(1)
    q = rng.standard_normal((9, d)).astype(np.float32)
    qbits = pack_bits(q, thr)
    qbitsu8 = _unpack(qbits, d)
    users = rng.integers(0, world.num_users, 9)
    masks = world.user_masks[users].astype(np.uint32)

    k = 10
    dists, idx = binary_topk_fn(
        jnp.asarray(qbits), jnp.asarray(packed_p), jnp.asarray(rb),
        jnp.asarray(masks), k, block, "exact", metric=metric)
    dists, idx = np.asarray(dists), np.asarray(idx)

    for qi in range(9):
        ref = _bit_oracle(qbitsu8[qi], bitsu8, metric)
        adm = (role_bits & masks[qi]).any(axis=1)
        ref = np.where(adm, ref, np.inf)
        order = np.sort(ref[np.isfinite(ref)])[:k]
        got = dists[qi][np.isfinite(dists[qi])]
        np.testing.assert_allclose(got, order[: len(got)], atol=1e-6)
        # every returned row must be admissible
        for r in idx[qi]:
            if r >= 0:
                assert adm[r]


def test_binary_index_rerank_recall(corpus, world):
    """BQ + exact rerank on a CLUSTERED corpus: recall@10 vs the exact
    oracle must clear 0.9 (pgvector's documented binary-quantize recipe;
    on gaussian-cluster data sign bits preserve neighborhoods well)."""
    from vectorsearch_rbac_tpu.index.binary import BinaryQuantIndex
    from vectorsearch_rbac_tpu.index.flat import FlatIndex

    arena = build_device_arena(corpus, world, block_rows=256, dtype="float32")
    idx = BinaryQuantIndex(arena, None, block_rows=256, rerank=True,
                           rerank_mult=8)
    rng = np.random.default_rng(2)
    # queries near corpus rows (the realistic ANN regime for BQ)
    base = corpus.vectors[rng.integers(0, corpus.n, 24)]
    q = base + 0.05 * rng.standard_normal(base.shape).astype(np.float32)
    users = rng.integers(0, world.num_users, 24)
    masks = world.user_masks[users].astype(np.uint32)

    k = 10
    d, ids = idx.search(q, masks, k)
    oracle = FlatIndex(arena, None, block_rows=256, mode="exact")
    gt_d, gt_ids = oracle.search(q, masks, k)
    hits = tot = 0
    for qi in range(24):
        ref = set(int(r) for r in gt_ids[qi] if r >= 0)
        got = set(int(r) for r in ids[qi] if r >= 0)
        hits += len(ref & got)
        tot += len(ref)
    assert tot and hits / tot >= 0.9
    # rerank returns TRUE metric distances: spot-check against gt dists
    finite = ids[0] >= 0
    np.testing.assert_allclose(d[0][finite][:3], gt_d[0][:3], rtol=1e-4)


def test_binary_index_storage_is_bits_only(corpus, world):
    from vectorsearch_rbac_tpu.index.binary import BinaryQuantIndex

    arena = build_device_arena(corpus, world, block_rows=256, dtype="float32")
    idx = BinaryQuantIndex(arena, None, block_rows=256)
    st = idx.storage_bytes()
    assert st["vectors"] == 0  # no vector duplication: rerank reads the arena
    npad = ((corpus.n + 255) // 256) * 256
    wd = (corpus.dim + 31) // 32
    assert st["index"] >= npad * wd * 4
    # the bit payload itself is 16x smaller than the f32 rows it quantizes
    assert npad * wd * 4 * 16 <= npad * corpus.dim * 4


def test_binary_partition_subset_maps_to_arena_ids(corpus, world):
    from vectorsearch_rbac_tpu.index.binary import BinaryQuantIndex

    arena = build_device_arena(corpus, world, block_rows=256, dtype="float32")
    rows = np.arange(0, corpus.n, 3, dtype=np.int64)  # every 3rd row
    idx = BinaryQuantIndex(arena, rows, block_rows=256, rerank=False)
    rng = np.random.default_rng(3)
    q = rng.standard_normal((5, corpus.dim)).astype(np.float32)
    masks = np.full((5, world.words), 0xFFFFFFFF, np.uint32)
    _, ids = idx.search(q, masks, 8)
    valid = ids[ids >= 0]
    assert len(valid) and (valid % 3 == 0).all()  # only subset rows returned


def test_binary_cosine_query_normalization(corpus, world):
    """Regression: on a cosine arena the thresholds are medians of UNIT
    rows; raw-scale queries must be normalized before sign packing or the
    codes degenerate (near-all-ones) and candidate ranking collapses.
    Scaled queries must return the same results as unit queries."""
    from vectorsearch_rbac_tpu.index.binary import BinaryQuantIndex

    arena = build_device_arena(corpus, world, block_rows=256,
                               metric="cosine")
    idx = BinaryQuantIndex(arena, rows=None, block_rows=256, query_batch=32,
                           rerank=True, rerank_mult=4)
    rng = np.random.default_rng(9)
    base = corpus.vectors[rng.integers(0, corpus.n, 12)]
    q_unit = base / np.linalg.norm(base, axis=1, keepdims=True)
    q_scaled = base * 387.0  # arbitrary large scale
    masks = np.full((12, world.words), 0xFFFFFFFF, dtype=np.uint32)

    d1, i1 = idx.search(q_unit, masks, k=5)
    d2, i2 = idx.search(q_scaled, masks, k=5)
    np.testing.assert_array_equal(i1, i2)

    # and the results are actually good: the nearest cosine row of a
    # corpus point is itself
    hits = sum(1 for qi in range(12) if int(i2[qi, 0]) >= 0)
    assert hits == 12
