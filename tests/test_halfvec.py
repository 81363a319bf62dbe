"""Half-precision arena: the pgvector `halfvec` analog.

bf16 is the TPU's native half type (f16 overflows on SIFT-family squared
magnitudes — see ops/pallas_scan_int8.py wire notes), so `halfvec(d)`
columns map to dtype="bfloat16" arenas (reference pgvector/src/halfvec.c
type + halfutils.c SIMD distance dispatch).
"""

import numpy as np
import pytest

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import synthetic_corpus
from vectorsearch_rbac_tpu.index.flat import FlatIndex
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator


@pytest.fixture(scope="module")
def world():
    return TreeRBACGenerator(
        num_users=80, num_roles=16, num_docs=150, h=3, b0=2, b1=2, seed=5
    ).generate()


@pytest.fixture(scope="module")
def corpus():
    return synthetic_corpus(num_docs=150, blocks_per_doc=8, dim=48, seed=4)


def test_bf16_arena_recall_and_storage(corpus, world):
    arena16 = build_device_arena(corpus, world, block_rows=256,
                                 dtype="bfloat16")
    arena32 = build_device_arena(corpus, world, block_rows=256,
                                 dtype="float32")
    assert arena16.vectors.dtype == np.dtype("bfloat16") or \
        str(arena16.vectors.dtype) == "bfloat16"
    # half the vector payload of f32 (the halfvec storage win)
    assert arena16.vectors.nbytes * 2 == arena32.vectors.nbytes

    idx16 = FlatIndex(arena16, None, block_rows=256, mode="approx",
                      query_batch=32)
    idx32 = FlatIndex(arena32, None, block_rows=256, mode="exact",
                      query_batch=32)
    rng = np.random.default_rng(0)
    base = corpus.vectors[rng.integers(0, corpus.n, 20)]
    q = base + 0.05 * rng.standard_normal(base.shape).astype(np.float32)
    users = rng.integers(0, world.num_users, 20)
    masks = world.user_masks[users].astype(np.uint32)
    k = 8
    _, ids16 = idx16.search(q, masks, k)
    _, ids32 = idx32.search(q, masks, k)
    hits = tot = 0
    for qi in range(20):
        ref = set(int(r) for r in ids32[qi] if r >= 0)
        got = set(int(r) for r in ids16[qi] if r >= 0)
        hits += len(ref & got)
        tot += len(ref)
    assert tot and hits / tot >= 0.9  # bf16 rounding costs at most the tail
