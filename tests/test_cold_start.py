"""Cold-start persistence: arena + tiled-engine snapshots restore a
serving-ready engine without corpus access, re-quantization, or
re-packing, and serve byte-identical results (VERDICT-r3 item 5; the
pgvector analog is the disk-resident index the reference ACORN suite
re-reads per query, acorn_benchmark/src/acorn_search.cpp:144)."""

import numpy as np
import pytest

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig
from vectorsearch_rbac_tpu.utils.persist import (
    load_arena_snapshot, save_arena_snapshot,
)


@pytest.fixture(scope="module")
def world():
    return TreeRBACGenerator(num_users=60, num_roles=12, num_docs=100,
                             h=3, b0=2, b1=2, seed=9).generate()


@pytest.fixture(scope="module")
def corpus():
    c, _ = sift_like_corpus(num_vectors=1000, dim=32, blocks_per_doc=10,
                            seed=9)
    return c


@pytest.fixture(scope="module")
def arena(corpus, world):
    return build_device_arena(corpus, world, block_rows=256, dtype="int8")


def test_arena_snapshot_roundtrip(tmp_path, corpus, world, arena):
    path = str(tmp_path / "arena.npz")
    save_arena_snapshot(arena, path)
    a2 = load_arena_snapshot(path)
    q1, q2 = arena.quant, a2.quant
    np.testing.assert_array_equal(q1.host_vectors_q, q2.host_vectors_q)
    np.testing.assert_array_equal(q1.host_roles8, q2.host_roles8)
    np.testing.assert_array_equal(q1.host_norms_q, q2.host_norms_q)
    np.testing.assert_array_equal(arena.host_bits, a2.host_bits)
    assert q1.scale == q2.scale and q1.qclip == q2.qclip
    assert q1.lossless == q2.lossless
    assert a2.n == arena.n and a2.metric == arena.metric
    # lossless corpora skip the mirror on disk; the dequantized rebuild is
    # exact, so the float mirror must match bit-for-bit after bf16 rounding
    np.testing.assert_array_equal(
        np.asarray(arena.vectors), np.asarray(a2.vectors))


def test_arena_snapshot_serves_identically(tmp_path, corpus, world, arena):
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex

    path = str(tmp_path / "arena2.npz")
    save_arena_snapshot(arena, path)
    a2 = load_arena_snapshot(path)
    rng = np.random.default_rng(3)
    q = rng.integers(0, 256, (16, corpus.dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, 16)
    masks = world.user_masks[users]
    i1 = Int8FlatIndex(arena, None, query_batch=16, q_tile=16,
                       block_rows=256, group=8)
    i2 = Int8FlatIndex(a2, None, query_batch=16, q_tile=16,
                       block_rows=256, group=8)
    d1, r1 = i1.search(q, masks, 5)
    d2, r2 = i2.search(q, masks, 5)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(d1, d2)


def test_tiled_snapshot_roundtrip(tmp_path, corpus, world, arena):
    from vectorsearch_rbac_tpu.partition.strategies import build_role_searcher
    from vectorsearch_rbac_tpu.partition.tiled import TiledSearcher

    cfg = FrameworkConfig(seed=0)
    cfg.index.kind = "flat_approx"
    s1 = build_role_searcher(corpus, world, arena, cfg)
    assert isinstance(s1, TiledSearcher)
    path = str(tmp_path / "tiled.npz")
    s1.save_snapshot(path)

    s2 = TiledSearcher.from_snapshot(arena, s1.router, path)
    assert s2.part_chunks == s1.part_chunks
    assert s2._part_nrows == s1._part_nrows
    assert set(s2._big) == set(s1._big)

    rng = np.random.default_rng(4)
    q = rng.integers(0, 256, (12, corpus.dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, 12)
    d1, r1 = s1.search_batch(q, users, world.user_masks, 5)
    d2, r2 = s2.search_batch(q, users, world.user_masks, 5)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(d1, d2)
    # storage accounting survives the trip
    assert s2.storage_report()["num_partitions"] == \
        s1.storage_report()["num_partitions"]


def test_tiled_light_snapshot_rederives_chunks(tmp_path, corpus, world,
                                               arena):
    """The light (default) snapshot stores only rowC + meta; the packed
    vec/norm/role chunks re-derived on device from the arena quant arrays
    must match the builder's bit-for-bit, and the file must be much
    smaller than the pack_arrays form."""
    import os

    from vectorsearch_rbac_tpu.partition.strategies import build_role_searcher
    from vectorsearch_rbac_tpu.partition.tiled import TiledSearcher

    cfg = FrameworkConfig(seed=0)
    cfg.index.kind = "flat_approx"
    s1 = build_role_searcher(corpus, world, arena, cfg)
    light = str(tmp_path / "light.npz")
    heavy = str(tmp_path / "heavy.npz")
    s1.save_snapshot(light)
    s1.save_snapshot(heavy, pack_arrays=True)
    assert os.path.getsize(light) < os.path.getsize(heavy) / 2

    s2 = TiledSearcher.from_snapshot(arena, s1.router, light)
    np.testing.assert_array_equal(np.asarray(s1._vecC), np.asarray(s2._vecC))
    np.testing.assert_array_equal(np.asarray(s1._normC),
                                  np.asarray(s2._normC))
    np.testing.assert_array_equal(np.asarray(s1._roleC),
                                  np.asarray(s2._roleC))
    s3 = TiledSearcher.from_snapshot(arena, s1.router, heavy)
    np.testing.assert_array_equal(np.asarray(s2._vecC), np.asarray(s3._vecC))
