"""Row delete / vacuum: arena tombstones, HNSW graph repair, compaction.

The pgvector delete-before-vacuum lifecycle analog (reference
pgvector/src/hnswvacuum.c: deleted TIDs stay indexed but unreturnable
until HnswRepairGraph rewires and pages are recycled):
  phase 1  core.tombstone_rows   — zero role bits, every engine rejects
  phase 2  HNSWIndex.delete_rows — graph repair, nodes unreachable
  phase 3  core.compact_corpus   — rebuild without the rows, bytes shrink
"""

import numpy as np
import pytest

from vectorsearch_rbac_tpu.core import (
    build_device_arena, compact_corpus, tombstone_rows,
)
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator


@pytest.fixture(scope="module")
def world():
    return TreeRBACGenerator(
        num_users=80, num_roles=16, num_docs=120, h=3, b0=2, b1=2, seed=5
    ).generate()


@pytest.fixture(scope="module")
def corpus():
    c, _ = sift_like_corpus(num_vectors=1200, dim=32, blocks_per_doc=10, seed=4)
    return c


def _workload(corpus, world, nq, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 256, (nq, corpus.dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, nq)
    return q, users, world.user_masks[users]


def _oracle_ids(corpus, world, q, mask, k, excluded):
    bits = corpus.vector_role_bits(world)
    adm = (bits & mask).any(axis=1)
    adm[list(excluded)] = False
    dist = ((corpus.vectors.astype(np.float64) - q) ** 2).sum(axis=1)
    dist[~adm] = np.inf
    return [int(i) for i in np.argsort(dist, kind="stable")[:k]
            if np.isfinite(dist[i])]


def test_tombstone_rows_all_engines(corpus, world):
    """Tombstoned rows vanish from the int8 kernel, the flat scan, and the
    IVF scan with no rebuild (zero role bits ride the fused mask)."""
    from vectorsearch_rbac_tpu.index.flat import FlatIndex
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex
    from vectorsearch_rbac_tpu.index.ivf import IVFIndex

    arena = build_device_arena(corpus, world, block_rows=256, dtype="int8")
    rng = np.random.default_rng(11)
    deleted = np.sort(rng.choice(corpus.n, corpus.n // 10, replace=False))
    arena2 = tombstone_rows(arena, deleted)
    dset = set(int(x) for x in deleted)

    q, users, masks = _workload(corpus, world, 16)
    k = 8
    engines = [
        Int8FlatIndex(arena2, None, query_batch=32, q_tile=16,
                      block_rows=256, group=8),
        FlatIndex(arena2, rows=None, block_rows=256, mode="exact",
                  query_batch=32),
        IVFIndex(arena2, None, nlist=8, nprobe=8, query_batch=32, seed=1),
    ]
    for eng in engines:
        d, ids = eng.search(q, masks, k)
        for qi in range(16):
            got = [int(x) for x in ids[qi] if x >= 0]
            assert not (set(got) & dset), type(eng).__name__
    # exact engine matches the oracle over the REMAINING rows exactly
    d, ids = engines[1].search(q, masks, k)
    for qi in range(16):
        want = _oracle_ids(corpus, world, q[qi], masks[qi], k, dset)
        got = [int(x) for x in ids[qi] if x >= 0]
        assert set(got) == set(want)


@pytest.mark.parametrize("logical", [False, True])
def test_hnsw_delete_rows_repair(corpus, world, logical):
    """Delete 10% of an HNSW partition's rows: recall on the remainder is
    preserved by the repair, deleted rows never return."""
    from vectorsearch_rbac_tpu.index.hnsw import HNSWIndex

    arena = build_device_arena(corpus, world, block_rows=256, dtype="int8")
    idx = HNSWIndex(arena, None, m=8, ef_construction=48, seed=3,
                    logical=logical)
    rng = np.random.default_rng(7)
    deleted = np.sort(rng.choice(corpus.n, corpus.n // 10, replace=False))
    arena2 = tombstone_rows(arena, deleted)
    if logical:
        # logical mode serves bits from the shared arena — rebind
        idx._bits = arena2.role_bits
    n_del = idx.delete_rows(arena2, deleted)
    assert n_del == len(deleted)
    dset = set(int(x) for x in deleted)

    q, users, masks = _workload(corpus, world, 20, seed=9)
    k = 6
    d, ids = idx.search(q, masks, k, ef_search=48, iterative=True,
                        sampled_entry=True)
    hits = total = 0
    for qi in range(20):
        got = [int(x) for x in ids[qi] if x >= 0]
        assert not (set(got) & dset)
        want = _oracle_ids(corpus, world, q[qi], masks[qi], k, dset)
        hits += len(set(got) & set(want))
        total += max(len(want), 1)
    assert hits / total >= 0.85, f"post-delete recall {hits/total}"


def test_compact_corpus_shrinks_storage(corpus, world):
    rng = np.random.default_rng(3)
    deleted = np.sort(rng.choice(corpus.n, corpus.n // 5, replace=False))
    new_corpus, remap = compact_corpus(corpus, deleted)
    assert new_corpus.n == corpus.n - len(deleted)
    assert (remap[deleted] == -1).all()
    keep = np.setdiff1d(np.arange(corpus.n), deleted)
    np.testing.assert_array_equal(new_corpus.vectors,
                                  corpus.vectors[keep])
    np.testing.assert_array_equal(remap[keep], np.arange(len(keep)))

    a1 = build_device_arena(corpus, world, block_rows=256, dtype="int8")
    a2 = build_device_arena(new_corpus, world, block_rows=256, dtype="int8")
    assert a2.n_padded <= a1.n_padded and a2.n < a1.n


def test_delete_role_frees_orphaned_rows(corpus, world):
    """delete_role + orphaned-row tombstoning: docs readable only via the
    deleted role stop being served."""
    from vectorsearch_rbac_tpu.index.flat import FlatIndex
    from vectorsearch_rbac_tpu.partition.dynamic.maintenance import (
        orphaned_docs_after_role_delete, orphaned_rows_after_role_delete,
    )

    # find a role with at least one exclusive doc
    role = next((r for r in range(world.num_roles)
                 if orphaned_docs_after_role_delete(world, r)), None)
    if role is None:
        pytest.skip("no role owns an exclusive doc in this world")
    rows = orphaned_rows_after_role_delete(world, corpus.doc_ids, role)
    assert len(rows) > 0

    arena = build_device_arena(corpus, world, block_rows=256, dtype="float32")
    arena2 = tombstone_rows(arena, rows)
    idx = FlatIndex(arena2, rows=None, block_rows=256, mode="exact",
                    query_batch=32)
    # a user holding ONLY that role now gets nothing from orphaned docs
    q = corpus.vectors[rows[0]][None, :].astype(np.float32)
    from vectorsearch_rbac_tpu.rbac import role_mask
    mask = role_mask((role,), world.num_roles)[None, :]
    d, ids = idx.search(q, mask, 5)
    got = set(int(x) for x in ids[0] if x >= 0)
    assert not (got & set(int(r) for r in rows))


def test_refine_does_not_resurrect_deleted(small_world, small_corpus):
    """Regression: refine_rows over a batch containing previously deleted
    rows must not re-link them (delete_rows' unreachability guarantee) and
    double-delete must report 0 the second time."""
    import numpy as np

    from vectorsearch_rbac_tpu.core import build_device_arena
    from vectorsearch_rbac_tpu.index.hnsw import HNSWIndex

    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    half = small_corpus.n // 2
    idx = HNSWIndex(arena, rows=np.arange(half, dtype=np.int64), m=8,
                    ef_search=64, query_batch=16, builder="classic", seed=0)
    new_rows = np.arange(half, small_corpus.n, dtype=np.int64)
    idx.insert_rows(arena, new_rows)

    victims = new_rows[:20]
    assert idx.delete_rows(arena, victims) == 20
    assert idx.delete_rows(arena, victims) == 0  # double delete is a no-op

    idx.refine_rows(arena, new_rows)  # includes the deleted rows
    g = np.asarray(idx._graph)
    rmap = np.asarray(idx._row_map)
    # deleted locals keep empty lists and appear in no live list
    dead_locals = np.nonzero(idx._deleted_local)[0]
    assert len(dead_locals) == 20
    assert (g[dead_locals] < 0).all(), "deleted node re-linked by refine"
    live = np.ones(len(g), dtype=bool)
    live[dead_locals] = False
    assert not np.isin(g[live], dead_locals).any(), (
        "live node links to a deleted node after refine")
    # deleted arena rows are no longer addressable
    assert (rmap[dead_locals] == -1).all()
