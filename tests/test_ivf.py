import numpy as np
import pytest

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.index.ivf import IVFIndex


@pytest.fixture(scope="module")
def ivf_setup(small_world, small_corpus):
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    idx = IVFIndex(arena, rows=None, nlist=16, nprobe=8, kmeans_iters=5,
                   query_batch=16, seed=0)
    return small_world, small_corpus, arena, idx


def test_ivf_build(ivf_setup):
    world, corpus, arena, idx = ivf_setup
    assert idx.n_rows == corpus.n
    # all rows present exactly once in the inverted file
    rows = np.asarray(idx._inv_rows).ravel()
    real = rows[rows >= 0]
    assert len(real) == corpus.n
    assert len(np.unique(real)) == corpus.n


def test_ivf_full_probe_is_exact(ivf_setup):
    """nprobe == nlist scans everything -> must equal brute force."""
    world, corpus, arena, idx = ivf_setup
    rng = np.random.default_rng(2)
    q = rng.standard_normal((8, corpus.dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, 8)
    masks = world.user_masks[users]
    d, ids = idx.search(q, masks, k=10, nprobe=idx.nlist)
    bits = np.asarray(arena.role_bits)[: corpus.n]
    for qi in range(8):
        allowed = (bits & masks[qi]).any(axis=1)
        dd = ((corpus.vectors - q[qi]) ** 2).sum(axis=1)
        dd[~allowed] = np.inf
        want = set(np.argsort(dd, kind="stable")[:10].tolist())
        got = set(int(x) for x in ids[qi] if x >= 0)
        # near-tie flips allowed
        assert len(want - got) <= 1


def test_ivf_partial_probe_recall_and_permissions(ivf_setup):
    world, corpus, arena, idx = ivf_setup
    rng = np.random.default_rng(3)
    # query near existing corpus points for meaningful recall
    pick = rng.integers(0, corpus.n, 12)
    q = corpus.vectors[pick] + 0.01 * rng.standard_normal((12, corpus.dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, 12)
    masks = world.user_masks[users]
    d, ids = idx.search(q, masks, k=5, nprobe=8)
    bits = np.asarray(arena.role_bits)
    hits = total = 0
    for qi in range(12):
        # permissions always enforced
        for rid in ids[qi]:
            if rid >= 0:
                assert (bits[rid] & masks[qi]).any()
        allowed = (bits[: corpus.n] & masks[qi]).any(axis=1)
        dd = ((corpus.vectors - q[qi]) ** 2).sum(axis=1)
        dd[~allowed] = np.inf
        want = set(np.argsort(dd, kind="stable")[:5][np.isfinite(np.sort(dd)[:5])].tolist())
        got = set(int(x) for x in ids[qi] if x >= 0)
        hits += len(want & got)
        total += len(want)
    assert hits / max(total, 1) > 0.6  # half the lists probed


def test_ivf_storage(ivf_setup):
    _, _, _, idx = ivf_setup
    sb = idx.storage_bytes()
    assert sb["vectors"] > 0 and sb["index"] > 0


def test_ivf_insert_rows(small_world, small_corpus):
    """Online insert (pgvector ivfinsert.c analog): held-out rows become
    findable after insert_rows; membership stays exact and unique."""
    world, corpus = small_world, small_corpus
    arena = build_device_arena(corpus, world, block_rows=128)
    n0 = corpus.n - corpus.n // 4
    idx = IVFIndex(arena, rows=np.arange(n0), nlist=12, nprobe=12,
                   kmeans_iters=5, query_batch=16, seed=0)
    new = np.arange(n0, corpus.n)

    # a query AT a held-out vector, asked by a user who can see it
    bits = np.asarray(arena.role_bits)[: corpus.n]
    target = int(new[0])
    users = [u for u in range(world.num_users)
             if (bits[target] & world.user_masks[u]).any()]
    q = corpus.vectors[target][None]
    mask = world.user_masks[users[0]][None]
    _, ids = idx.search(q, mask, k=5, nprobe=idx.nlist)
    assert target not in set(int(x) for x in ids[0])

    idx.insert_rows(arena, new)
    assert idx.n_rows == corpus.n
    rows = np.asarray(idx._inv_rows).ravel()
    real = rows[rows >= 0]
    assert len(real) == corpus.n and len(np.unique(real)) == corpus.n

    _, ids = idx.search(q, mask, k=5, nprobe=idx.nlist)
    assert int(ids[0][0]) == target


def test_ivf_insert_growth_and_delete(small_world, small_corpus):
    """Inserting past every list's padding grows L_pad (page-extend
    analog); delete_rows frees slots that later inserts reuse."""
    world, corpus = small_world, small_corpus
    arena = build_device_arena(corpus, world, block_rows=128)
    n0 = corpus.n // 2
    idx = IVFIndex(arena, rows=np.arange(n0), nlist=8, nprobe=8,
                   kmeans_iters=5, query_batch=16, seed=1,
                   pad_quantile=0.5)  # tight padding -> forces growth
    pad0 = idx.l_pad
    idx.insert_rows(arena, np.arange(n0, corpus.n))
    assert idx.l_pad > pad0
    rows = np.asarray(idx._inv_rows).ravel()
    real = rows[rows >= 0]
    assert len(real) == corpus.n and len(np.unique(real)) == corpus.n

    # delete a slice: gone from full-probe results, slots freed
    dels = np.arange(0, corpus.n, 7)
    ndel = idx.delete_rows(arena, dels)
    assert ndel == len(dels)
    assert idx.n_rows == corpus.n - ndel
    rng = np.random.default_rng(5)
    q = corpus.vectors[dels[:4]] + 0.0
    masks = np.full((4, world.user_masks.shape[1]), 0xFFFFFFFF,
                    dtype=np.uint32)
    _, ids = idx.search(q, masks, k=10, nprobe=idx.nlist)
    got = set(int(x) for x in ids.ravel() if x >= 0)
    assert not (got & set(int(x) for x in dels))

    # reinsert into freed slots: no growth needed
    pad1 = idx.l_pad
    idx.insert_rows(arena, dels)
    assert idx.l_pad == pad1
    rows = np.asarray(idx._inv_rows).ravel()
    real = rows[rows >= 0]
    assert len(real) == corpus.n and len(np.unique(real)) == corpus.n


def test_ivf_iterative_scan(ivf_setup):
    """ivfflat.iterative_scan analog (reference pgvector/src/ivfscan.c:257,
    ivfflat.c ivfflat.max_probes): a low-selectivity query that fills fewer
    than k admissible slots at the base nprobe re-probes with a doubled
    budget until satisfied or max_probes; at max_probes == nlist it must
    recover ALL admissible rows (exact within the inverted file)."""
    world, corpus, arena, idx = ivf_setup
    rng = np.random.default_rng(7)
    q = rng.standard_normal((8, corpus.dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, 8)
    masks = world.user_masks[users]
    k = 10

    d0, i0 = idx.search(q, masks, k=k, nprobe=1)
    d1, i1 = idx.search(q, masks, k=k, nprobe=1, iterative=True)
    d2, i2 = idx.search(q, masks, k=k, nprobe=idx.nlist)

    n0 = (i0 >= 0).sum()
    n1 = (i1 >= 0).sum()
    assert n1 >= n0  # iterative never returns fewer results
    # every query that CAN fill k does so after iteration
    np.testing.assert_array_equal((i1 >= 0).sum(axis=1),
                                  (i2 >= 0).sum(axis=1))
    # results remain admissible
    bits = np.asarray(arena.role_bits)
    for qi in range(8):
        for rid in i1[qi]:
            if rid >= 0:
                assert (bits[rid] & masks[qi]).any()
    # a max_probes cap below nlist bounds the expansion
    _, icap = idx.search(q, masks, k=k, nprobe=1, iterative=True,
                         max_probes=2)
    assert (icap >= 0).sum() <= n1
