"""int8 quantized serving path: quantization, the fused int8 kernel
(interpret mode), and the tiled partitioned searcher.

Uses an integer-valued corpus (SIFT-shaped, values in [0, 255]) so
quantization is LOSSLESS and assertions can be exact against the float
oracle.
"""

import numpy as np
import pytest

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig


@pytest.fixture(scope="module")
def int_world():
    return TreeRBACGenerator(
        num_users=80, num_roles=16, num_docs=120, h=3, b0=2, b1=2, seed=5
    ).generate()


@pytest.fixture(scope="module")
def int_corpus():
    corpus, _ = sift_like_corpus(num_vectors=1200, dim=32, blocks_per_doc=10,
                                 seed=4)
    return corpus


@pytest.fixture(scope="module")
def int_arena(int_corpus, int_world):
    return build_device_arena(int_corpus, int_world, block_rows=256,
                              dtype="int8")


def _oracle(corpus, world, q, mask, k):
    bits = corpus.vector_role_bits(world)
    adm = (bits & mask).any(axis=1)
    dist = ((corpus.vectors.astype(np.float64) - q.astype(np.float64)) ** 2).sum(axis=1)
    dist[~adm] = np.inf
    order = np.argsort(dist, kind="stable")[:k]
    return [int(i) for i in order if np.isfinite(dist[i])]


def test_quantization_lossless_for_int_corpora(int_arena):
    q = int_arena.quant
    assert q is not None and q.lossless and q.scale == 1.0
    # reconstruct: x = x_q / scale + center
    rec = (q.host_vectors_q[: int_arena.n, : int_arena.dim].astype(np.float32)
           / q.scale + q.center[None, :])
    np.testing.assert_array_equal(rec, np.asarray(int_arena.host_vectors[: int_arena.n]))


def test_quantize_queries_roundtrip(int_arena):
    q = int_arena.quant
    rng = np.random.default_rng(0)
    qf = rng.integers(0, 256, (8, int_arena.dim)).astype(np.float32)
    qq, qn = q.quantize_queries(qf)
    assert qq.dtype == np.int8 and qn.dtype == np.int32
    np.testing.assert_array_equal(
        qq[:, : int_arena.dim].astype(np.float32) / q.scale + q.center, qf)


def test_int8_kernel_interpret_exact(int_corpus, int_world, int_arena):
    """Interpret-mode kernel vs float oracle — exact for lossless corpora,
    modulo group-min collisions (mitigated with tiny group)."""
    import jax.numpy as jnp

    from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import int8_masked_topk

    quant = int_arena.quant
    rng = np.random.default_rng(3)
    nq, k = 16, 5
    qf = rng.integers(0, 256, (nq, int_corpus.dim)).astype(np.float32)
    users = rng.integers(0, int_world.num_users, nq)
    masks = int_world.user_masks[users]
    qq, qn = quant.quantize_queries(qf)
    m8 = quant.quantize_masks(masks, int_world.num_roles)
    d, i = int8_masked_topk(
        jnp.asarray(qq), jnp.asarray(qn), quant.vectors_q, quant.norms_q,
        quant.roles8, jnp.asarray(m8), jnp.float32(1.0 / quant.scale**2),
        k, q_tile=16, block_rows=256, group=8, interpret=True,
    )
    d, i = np.asarray(d), np.asarray(i)
    bits = int_corpus.vector_role_bits(int_world)
    hits = total = 0
    for qi in range(nq):
        want = _oracle(int_corpus, int_world, qf[qi], masks[qi], k)
        got = [int(x) for x in i[qi] if x >= 0]
        for r in got:  # security: every returned row admissible
            assert (bits[r] & masks[qi]).any()
        hits += len(set(got) & set(want))
        total += max(len(want), 1)
        # top-1 is never lost by group-min
        if want:
            assert got and got[0] == want[0]
    assert hits / total >= 0.9, f"recall {hits/total}"
    # distances are true squared L2 (lossless quantization)
    for qi in range(nq):
        for j, r in enumerate(i[qi]):
            if r >= 0:
                true = ((int_corpus.vectors[r] - qf[qi]) ** 2).sum()
                assert abs(d[qi, j] - true) < 1e-3


def test_wide_d_adversarial_no_overflow(int_world):
    """d=768 adversarial corpus: with the full [-128,127] span the packed
    (score << 7 | lane) epilogue would overflow int32 (worst case
    3*768*127^2 = 3.7e7 >> 2^23) and far rows would win the min-reduce.
    The kernels apply the static score_shift (core.score_shift_for) so the
    bound holds at FULL int8 resolution, and the shifted kernel
    (interpret) must agree with the unpacked reference twin."""
    import jax.numpy as jnp

    from vectorsearch_rbac_tpu.core import Corpus, build_device_arena
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex
    from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import (
        int8_masked_topk, int8_masked_topk_reference,
    )

    rng = np.random.default_rng(17)
    n, d = 512, 768
    # bimodal extremes maximize |x - q| on every component
    vecs = rng.choice(np.array([-1000.0, 1000.0], np.float32), (n, d))
    vecs += rng.standard_normal((n, d)).astype(np.float32)
    docs = np.repeat(np.arange(n // 4), 4)
    corpus = Corpus(vectors=vecs, doc_ids=docs, block_ids=np.arange(n) % 4)
    world = TreeRBACGenerator(num_users=40, num_roles=16,
                              num_docs=corpus.num_docs, h=3, b0=2, b1=2,
                              seed=5).generate()
    arena = build_device_arena(corpus, world, block_rows=256, dtype="int8")
    q = arena.quant
    assert q.qclip == 127 and q.score_shift > 0   # full resolution + shift
    assert (3 * q.d_pad * q.qclip**2) >> q.score_shift < 2**23
    assert not q.lossless  # lossy quantization -> rerank auto-on

    nq, k = 8, 5
    qf = rng.choice(np.array([-1000.0, 1000.0], np.float32), (nq, d))
    users = rng.integers(0, world.num_users, nq)
    masks = world.user_masks[users]
    qq, qn = q.quantize_queries(qf)
    m8 = q.quantize_masks(masks, world.num_roles)
    inv = jnp.float32(1.0 / q.scale**2)
    dk, ik = int8_masked_topk(
        jnp.asarray(qq), jnp.asarray(qn), q.vectors_q, q.norms_q, q.roles8,
        jnp.asarray(m8), inv, k, q_tile=8, block_rows=256, group=8,
        interpret=True, score_shift=q.score_shift)
    dr, ir = int8_masked_topk_reference(
        jnp.asarray(qq), jnp.asarray(qn), q.vectors_q, q.norms_q, q.roles8,
        jnp.asarray(m8), inv, k)
    # the packed kernel must produce the same quantized-domain candidate
    # sets as the unpacked twin (group-min can only drop same-group ties)
    for qi in range(nq):
        got = set(int(x) for x in np.asarray(ik)[qi] if x >= 0)
        want = set(int(x) for x in np.asarray(ir)[qi] if x >= 0)
        assert got and np.asarray(ik)[qi][0] == np.asarray(ir)[qi][0]
        assert len(got & want) >= len(want) - 1

    # the full engine path (with f32 rerank) restores true-distance order
    idx = Int8FlatIndex(arena, None, query_batch=8, q_tile=8,
                        block_rows=256, group=8)
    assert idx.rerank
    de, ie = idx.search(qf, masks, k)
    bits = corpus.vector_role_bits(world)
    for qi in range(nq):
        want = _oracle(corpus, world, qf[qi], masks[qi], k)
        got = [int(x) for x in ie[qi] if x >= 0]
        for r in got:
            assert (bits[r] & masks[qi]).any()
        if want:
            assert got[0] == want[0]


def test_wide_kernel_matches_narrow(int_world):
    """int8_masked_topk_wide (d-split grid + VMEM-scratch accumulation)
    must agree with the narrow kernel bit-for-bit: same quantized scores,
    same packed group-min epilogue, different tiling only."""
    import jax.numpy as jnp

    from vectorsearch_rbac_tpu.core import Corpus, build_device_arena
    from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import (
        int8_masked_topk, int8_masked_topk_wide,
    )

    rng = np.random.default_rng(23)
    n, d = 512, 384   # d_pad 384: the d_chunk fallback path (384 % 256 != 0)
    vecs = rng.integers(0, 200, (n, d)).astype(np.float32)
    corpus = Corpus(vectors=vecs, doc_ids=np.repeat(np.arange(n // 4), 4),
                    block_ids=np.arange(n) % 4)
    world = TreeRBACGenerator(num_users=40, num_roles=16,
                              num_docs=corpus.num_docs, h=3, b0=2, b1=2,
                              seed=5).generate()
    arena = build_device_arena(corpus, world, block_rows=256, dtype="int8")
    q = arena.quant
    nq, k = 16, 6
    qf = rng.integers(0, 200, (nq, d)).astype(np.float32)
    users = rng.integers(0, world.num_users, nq)
    qq, qn = q.quantize_queries(qf)
    m8 = q.quantize_masks(world.user_masks[users], world.num_roles)
    inv = jnp.float32(1.0 / q.scale**2)
    args = (jnp.asarray(qq), jnp.asarray(qn), q.vectors_q, q.norms_q,
            q.roles8, jnp.asarray(m8), inv, k)
    dn, i_n = int8_masked_topk(*args, q_tile=16, block_rows=256, group=8,
                               merge="exact", interpret=True)
    dw, i_w = int8_masked_topk_wide(*args, q_tile=16, block_rows=256,
                                    group=8, merge="exact", interpret=True)
    np.testing.assert_array_equal(np.asarray(i_n), np.asarray(i_w))
    np.testing.assert_allclose(np.asarray(dn), np.asarray(dw), rtol=1e-6)


def test_tiled_searcher_role_exact(int_corpus, int_world, int_arena):
    """TiledSearcher on ROLE partitions matches the float oracle exactly
    (per-chunk exact top-k, lossless quantization, no group-min)."""
    from vectorsearch_rbac_tpu.partition import build_searcher

    cfg = FrameworkConfig()
    cfg.index.kind = "flat_approx"
    cfg.search.scan_group = 0   # exact epilogue for the oracle comparison
    s = build_searcher("role", int_corpus, int_world, int_arena, cfg)
    from vectorsearch_rbac_tpu.partition.tiled import TiledSearcher
    assert isinstance(s, TiledSearcher)

    rng = np.random.default_rng(9)
    nq, k = 24, 10
    qf = rng.integers(0, 256, (nq, int_corpus.dim)).astype(np.float32)
    users = rng.integers(0, int_world.num_users, nq)
    d, ids = s.search_batch(qf, users, int_world.user_masks, k)
    for qi in range(nq):
        want = _oracle(int_corpus, int_world, qf[qi],
                       int_world.user_masks[users[qi]], k)
        got = [int(x) for x in ids[qi] if x >= 0]
        assert set(got) == set(want), f"q{qi}: {sorted(got)} != {sorted(want)}"


def test_tiled_searcher_dynamic(int_corpus, int_world, int_arena):
    """Dynamic (AnonySys) strategy on the tiled engine: full recall vs
    oracle (partitions cover each comb; fused mask rejects foreign rows)."""
    from vectorsearch_rbac_tpu.partition import build_searcher

    cfg = FrameworkConfig()
    cfg.index.kind = "flat_approx"
    cfg.optimizer.storage_alpha = 1.5
    cfg.search.scan_group = 0   # exact epilogue for the oracle comparison
    s = build_searcher("dynamic", int_corpus, int_world, int_arena, cfg)

    rng = np.random.default_rng(11)
    nq, k = 16, 8
    qf = rng.integers(0, 256, (nq, int_corpus.dim)).astype(np.float32)
    users = rng.integers(0, int_world.num_users, nq)
    d, ids = s.search_batch(qf, users, int_world.user_masks, k)
    for qi in range(nq):
        want = _oracle(int_corpus, int_world, qf[qi],
                       int_world.user_masks[users[qi]], k)
        got = [int(x) for x in ids[qi] if x >= 0]
        assert set(got) == set(want), f"q{qi}"


def test_tiled_zero_role_user(int_corpus, int_world, int_arena):
    from vectorsearch_rbac_tpu.partition import build_searcher

    cfg = FrameworkConfig()
    cfg.index.kind = "flat_approx"
    s = build_searcher("user", int_corpus, int_world, int_arena, cfg)
    # craft a mask table with user 0 having no roles
    masks = int_world.user_masks.copy()
    masks[0] = 0
    qf = np.zeros((1, int_corpus.dim), dtype=np.float32)
    d, ids = s.search_batch(qf, np.array([0]), masks, 5)
    # user 0's comb router may still route by roles; rows must be masked out
    # if the router yields nothing, everything is -1 anyway
    assert ((ids[0] == -1) | (d[0] < np.inf)).all()


def test_wire_format_roundtrip():
    """pack_results_device / unpack_results_host: bf16 dist + split-id wire
    format survives the trip, including -1 / +inf empty slots."""
    import jax.numpy as jnp

    from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import (
        pack_results_device, unpack_results_host,
    )

    rng = np.random.default_rng(0)
    q, k = 7, 5
    for id_bits in (16, 20, 24, 28):   # <=16: no hi words at all
        d = rng.uniform(0, 6e6, (q, k)).astype(np.float32)  # SIFT sq-L2
        i = rng.integers(0, 1 << id_bits, (q, k)).astype(np.int32)
        i[0, 0] = (1 << id_bits) - 1   # max id must survive
        d[2, 3:] = np.inf
        i[2, 3:] = -1
        wire = pack_results_device(jnp.asarray(d), jnp.asarray(i),
                                   id_bits=id_bits)
        assert wire.dtype == jnp.uint16
        d2, i2 = unpack_results_host(wire, k, id_bits=id_bits)
        np.testing.assert_array_equal(i2, i)
        assert np.isinf(d2[2, 3:]).all()
        fin = np.isfinite(d)
        # bf16 keeps ~8 mantissa bits
        np.testing.assert_allclose(d2[fin], d[fin], rtol=8e-3)
        # f32 wire (partition tiers): distances exact
        wire32 = pack_results_device(jnp.asarray(d), jnp.asarray(i),
                                     id_bits=id_bits, dist16=False)
        d3, i3 = unpack_results_host(wire32, k, id_bits=id_bits,
                                     dist16=False)
        np.testing.assert_array_equal(i3, i)
        np.testing.assert_array_equal(d3[fin], d[fin])
        # ids-only wire (the reference baseline's id-only result protocol):
        # ids exact, dists become ascending rank pseudo-dists / +inf
        wire_ids = pack_results_device(jnp.asarray(d), jnp.asarray(i),
                                       id_bits=id_bits, dist="ids")
        assert wire_ids.shape[1] < wire32.shape[1]
        d4, i4 = unpack_results_host(wire_ids, k, id_bits=id_bits,
                                     dist="ids")
        np.testing.assert_array_equal(i4, i)
        assert np.isinf(d4[2, 3:]).all()
        np.testing.assert_array_equal(d4[2, :3], [0.0, 1.0, 2.0])
        assert (np.diff(d4[0]) > 0).all()


def test_expand_masks_device_matches_host():
    import jax.numpy as jnp

    from vectorsearch_rbac_tpu.core import bits_to_onehot8
    from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import expand_masks_device

    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2**32, (13, 4), dtype=np.uint32)
    for r_pad in (32, 96, 128, 160):  # 160 > 4*32: tail must be zero
        got = np.asarray(expand_masks_device(jnp.asarray(bits), r_pad))
        want = bits_to_onehot8(bits, min(r_pad, 128), r_pad)
        np.testing.assert_array_equal(got, want)


def test_int8_flat_index_end_to_end(int_corpus, int_world, int_arena):
    """Int8FlatIndex (the serving engine) on CPU interpret mode: security +
    recall vs the float oracle through the full deferred/wire path."""
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex

    idx = Int8FlatIndex(int_arena, None, query_batch=32, q_tile=16,
                        block_rows=256, group=8)
    rng = np.random.default_rng(7)
    nq, k = 20, 6  # nq < query_batch and not a multiple: pads one batch
    qf = rng.integers(0, 256, (nq, int_corpus.dim)).astype(np.float32)
    users = rng.integers(0, int_world.num_users, nq)
    masks = int_world.user_masks[users]
    d, ids = idx.search(qf, masks, k)
    assert d.shape == (nq, k) and ids.shape == (nq, k)
    bits = int_corpus.vector_role_bits(int_world)
    hits = total = 0
    for qi in range(nq):
        want = _oracle(int_corpus, int_world, qf[qi], masks[qi], k)
        got = [int(x) for x in ids[qi] if x >= 0]
        for r in got:
            assert (bits[r] & masks[qi]).any()
        if want:
            assert got and got[0] == want[0]
        hits += len(set(got) & set(want))
        total += max(len(want), 1)
        for j, r in enumerate(ids[qi]):
            if r >= 0:
                true = ((int_corpus.vectors[r] - qf[qi]) ** 2).sum()
                assert abs(d[qi, j] - true) / max(true, 1.0) < 1e-2
    assert hits / total >= 0.9, f"recall {hits/total}"


def test_tiled_big_tier(int_corpus, int_world, int_arena):
    """A mixed two-tier searcher: one big partition (flagship-kernel
    gathered scan, fine group) + small chunk-engine partitions. Security is
    exact; recall vs oracle bounded only by group-min collisions."""
    from vectorsearch_rbac_tpu.partition.tiled import TiledSearcher

    n = int_corpus.n
    rows_by_pid = {
        0: np.arange(0, 800, dtype=np.int64),           # big tier (4 chunks)
        1: np.arange(800, n, dtype=np.int64),           # chunk engine
    }

    def router(uid):
        return (0, 1)

    s = TiledSearcher(int_arena, rows_by_pid, router, "mixed",
                      chunk_rows=256, num_roles=int_world.num_roles,
                      big_chunks=2, big_group=8)
    assert list(s._big) == [0] and list(s.part_chunks) == [1]

    rng = np.random.default_rng(21)
    nq, k = 16, 5
    qf = rng.integers(0, 256, (nq, int_corpus.dim)).astype(np.float32)
    users = rng.integers(0, int_world.num_users, nq)
    d, ids = s.search_batch(qf, users, int_world.user_masks, k)
    bits = int_corpus.vector_role_bits(int_world)
    masks = int_world.user_masks[users]
    hits = total = 0
    for qi in range(nq):
        want = _oracle(int_corpus, int_world, qf[qi], masks[qi], k)
        got = [int(x) for x in ids[qi] if x >= 0]
        for r in got:
            assert (bits[r] & masks[qi]).any()
        if want:
            assert got and got[0] == want[0]   # top-1 survives group-min
        hits += len(set(got) & set(want))
        total += max(len(want), 1)
        # merged distances ascending
        fin = d[qi][np.isfinite(d[qi])]
        assert (np.diff(fin) >= -1e-3).all()
    assert hits / total >= 0.85, f"recall {hits/total}"
    assert s.storage_report()["partition_vectors_mb"] > 0


def test_tiled_grouped_epilogue(int_corpus, int_world, int_arena):
    """scan_group > 0 (the production epilogue): security exact, top-1
    always survives, set recall bounded by group-min collisions."""
    from vectorsearch_rbac_tpu.partition import build_searcher

    cfg = FrameworkConfig()
    cfg.index.kind = "flat_approx"
    cfg.search.scan_group = 8   # fine group for the tiny corpus
    s = build_searcher("role", int_corpus, int_world, int_arena, cfg)
    assert s.scan_group == 8

    rng = np.random.default_rng(13)
    nq, k = 24, 5
    qf = rng.integers(0, 256, (nq, int_corpus.dim)).astype(np.float32)
    users = rng.integers(0, int_world.num_users, nq)
    d, ids = s.search_batch(qf, users, int_world.user_masks, k)
    bits = int_corpus.vector_role_bits(int_world)
    hits = total = 0
    for qi in range(nq):
        mask = int_world.user_masks[users[qi]]
        want = _oracle(int_corpus, int_world, qf[qi], mask, k)
        got = [int(x) for x in ids[qi] if x >= 0]
        for r in got:
            assert (bits[r] & mask).any()
        if want:
            assert got and got[0] == want[0]
        hits += len(set(got) & set(want))
        total += max(len(want), 1)
        for j, r in enumerate(ids[qi]):   # distances true modulo the bf16
            if r >= 0:                    # wire rounding (~0.4% relative)
                true = ((int_corpus.vectors[r] - qf[qi]) ** 2).sum()
                assert abs(d[qi, j] - true) / max(true, 1.0) < 8e-3
    assert hits / total >= 0.85, f"recall {hits/total}"


def test_dequant_rerank_matches_shipped_queries(int_world):
    """rerank_dequant=True (device-side query reconstruction) must produce
    the same result SETS as shipping f32 queries — only distance values
    may differ by the query-rounding epsilon."""
    from vectorsearch_rbac_tpu.core import Corpus, build_device_arena
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex

    rng = np.random.default_rng(31)
    n, d = 600, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)  # lossy corpus
    corpus = Corpus(vectors=vecs, doc_ids=np.repeat(np.arange(n // 5), 5),
                    block_ids=np.arange(n) % 5)
    world = TreeRBACGenerator(num_users=40, num_roles=16,
                              num_docs=corpus.num_docs, h=3, b0=2, b1=2,
                              seed=5).generate()
    arena = build_device_arena(corpus, world, block_rows=256, dtype="int8")
    assert not arena.quant.lossless
    q = rng.standard_normal((12, d)).astype(np.float32)
    users = rng.integers(0, world.num_users, 12)
    masks = world.user_masks[users]
    a = Int8FlatIndex(arena, None, query_batch=16, q_tile=16,
                      block_rows=256, group=8, rerank_dequant=False)
    b = Int8FlatIndex(arena, None, query_batch=16, q_tile=16,
                      block_rows=256, group=8, rerank_dequant=True)
    assert a.rerank and b.rerank
    da, ia = a.search(q, masks, 6)
    db, ib = b.search(q, masks, 6)
    for qi in range(12):
        sa = set(int(x) for x in ia[qi] if x >= 0)
        sb = set(int(x) for x in ib[qi] if x >= 0)
        assert len(sa & sb) >= len(sa) - 1, (qi, sa, sb)


def test_uid_table_wire_matches_mask_wire(int_corpus, int_world, int_arena):
    """The 2-byte uid wire (resident user-mask table, query norms computed
    on device) must return EXACTLY the same results as the 16-byte mask
    wire — same kernel, same admission, only the query's RBAC context
    travels differently."""
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex

    rng = np.random.default_rng(77)
    nq = 24
    q = int_corpus.vectors[rng.choice(int_corpus.n, nq)].astype(np.float32)
    users = rng.integers(0, int_world.num_users, nq)
    masks = int_world.user_masks[users]

    idx = Int8FlatIndex(int_arena, None, query_batch=16, q_tile=16,
                        block_rows=256, group=8)
    d_mask, i_mask = idx.search(q, masks, 8)
    idx.set_user_table(int_world.user_masks)
    assert idx._user_table is not None
    d_uid, i_uid = idx.search_deferred(q, None, 8, user_ids=users)()
    np.testing.assert_array_equal(i_mask, i_uid)
    np.testing.assert_allclose(d_mask, d_uid, rtol=1e-5, atol=1e-5)

    # searcher-level: the deferred path picks the uid wire up automatically
    from vectorsearch_rbac_tpu.partition.base import (
        BuiltPartition, PartitionedSearcher,
    )
    s = PartitionedSearcher(
        int_arena, {0: BuiltPartition(0, None, idx)},
        router=lambda uid: (0,), name="rls")
    d_s, i_s = s.search_batch_deferred(q, users, int_world.user_masks, 8)()
    np.testing.assert_array_equal(i_mask, i_s)


@pytest.mark.parametrize("logical", [False, True])
def test_partitioned_rerank_uses_arena_rows(int_world, logical):
    """Regression: a PARTITIONED Int8FlatIndex (rows subset + row_map) with
    the rerank tier on must gather the full-precision mirror by ARENA row,
    not by local id — a local-id gather reranks against unrelated vectors
    and reorders the top-k by garbage distances."""
    from vectorsearch_rbac_tpu.core import build_device_arena
    from vectorsearch_rbac_tpu.data import synthetic_corpus
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex

    rng = np.random.default_rng(3)
    # float corpus => lossy quantization => rerank auto-enables
    corpus = synthetic_corpus(num_docs=int_world.num_docs, blocks_per_doc=6,
                              dim=32, seed=9)
    arena = build_device_arena(corpus, int_world, block_rows=256,
                               dtype="int8")
    # a partition whose rows are NOT a prefix: local id != arena row
    rows = np.arange(corpus.n // 3, corpus.n, dtype=np.int64)
    idx = Int8FlatIndex(arena, rows, query_batch=16, q_tile=8,
                        block_rows=256, group=0, logical=logical)
    assert idx.rerank, "float corpus should auto-enable rerank"

    nq, k = 12, 5
    qf = corpus.vectors[rng.integers(corpus.n // 3, corpus.n, nq)] \
        + 0.01 * rng.standard_normal((nq, corpus.dim)).astype(np.float32)
    users = rng.integers(0, int_world.num_users, nq)
    masks = int_world.user_masks[users]
    d, ids = idx.search(qf, masks, k)

    bits = corpus.vector_role_bits(int_world)
    row_set = set(rows.tolist())
    hits = total = 0
    for qi in range(nq):
        got = [int(x) for x in ids[qi] if x >= 0]
        for r in got:
            assert r in row_set, "returned id outside the partition"
            assert (bits[r] & masks[qi]).any()
        # oracle restricted to the partition's rows
        dd = ((corpus.vectors[rows] - qf[qi]) ** 2).sum(axis=1)
        dd[~(bits[rows] & masks[qi]).any(axis=1)] = np.inf
        want = [int(rows[j]) for j in np.argsort(dd, kind="stable")[:k]
                if np.isfinite(dd[j])]
        if want:
            assert got and got[0] == want[0], (got, want)
            # reranked distances must be TRUE distances of the right
            # rows; tolerance = the u8 affine wire's quantization step
            # (the per-query [min, range] header spans the top-k row, so
            # the step is range/255)
            true0 = ((corpus.vectors[got[0]] - qf[qi]) ** 2).sum()
            fin = d[qi][np.isfinite(d[qi])]
            step = (fin.max() - fin.min()) / 255.0 + 1e-3
            assert abs(d[qi, 0] - true0) <= step + 1e-2 * true0, (
                d[qi, 0], true0, step)
        hits += len(set(got) & set(want))
        total += max(len(want), 1)
    assert hits / total >= 0.9, f"partitioned rerank recall {hits/total}"


def test_int8_flat_index_ids_wire(int_corpus, int_world, int_arena):
    """wire='ids' (the reference-parity id-only result protocol): same row
    ids as the bf16 wire, rank pseudo-distances ascending, -1/inf empties."""
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex

    rng = np.random.default_rng(8)
    nq, k = 16, 6
    qf = rng.integers(0, 256, (nq, int_corpus.dim)).astype(np.float32)
    users = rng.integers(0, int_world.num_users, nq)
    masks = int_world.user_masks[users]
    ref = Int8FlatIndex(int_arena, None, query_batch=16, q_tile=16,
                        block_rows=256, group=8)
    ids_idx = Int8FlatIndex(int_arena, None, query_batch=16, q_tile=16,
                            block_rows=256, group=8, wire="ids")
    d1, r1 = ref.search(qf, masks, k)
    d2, r2 = ids_idx.search(qf, masks, k)
    np.testing.assert_array_equal(r1, r2)
    for qi in range(nq):
        fin = r2[qi] >= 0
        # rank pseudo-dists: 0..count-1 then +inf
        np.testing.assert_array_equal(d2[qi][fin],
                                      np.arange(fin.sum(), dtype=np.float32))
        assert np.isinf(d2[qi][~fin]).all()


def test_admit_dedup_bit_identical(int_corpus, int_world, int_arena):
    """Admit-dedup (mask-grouped sub-block slots feeding the kernel's
    shrunken admissibility matmul, ops/pallas_scan_int8 mask_sub_block)
    must return EXACTLY the per-query-mask results — grouping, padding,
    interleaving, and the finalize scatter are all order bookkeeping.
    Covers both the mask wire and the 2-byte uid wire, skewed mask
    counts (slot padding), and the fragmented-population gate."""
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex

    rng = np.random.default_rng(11)
    nq, k = 320, 6
    qf = rng.integers(0, 256, (nq, int_corpus.dim)).astype(np.float32)
    # 5 distinct masks with skewed counts (prime-ish -> slot padding)
    base_users = rng.choice(int_world.num_users, 5, replace=False)
    users = base_users[np.minimum((rng.pareto(1.2, nq) * 2).astype(int), 4)]
    masks = int_world.user_masks[users]

    mk = dict(query_batch=128, q_tile=128, block_rows=256, group=8)
    on = Int8FlatIndex(int_arena, None, **mk)
    off = Int8FlatIndex(int_arena, None, mask_dedup=False, **mk)
    d1, i1 = on.search(qf, masks, k)
    assert on._last_dedup, "gate should fire: 5 masks over 320 queries"
    d0, i0 = off.search(qf, masks, k)
    assert not off._last_dedup
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_array_equal(d0, d1)

    # uid wire: same equality through the resident-table path
    on.set_user_table(int_world.user_masks)
    off.set_user_table(int_world.user_masks)
    d3, i3 = on.search_deferred(qf, None, k, user_ids=users)()
    assert on._last_dedup
    d2, i2 = off.search_deferred(qf, None, k, user_ids=users)()
    np.testing.assert_array_equal(i2, i3)
    np.testing.assert_array_equal(d2, d3)
    np.testing.assert_array_equal(i0, i3)

    # broad population (one mask per random user): whether or not the
    # 1.25x padding gate declines, results must stay identical
    masks_f = int_world.user_masks[rng.integers(0, int_world.num_users, nq)]
    df1, if1 = on.search(qf, masks_f, k)
    df0, if0 = off.search(qf, masks_f, k)
    np.testing.assert_array_equal(if0, if1)


def test_admit_dedup_wide_index_e2e(int_world):
    """Index-level policy: admit-dedup stays OFF on the WIDE kernel path
    (d_pad > 256) — measured 17% slower at zero padding at 768-d because
    the admissibility matmul is only ~14% of wide-kernel MACs
    (results/r4_wide_admit_lab.json; PERF.md negative result). The wide
    kernel itself still supports mask_sub_block (covered bit-identically
    by test_admit_dedup_wide_kernel); this test pins the index gate and
    that mask_dedup on/off agree on the wide path."""
    from vectorsearch_rbac_tpu.core import Corpus, build_device_arena
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex

    rng = np.random.default_rng(13)
    n, d, nq, k = 768, 384, 384, 5
    vecs = rng.integers(0, 200, (n, d)).astype(np.float32)
    corpus = Corpus(vectors=vecs, doc_ids=np.repeat(np.arange(n // 4), 4),
                    block_ids=np.arange(n) % 4)
    world = TreeRBACGenerator(num_users=40, num_roles=16,
                              num_docs=corpus.num_docs, h=3, b0=2, b1=2,
                              seed=7).generate()
    arena = build_device_arena(corpus, world, block_rows=256, dtype="int8")
    qf = rng.integers(0, 200, (nq, d)).astype(np.float32)
    base_users = rng.choice(world.num_users, 4, replace=False)
    # balanced assignment (shuffled): slot padding stays within the 1.25x
    # gate at this small nq
    users = base_users[rng.permutation(np.arange(nq) % 4)]
    masks = world.user_masks[users]

    mk = dict(query_batch=128, q_tile=128, block_rows=256, group=8)
    on = Int8FlatIndex(arena, None, **mk)
    assert on.wide
    off = Int8FlatIndex(arena, None, mask_dedup=False, **mk)
    d1, i1 = on.search(qf, masks, k)
    assert not on._last_dedup, "wide path must keep admit-dedup gated off"
    d0, i0 = off.search(qf, masks, k)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_array_equal(d0, d1)


def test_admit_dedup_wide_kernel(int_world):
    """The wide (d-split) kernel's mask_sub_block leg must match its
    per-query-mask output bit-for-bit under the interleaved slot layout
    (same contract as the narrow kernel's admit-dedup)."""
    import jax.numpy as jnp

    from vectorsearch_rbac_tpu.core import Corpus, build_device_arena
    from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import (
        int8_masked_topk_wide,
    )

    rng = np.random.default_rng(29)
    n, d, nq, k, q_tile, sb = 512, 384, 64, 6, 32, 4
    nsb = q_tile // sb
    vecs = rng.integers(0, 200, (n, d)).astype(np.float32)
    corpus = Corpus(vectors=vecs, doc_ids=np.repeat(np.arange(n // 4), 4),
                    block_ids=np.arange(n) % 4)
    world = TreeRBACGenerator(num_users=40, num_roles=16,
                              num_docs=corpus.num_docs, h=3, b0=2, b1=2,
                              seed=5).generate()
    arena = build_device_arena(corpus, world, block_rows=256, dtype="int8")
    q = arena.quant
    qf = rng.integers(0, 200, (nq, d)).astype(np.float32)
    # interleaved slot layout: query j carries slot j % nsb of its tile
    pool_users = rng.choice(world.num_users, 5, replace=False)
    qi = np.arange(nq)
    mask_id = ((qi // q_tile) * nsb + (qi % nsb)) % 5
    m_q = q.quantize_masks(world.user_masks[pool_users[mask_id]],
                           world.num_roles)
    m_sb = q.quantize_masks(
        world.user_masks[pool_users[np.arange(nq // sb) % 5]],
        world.num_roles)
    qq, qn = q.quantize_queries(qf)
    inv = jnp.float32(1.0 / q.scale**2)
    base = (jnp.asarray(qq), jnp.asarray(qn), q.vectors_q, q.norms_q,
            q.roles8)
    d0, i0 = int8_masked_topk_wide(*base, jnp.asarray(m_q), inv, k,
                                   q_tile=q_tile, block_rows=256, group=8,
                                   merge="exact", interpret=True)
    d1, i1 = int8_masked_topk_wide(*base, jnp.asarray(m_sb), inv, k,
                                   q_tile=q_tile, block_rows=256, group=8,
                                   merge="exact", interpret=True,
                                   mask_sub_block=sb)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
