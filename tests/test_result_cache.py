import numpy as np

from vectorsearch_rbac_tpu.bench import generate_query_workload
from vectorsearch_rbac_tpu.bench.result_cache import CachedSearcher
from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.partition import build_searcher
from vectorsearch_rbac_tpu.rbac.generators import ArxivBusinessRBACGenerator
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig


def test_arxiv_business_generator():
    w = ArxivBusinessRBACGenerator(num_users=80, n_broles=15, num_docs=200,
                                   num_categories=12, seed=3).generate()
    w.validate()
    # multi-role users exist (business roles bundle functional roles)
    assert any(len(r) > 1 for r in w.user_to_roles.values())
    w2 = ArxivBusinessRBACGenerator(num_users=80, n_broles=15, num_docs=200,
                                    num_categories=12, seed=3).generate()
    assert w.user_to_roles == w2.user_to_roles


def test_cached_searcher(small_world, small_corpus):
    cfg = FrameworkConfig()
    cfg.search.block_rows = 128
    cfg.search.batch_size = 16
    arena = build_device_arena(small_corpus, small_world, block_rows=128)
    inner = build_searcher("rls", small_corpus, small_world, arena, cfg)
    cached = CachedSearcher(inner, small_world, capacity=100)

    wl = generate_query_workload(small_corpus, small_world, num_queries=6,
                                 topk=5, repetitions=3, zipf_param=0, seed=2)
    d, i = cached.search_batch(wl.vectors, wl.user_ids, small_world.user_masks, 5)
    st = cached.stats()
    # first occurrence of each distinct (comb, query) misses, the rest hit
    uniq = len({(small_world.user_to_roles[int(u)], q.tobytes())
                for u, q in zip(wl.user_ids, wl.vectors)})
    assert st["misses"] == uniq
    assert st["hits"] == wl.num_queries - uniq
    assert st["hits"] >= 12
    # cached results identical to direct search
    d2, i2 = inner.search_batch(wl.vectors, wl.user_ids, small_world.user_masks, 5)
    np.testing.assert_array_equal(i, i2)
    # same query from a user with the SAME comb hits; different comb misses
    uid_same = None
    base_uid = int(wl.user_ids[0])
    for u, roles in small_world.user_to_roles.items():
        if u != base_uid and roles == small_world.user_to_roles[base_uid]:
            uid_same = u
            break
    if uid_same is not None:
        before = cached.stats()["hits"]
        cached.search_batch(wl.vectors[:1], np.array([uid_same]),
                            small_world.user_masks, 5)
        assert cached.stats()["hits"] == before + 1
