import numpy as np
import pytest

from vectorsearch_rbac_tpu.bench import GroundTruthOracle, generate_query_workload
from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.index.hnsw import HNSWIndex
from vectorsearch_rbac_tpu.models.validate import (
    fit_from_sweep,
    sweep_search_width,
    validate_models,
)
from vectorsearch_rbac_tpu import native


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_sweep_fit_validate_on_hnsw(small_world, small_corpus):
    """End-to-end model pipeline: sweep ef on a real index, fit (k, beta,
    a, b), check the fitted recall curve tracks measurement (the reference's
    modelrecall_vs_realrecall validation)."""
    world, corpus = small_world, small_corpus
    arena = build_device_arena(corpus, world, block_rows=128)
    idx = HNSWIndex(arena, rows=None, m=8, ef_construction=48, ef_search=32,
                    query_batch=16, builder="classic", seed=0)

    wl = generate_query_workload(corpus, world, num_queries=16, topk=5, seed=7)
    oracle = GroundTruthOracle(arena, block_rows=128, query_batch=16)
    truth = oracle.compute(corpus, world, wl, 5)
    masks = world.user_masks[wl.user_ids]

    def search_fn(q, m, k, ef):
        return idx.search(q, m, k, ef_search=ef)

    efs = [8, 16, 32, 64, 96]
    sweep = sweep_search_width(search_fn, wl.vectors, masks, truth, 5, efs,
                               timing_reps=1)
    assert len(sweep["recalls"]) == len(efs)
    # recall roughly increases with ef
    assert sweep["recalls"][-1] >= sweep["recalls"][0] - 0.05

    sel = float(np.mean(wl.selectivities))
    params = fit_from_sweep(sweep, topk=5, sel=sel, n_vectors=corpus.n)
    report = validate_models(sweep, params, topk=5, sel=sel, n_vectors=corpus.n)
    assert report["recall_mae"] < 0.25
    assert "params" in report and report["params"]["a"] != 0
