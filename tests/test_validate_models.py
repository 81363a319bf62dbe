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


def test_ef_offset_improves_saturated_fit():
    """A measured curve that saturates far earlier than the 2-parameter
    family allows must fit better with the ef_offset extension, and
    ef_for_recall must stay consistent with the forward model."""
    import numpy as np

    from vectorsearch_rbac_tpu.models.cost import (
        CostModelParams, RecallModel, ef_for_recall)
    from vectorsearch_rbac_tpu.models.fitting import (
        _piecewise, fit_recall_params)

    topk, sel = 10, 0.5
    efs = np.asarray([8, 16, 24, 32, 48, 64, 96, 128], dtype=float)
    truth = _piecewise(efs, 0.98, 0.9, topk, sel, ef0=-30.0)

    k2, b2 = fit_recall_params(efs, truth, topk, sel)
    k3, b3, ef0 = fit_recall_params(efs, truth, topk, sel, fit_offset=True)
    e2 = np.mean((_piecewise(efs, k2, b2, topk, sel) - truth) ** 2)
    e3 = np.mean((_piecewise(efs, k3, b3, topk, sel, ef0) - truth) ** 2)
    assert e3 <= e2 + 1e-12
    assert e3 < 1e-4, f"offset fit residual too high: {e3}"

    p = CostModelParams(k=k3, beta=b3, ef_offset=ef0)
    rm = RecallModel(p)
    ef_needed = ef_for_recall(0.9, topk, sel, p)
    assert rm.recall(ef_needed, topk, sel) == pytest.approx(0.9, abs=0.02)


def test_fit_join_time():
    import numpy as np

    from vectorsearch_rbac_tpu.models.fitting import fit_join_time

    rng = np.random.default_rng(0)
    m = np.asarray([1, 2, 4, 8])
    t = 3.0 + 0.25 * m + rng.normal(0, 0.01, 4)
    j = fit_join_time(m, t)
    assert j == pytest.approx(0.25, abs=0.05)


def test_multi_parameter_validation_small(small_corpus):
    """Grid validation runs end-to-end and the fitted model tracks the
    measured recall within tolerance on the small lab."""
    import numpy as np

    import vectorsearch_rbac_tpu.native as native
    if not native.available():
        pytest.skip("native lib unavailable")

    from vectorsearch_rbac_tpu.models.validate import (
        multi_parameter_validation, selectivity_lab_world)

    sels = [0.2, 0.6]
    world = selectivity_lab_world(small_corpus.num_docs, sels, seed=1)
    rng = np.random.default_rng(2)
    queries = small_corpus.vectors[
        rng.integers(0, small_corpus.n, 24)] + 0.01 * rng.standard_normal(
        (24, small_corpus.dim)).astype(np.float32)
    out = multi_parameter_validation(
        small_corpus, world, sels, sizes=[256, 512], efs=[8, 16, 32, 64],
        topk=5, queries=queries.astype(np.float32), timing_reps=1,
    )
    assert len(out["cells"]) == 4
    assert out["recall_mae"] < 0.15, out["recall_mae"]
    assert np.isfinite(out["time_mape"])


def test_joint_fit_recovers_n_scaling():
    """fit_recall_params_joint recovers gamma_n from synthetic curves whose
    ef-for-recall scales as n^0.5, where the n-free family cannot."""
    import numpy as np

    from vectorsearch_rbac_tpu.models.cost import CostModelParams, RecallModel
    from vectorsearch_rbac_tpu.models.fitting import fit_recall_params_joint

    true = CostModelParams(k=0.95, beta=0.8, ef_offset=0.0,
                           n_ref=50_000, gamma_n=0.5)
    rm = RecallModel(true)
    topk = 10
    pts = []
    for n in (12_500, 25_000, 50_000, 100_000, 200_000):
        for sel in (0.1, 0.5, 1.0):
            for ef in (16, 32, 64, 128, 256):
                pts.append((ef, sel, n, rm.recall(ef, topk, sel, n=n)))
    fitted = fit_recall_params_joint(pts, topk)
    assert abs(fitted.gamma_n - 0.5) < 0.15, fitted.gamma_n
    rf = RecallModel(fitted)
    errs = [abs(rf.recall(ef, topk, sel, n=n) - r)
            for ef, sel, n, r in pts]
    assert float(np.mean(errs)) < 0.02, np.mean(errs)


def test_ef_for_recall_n_scaling_inverts():
    from vectorsearch_rbac_tpu.models.cost import (
        CostModelParams, RecallModel, ef_for_recall,
    )

    p = CostModelParams(k=0.95, beta=0.6, n_ref=50_000, gamma_n=0.7)
    rm = RecallModel(p)
    for n in (10_000, 50_000, 400_000):
        for target in (0.9, 0.97):
            ef = ef_for_recall(target, 10, 0.5, p, n=n)
            got = rm.recall(ef, 10, 0.5, n=n)
            assert abs(got - target) < 0.02, (n, target, ef, got)
    # bigger index needs a bigger ef for the same target
    e1 = ef_for_recall(0.97, 10, 0.5, p, n=10_000)
    e2 = ef_for_recall(0.97, 10, 0.5, p, n=400_000)
    assert e2 > 2 * e1
