import math

import numpy as np
import pytest

from vectorsearch_rbac_tpu.models import (
    CostModelParams,
    QueryTimeModel,
    RecallModel,
    ef_for_recall,
    fit_qps_params,
    fit_recall_params,
)


def test_recall_model_shape():
    p = CostModelParams(k=1.0, beta=0.44)
    m = RecallModel(p)
    # linear ramp below threshold
    sel, topk = 0.1, 10
    threshold = p.k * topk / sel
    assert m.recall(threshold / 2, topk, sel) == pytest.approx(threshold / 2 * sel / topk)
    # monotone nondecreasing, capped at 1
    efs = np.linspace(1, 5000, 200)
    curve = m.recall_curve(efs, topk, sel)
    assert np.all(np.diff(curve) >= -1e-12)
    assert curve[-1] <= 1.0
    # zero selectivity -> zero recall
    assert m.recall(100, topk, 0.0) == 0.0


def test_ef_inversion_roundtrip():
    p = CostModelParams(k=0.9, beta=0.5)
    m = RecallModel(p)
    sel, topk = 0.2, 10
    # inversion lives on the sigmoid branch, i.e. targets above k
    for target in (0.92, 0.95, 0.97):
        ef = ef_for_recall(target, topk, sel, p)
        got = m.recall(ef, topk, sel)
        assert got == pytest.approx(target, abs=0.02)
    # default target (None): a positive ef on the curve — used only for
    # relative cost comparisons inside the planner, not absolute calibration
    ef = ef_for_recall(None, topk, sel, p)
    assert ef > 0
    assert 0 < m.recall(ef, topk, sel) <= 1


def test_query_time_model():
    p = CostModelParams(a=2.0, b=10.0, join_time=5.0)
    qt = QueryTimeModel(p)
    assert qt.partition_time(math.e, ef=3.0) == pytest.approx(1.0 * (6.0 + 10.0))
    t = qt.query_time([100, 1000], ef=2.0)
    expect = (math.log(100) + math.log(1000)) * (4.0 + 10.0) + 2 * 5.0
    assert t == pytest.approx(expect)
    assert qt.partition_time(1, 10) == 0.0


def test_fit_recall_recovers_params():
    true = CostModelParams(k=0.85, beta=0.6)
    m = RecallModel(true)
    sel, topk = 0.15, 10
    efs = np.linspace(1, 2000, 80)
    rng = np.random.default_rng(0)
    recalls = m.recall_curve(efs, topk, sel) + rng.normal(0, 0.005, len(efs))
    k, beta = fit_recall_params(efs, np.clip(recalls, 0, 1), topk, sel)
    fitted = RecallModel(CostModelParams(k=k, beta=beta))
    err = np.abs(fitted.recall_curve(efs, topk, sel) - m.recall_curve(efs, topk, sel))
    assert err.max() < 0.05


def test_fit_qps_recovers_params():
    a_true, b_true = 3.5, 120.0
    rng = np.random.default_rng(1)
    ns = rng.integers(1000, 100000, 50).astype(float)
    efs = rng.integers(5, 500, 50).astype(float)
    times = np.log(ns) * (a_true * efs + b_true) * (1 + rng.normal(0, 0.01, 50))
    a, b = fit_qps_params(ns, efs, times)
    assert a == pytest.approx(a_true, rel=0.1)
    assert b == pytest.approx(b_true, rel=0.15)
