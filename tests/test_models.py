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


def test_ivf_coverage_family_fits_round2_sweep():
    """The coverage family must describe the committed round-2 IVF sweep
    (results/ivf_model_validation_1m.json) — the artifact the piecewise
    family failed on."""
    from vectorsearch_rbac_tpu.models.cost import (
        IVFCoverageParams, model_ef_for_recall, model_partition_time,
    )
    from vectorsearch_rbac_tpu.models.fitting import fit_ivf_coverage

    nprobes = [8, 16, 32, 64]
    recalls = [0.3394, 0.4972, 0.7055, 0.8866]
    p = fit_ivf_coverage(nprobes, recalls, l_pad=1024)
    pred = [p.recall(m) for m in nprobes]
    mae = float(np.mean(np.abs(np.asarray(pred) - np.asarray(recalls))))
    assert mae < 0.03, (mae, pred)

    # inversion roundtrip through the family-dispatching planner interface
    for target in (0.5, 0.7, 0.85):
        np_needed = model_ef_for_recall(p, target, 100, 0.036, 1e6)
        assert p.recall(np_needed) == pytest.approx(target, abs=1e-6)
    # monotone: higher recall needs more probes
    assert (model_ef_for_recall(p, 0.9, 100, 0.036)
            > model_ef_for_recall(p, 0.5, 100, 0.036))
    # time model dispatch uses nprobe * l_pad as ef
    t = model_partition_time(p, 1e6, 16)
    assert t == pytest.approx(
        math.log(1e6) * (p.a * 16 * p.l_pad + p.b), rel=1e-9)
    # serialization roundtrip
    assert IVFCoverageParams.from_dict(p.to_dict()).lam == p.lam
