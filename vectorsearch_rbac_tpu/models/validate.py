"""Model-validation suite: predicted vs measured recall/QPS curves.

Replaces the reference's validation scripts (reference
controller/dynamic_partition/hnsw/validate/modelrecall_vs_realrecall.py,
modelqps_vs_realqps.py, multi_parameter_model_validation.py): sweep the
index's search-width knob (ef for HNSW, nprobe for IVF), measure recall
against the exact oracle and wall time on device, fit the models, and
report predicted-vs-measured error. Outputs plain dicts (JSON-able); no
matplotlib dependency — plotting is the caller's concern.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

from ..bench.ground_truth import compute_recall
from .cost import CostModelParams, QueryTimeModel, RecallModel
from .fitting import fit_qps_params, fit_recall_params

SearchFn = Callable[[np.ndarray, np.ndarray, int, int], Tuple[np.ndarray, np.ndarray]]
# (queries, masks, k, ef) -> (dists, ids)


def sweep_search_width(
    search_fn: SearchFn,
    queries: np.ndarray,
    masks: np.ndarray,
    truth_ids: np.ndarray,
    k: int,
    efs: Sequence[int],
    timing_reps: int = 2,
) -> Dict[str, List[float]]:
    """Measure (recall, seconds/query) at each search width (the reference's
    ef sweep, analysis_hnsw_recall.py:509)."""
    recalls, times = [], []
    for ef in efs:
        search_fn(queries, masks, k, ef)  # warm
        t0 = time.perf_counter()
        for _ in range(timing_reps):
            d, ids = search_fn(queries, masks, k, ef)
        dt = (time.perf_counter() - t0) / timing_reps / len(queries)
        recalls.append(compute_recall(ids, truth_ids))
        times.append(dt)
    return {"efs": [float(e) for e in efs], "recalls": recalls,
            "times_s": times}


def fit_from_sweep(
    sweep: Dict[str, List[float]],
    topk: int,
    sel: float,
    n_vectors: int,
) -> CostModelParams:
    """Fit (k, beta) and (a, b) from one sweep over a single index of
    n_vectors rows (the reference fits on the global RLS index,
    get_parameter.py:135-185)."""
    k_, beta = fit_recall_params(sweep["efs"], sweep["recalls"], topk, sel)
    ns = [n_vectors] * len(sweep["efs"])
    a, b = fit_qps_params(ns, sweep["efs"], sweep["times_s"])
    return CostModelParams(k=k_, beta=beta, a=a, b=b)


def validate_models(
    sweep: Dict[str, List[float]],
    params: CostModelParams,
    topk: int,
    sel: float,
    n_vectors: int,
) -> Dict[str, object]:
    """Predicted-vs-measured errors (modelrecall_vs_realrecall analog)."""
    rm = RecallModel(params)
    qm = QueryTimeModel(params)
    pred_recall = [rm.recall(ef, topk, sel) for ef in sweep["efs"]]
    pred_time = [qm.partition_time(n_vectors, ef) for ef in sweep["efs"]]
    recall_err = [abs(p - m) for p, m in zip(pred_recall, sweep["recalls"])]
    # query-time model is linear in ef up to scale: compare normalized shapes
    mt = np.asarray(sweep["times_s"])
    pt = np.asarray(pred_time)
    scale = (mt @ pt) / max(pt @ pt, 1e-12)
    time_rel_err = np.abs(pt * scale - mt) / np.maximum(mt, 1e-12)
    return {
        "efs": sweep["efs"],
        "measured_recall": sweep["recalls"],
        "predicted_recall": pred_recall,
        "recall_mae": float(np.mean(recall_err)),
        "measured_time_s": sweep["times_s"],
        "predicted_time_scaled": (pt * scale).tolist(),
        "time_mape": float(np.mean(time_rel_err)),
        "params": params.to_dict(),
    }
