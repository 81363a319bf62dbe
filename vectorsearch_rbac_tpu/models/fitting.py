"""Parameter fitting for the cost models.

Replaces the reference's fitting pipeline (reference
controller/dynamic_partition/hnsw/analysis/analysis_hnsw_recall.py:279-332
fit_piecewise_model; analysis_hnsw_qps.py:260-334
fit_query_time_function_with_log): measured (ef, recall) points from
on-device sweeps are fitted to the piecewise linear/sigmoid model via
curve_fit, and measured (n, ef, time) triples are normalized by log(n) and
fitted linearly to recover (a, b).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from .cost import CostModelParams


def _piecewise(ef: np.ndarray, k: float, beta: float, topk: float, sel: float) -> np.ndarray:
    threshold = k * topk / max(sel, 1e-9)
    lin = ef * sel / topk
    expo = -4.0 * beta * sel / topk * (ef - threshold)
    expo = np.clip(expo, -60, 60)
    sig = 1.0 / (1.0 + np.exp(expo)) + (k - 0.5)
    return np.minimum(np.where(ef <= threshold, lin, sig), 1.0)


def fit_recall_params(
    efs: Sequence[float],
    recalls: Sequence[float],
    topk: int,
    sel: float,
) -> Tuple[float, float]:
    """Fit (k, beta) of the piecewise recall model to measured points."""
    efs = np.asarray(efs, dtype=np.float64)
    recalls = np.asarray(recalls, dtype=np.float64)

    def model(ef, k, beta):
        return _piecewise(ef, k, beta, float(topk), float(sel))

    try:
        from scipy.optimize import curve_fit

        (k, beta), _ = curve_fit(
            model, efs, recalls, p0=[1.0, 0.4],
            bounds=([0.5, 1e-3], [1.0, 10.0]), maxfev=20000,
        )
        return float(k), float(beta)
    except Exception:
        # numpy fallback: coarse grid + local refinement
        best = (1.0, 0.4, np.inf)
        for k in np.linspace(0.5, 1.0, 26):
            for beta in np.geomspace(1e-3, 10, 60):
                err = float(np.mean((model(efs, k, beta) - recalls) ** 2))
                if err < best[2]:
                    best = (float(k), float(beta), err)
        return best[0], best[1]


def fit_qps_params(
    n_vectors: Sequence[float],
    efs: Sequence[float],
    times: Sequence[float],
) -> Tuple[float, float]:
    """Fit (a, b) of time = log(n) * (a*ef + b).

    Normalizing by log(n) gives t' = a*ef + b — ordinary least squares
    (the reference's fit_query_time_function_with_log)."""
    n = np.asarray(n_vectors, dtype=np.float64)
    ef = np.asarray(efs, dtype=np.float64)
    t = np.asarray(times, dtype=np.float64)
    mask = n > 1
    tn = t[mask] / np.log(n[mask])
    a, b = np.polyfit(ef[mask], tn, deg=1)
    return float(a), float(b)


def fit_cost_model(
    recall_points: Tuple[Sequence[float], Sequence[float]],
    qps_points: Tuple[Sequence[float], Sequence[float], Sequence[float]],
    topk: int,
    sel: float,
    join_time: float = 0.0,
) -> CostModelParams:
    k, beta = fit_recall_params(recall_points[0], recall_points[1], topk, sel)
    a, b = fit_qps_params(*qps_points)
    return CostModelParams(k=k, beta=beta, a=a, b=b, join_time=join_time)
