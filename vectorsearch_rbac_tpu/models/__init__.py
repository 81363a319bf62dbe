from .cost import (
    RecallModel,
    QueryTimeModel,
    CostModelParams,
    ef_for_recall,
)
from .fitting import fit_recall_params, fit_qps_params

__all__ = [
    "RecallModel",
    "QueryTimeModel",
    "CostModelParams",
    "ef_for_recall",
    "fit_recall_params",
    "fit_qps_params",
]
