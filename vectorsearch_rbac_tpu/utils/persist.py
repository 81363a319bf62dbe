"""Artifact persistence: checkpoint/resume for every expensive build step.

The reference checkpoints at artifact level (SURVEY.md section 5): fitted
params in parameter_hnsw.json, ground-truth JSON cache, qd-tree pickles,
.faiss index files and a custom binary graph format (reference
pointer_hnsw_index.cpp:132-203). Equivalents here:

- world/plan/tree: pickle (save_pickle/load_pickle);
- HNSW graphs and IVF inverted files: npz state dicts (save_npz/load_npz)
  so a 1M-row graph build (~minutes native) is paid once;
- fitted cost-model params: JSON via CostModelParams.to_dict;
- ground truth: handled by bench.GroundTruthOracle's own cache.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict

import numpy as np


def _ensure_dir(path: str) -> None:
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)


def save_pickle(obj: Any, path: str) -> None:
    _ensure_dir(path)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_npz(state: Dict[str, np.ndarray], path: str, **meta) -> None:
    _ensure_dir(path)
    np.savez_compressed(path, __meta__=json.dumps(meta), **state)


def load_npz(path: str):
    """Returns (state dict of arrays, meta dict)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"])) if "__meta__" in data else {}
    state = {k: data[k] for k in data.files if k != "__meta__"}
    return state, meta


def save_params(params, path: str) -> None:
    """Fitted cost-model params (the parameter_hnsw.json analog). A
    `family` tag records which model class the numbers belong to so
    load_params reconstructs the right one (reference keeps separate
    parameter_<index>.json files per index, get_parameter.py)."""
    from ..models.cost import IVFCoverageParams, TPUCostParams

    _ensure_dir(path)
    d = params.to_dict()
    d["family"] = ("ivf_coverage" if isinstance(params, IVFCoverageParams)
                   else "tpu" if isinstance(params, TPUCostParams)
                   else "reference")
    with open(path, "w") as f:
        json.dump(d, f, indent=2)


def load_params(path: str):
    from ..models.cost import (
        CostModelParams, IVFCoverageParams, TPUCostParams,
    )

    with open(path) as f:
        d = json.load(f)
    fam = d.pop("family", "reference")
    cls = {"ivf_coverage": IVFCoverageParams,
           "tpu": TPUCostParams}.get(fam, CostModelParams)
    return cls.from_dict(d)
