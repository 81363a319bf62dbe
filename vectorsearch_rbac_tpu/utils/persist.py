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
    """Fitted cost-model params (the parameter_hnsw.json analog)."""
    _ensure_dir(path)
    with open(path, "w") as f:
        json.dump(params.to_dict(), f, indent=2)


def load_params(path: str):
    from ..models.cost import CostModelParams

    with open(path) as f:
        return CostModelParams.from_dict(json.load(f))
