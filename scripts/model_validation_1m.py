"""Multi-parameter cost-model validation on chip (VERDICT item 5).

Grid: sizes x selectivities x ef, HNSW subset indexes over a 200k-row
clustered corpus (the selectivity lab holds sel constant per cell, unlike
user workloads). Fits (k, beta, ef_offset) on one cell + (a, b) jointly
across sizes; reports recall MAE / time MAPE per cell.

Writes results/model_validation.json. Done-criteria from VERDICT.md:
recall MAE < 0.05 and time MAPE < 20% across the grid.
"""
import json

import numpy as np

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.models.validate import (
    multi_parameter_validation, selectivity_lab_world,
)

N = 200_000
SELS = [0.05, 0.1, 0.25, 0.5, 1.0]
SIZES = [25_000, 50_000, 100_000, 200_000]
EFS = [16, 32, 64, 128, 256]
TOPK = 10

corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
world = selectivity_lab_world(corpus.num_docs, SELS, seed=1)
arena = build_device_arena(corpus, world, block_rows=16384)

rng = np.random.default_rng(2)
queries = qpool[rng.choice(len(qpool), 256, replace=False)].astype(np.float32)

out = multi_parameter_validation(
    corpus, world, SELS, SIZES, EFS, TOPK, queries, arena=arena,
    index_kind="hnsw", fit_offset=True, fit_mode="joint",
    builder="classic",   # one graph-quality regime across all sizes
    timing_reps=2,
)
out["corpus"] = f"clustered sift-like {N} x {corpus.dim}"
with open("results/model_validation.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps({k: out[k] for k in
                  ("params", "recall_mae", "time_mape", "fit_cell")},
                 indent=2))
for c in out["cells"]:
    print(f"n={c['n']:>7} sel={c['sel']:.2f}  recall_mae={c['recall_mae']:.3f} "
          f"time_mape={c['time_mape']:.2f}")
