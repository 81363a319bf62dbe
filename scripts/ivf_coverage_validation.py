"""IVF coverage-recall model validation at 1M (VERDICT r2 item 6).

The round-2 artifact (results/ivf_model_validation_1m.json) established
that the reference's piecewise recall family cannot describe IVF probe
recall and named the fix: a coverage-based family behind the same
ef_for_recall interface. That family now exists
(models/cost.IVFCoverageParams, fitted by models/fitting.fit_ivf_coverage,
dispatched by model_ef_for_recall). This script validates it the honest
way: per (size, selectivity) cell, sweep nprobe, fit on the EVEN sweep
points, and report recall MAE on the HELD-OUT odd points (in-sample error
would flatter any 3-parameter family on an 11-point sweep). Time MAPE
validates the log(n)*(a*nprobe*l_pad+b) model on all points.

Done criterion: held-out recall MAE comparable to the HNSW family's 0.044
(results/model_validation.json).

Writes results/ivf_coverage_validation_1m.json.
"""
import json
import time

import numpy as np

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.index.ivf import IVFIndex
from vectorsearch_rbac_tpu.models.cost import IVFCoverageParams
from vectorsearch_rbac_tpu.models.fitting import fit_ivf_coverage
from vectorsearch_rbac_tpu.models.validate import selectivity_lab_world

N = 1_000_000
SELS = [0.05, 0.1, 0.25, 0.5]
SIZES = [250_000, 1_000_000]
NPROBES = [4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128]
TOPK = 10
NQ = 256

corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
world = selectivity_lab_world(corpus.num_docs, SELS, seed=1)
arena = build_device_arena(corpus, world, block_rows=65536)
bits = corpus.vector_role_bits(world)

rng = np.random.default_rng(2)
queries = qpool[rng.choice(len(qpool), NQ, replace=False)].astype(np.float32)

cells = []
for size in SIZES:
    rows = np.sort(rng.choice(corpus.n, size, replace=False))
    t0 = time.perf_counter()
    idx = IVFIndex(arena, rows=rows, nlist=max(64, int(np.sqrt(size))),
                   query_batch=NQ, seed=0)
    print(f"ivf n={size} nlist={idx.nlist} built {time.perf_counter()-t0:.0f}s",
          flush=True)
    sub_vec = corpus.vectors[rows]
    sub_norm = np.einsum("nd,nd->n", sub_vec, sub_vec)
    for si, sel in enumerate(SELS):
        masks = np.tile(world.user_masks[si], (NQ, 1))
        allowed = (bits[rows] & world.user_masks[si]).any(axis=1)
        d2 = sub_norm[None, :] - 2.0 * queries @ sub_vec.T
        d2[:, ~allowed] = np.inf
        order = np.argsort(d2, axis=1, kind="stable")[:, :TOPK]
        truth = rows[order]
        truth[np.take_along_axis(d2, order, axis=1) == np.inf] = -1

        recalls, times = [], []
        for npb in NPROBES:
            idx.search(queries, masks, TOPK, nprobe=npb)  # warm/compile
            t0 = time.perf_counter()
            for _ in range(2):
                d, i = idx.search(queries, masks, TOPK, nprobe=npb)
            dt = (time.perf_counter() - t0) / (2 * NQ)
            hit = (i[:, :, None] == truth[:, None, :]) & (truth >= 0)[:, None, :]
            denom = np.maximum((truth >= 0).sum(axis=1), 1)
            recalls.append(float((hit.any(axis=1).sum(axis=1) / denom).mean()))
            times.append(dt)
        # fit on even sweep points, validate recall AND time on the
        # held-out odd points. The time constants (a, b) are fitted per
        # cell like the recall family - validating against the class
        # defaults measured the defaults, not the family (first run of
        # this script reported time MAPE ~45 that way)
        l_pad = size / idx.nlist
        xe = np.array(NPROBES, dtype=np.float64)[::2] * l_pad
        ye = np.array(times, dtype=np.float64)[::2] / np.log(size)
        A = np.vstack([xe, np.ones_like(xe)]).T
        (a_fit, b_fit), *_ = np.linalg.lstsq(A, ye, rcond=None)
        fit = fit_ivf_coverage(np.array(NPROBES)[::2],
                               np.array(recalls)[::2], l_pad=l_pad,
                               a=max(float(a_fit), 1e-12),
                               b=max(float(b_fit), 0.0))
        pred = [fit.recall(npb) for npb in NPROBES]
        held = [abs(pred[j] - recalls[j]) for j in range(1, len(NPROBES), 2)]
        pred_t = [fit.partition_time(size, npb) for npb in NPROBES]
        mape = float(np.mean([abs(pred_t[j] - times[j]) / max(times[j], 1e-12)
                              for j in range(1, len(NPROBES), 2)]))
        cell = {"n": int(size), "sel": float(sel), "nprobes": NPROBES,
                "measured_recall": [round(r, 4) for r in recalls],
                "predicted_recall": [round(p, 4) for p in pred],
                "measured_time_s": times,
                "heldout_recall_mae": round(float(np.mean(held)), 4),
                "time_mape": round(mape, 3),
                "fit": fit.to_dict()}
        cells.append(cell)
        print(f"n={size} sel={sel}: heldout MAE {cell['heldout_recall_mae']}"
              f"  time MAPE {mape:.2f}  recall@128 {recalls[-1]:.3f}",
              flush=True)
    del idx

out = {
    "config": f"IVF coverage family validation: {SIZES} x {SELS} x "
              f"nprobe {NPROBES}, clustered sift-like 1M, top-{TOPK}, "
              "fit (recall family AND time a,b) on even sweep points / MAE+MAPE on held-out odd points",
    "hardware": "TPU v5e (axon tunnel)",
    "cells": cells,
    "heldout_recall_mae": round(float(np.mean(
        [c["heldout_recall_mae"] for c in cells])), 4),
    "time_mape": round(float(np.mean([c["time_mape"] for c in cells])), 3),
    "hnsw_family_reference_mae": 0.044,
}
with open("results/ivf_coverage_validation_1m.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps({k: out[k] for k in ("heldout_recall_mae", "time_mape")}))
