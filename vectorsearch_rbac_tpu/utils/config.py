"""Typed framework configuration.

One dataclass replaces the reference's four config mechanisms: root
config.json (reference services/config.py:6-32), basic_benchmark/
config_params.json, the runtime-mutated empty module basic_benchmark/
efconfig.py (reference basic_benchmark/test_all.py:58), and scattered env
vars. No database credentials exist here: the storage engine is the device
HBM arena, not Postgres.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class SearchConfig:
    """Per-query-path knobs (replaces GUCs hnsw.ef_search / ivfflat.probes)."""

    topk: int = 10
    ef_search: int = 40          # HNSW beam width (reference pgvector/src/hnsw.c:86)
    nprobe: int = 16             # IVF probes (reference config_params.json "nprobe")
    batch_size: int = 256        # queries per device dispatch
    block_rows: int = 16384      # arena rows per scan block
    dtype: str = "float32"       # compute dtype for distance scans
    recall_target: float = 0.95  # per-block PartialReduce target (approx scans)
    scan_group: int = 32         # tiled chunk engine epilogue: packed
                                 # group-min width (0 = exact per-chunk
                                 # top-k; see ops/tiled_scan.py)
    wire_dist: str = "u8"        # global-path result-distance wire coding:
                                 # "u8" per-query affine byte (3.6 B/result,
                                 # measured 40k -> 71k QPS through the
                                 # tunnel), "bf16", "f32" (exact), or "ids"
                                 # (no distances: u16 count + 20-bit ids,
                                 # 2.52 B/result — the reference baseline's
                                 # own id-only result protocol; callers get
                                 # rank pseudo-dists)


@dataclass
class IndexConfig:
    """Index-build knobs (replaces CREATE INDEX WITH(...) parameters,
    reference controller/initialize_main_tables.py:109-113)."""

    kind: str = "flat"           # flat | flat_approx | ivf | hnsw | hybrid
                                 # | binary (bit-packed hamming + rerank,
                                 # the pgvector bit(d)/binary_quantize
                                 # analog, index/binary.py)
    hnsw_m: int = 16
    hnsw_ef_construction: int = 64
    hnsw_m_beta: int = 0         # > 0: ACORN-gamma dense layer-0 lists of
                                 # this width (reference index_creation.cpp
                                 # gamma=12 M_beta=64) for filtered search
    ivf_nlist: int = 1024
    ivf_kmeans_iters: int = 10
    # hybrid (dynamic partitions): a partition serves from an HNSW graph
    # only when every comb routed to it keeps within-partition selectivity
    # >= this threshold; mixed partitions fall back to the fused flat scan
    # (graph traversal under partial filters structurally under-delivers —
    # see results/anonysys_hnsw_1m.json and PERF.md index-selection table)
    hybrid_sel_threshold: float = 0.5
    # graph partitions serve from the SHARED arena via row_map indirection
    # (no per-partition vector copies — the reference's pointer/logical
    # partition mode, shared_vector_table.h) and become batchable into
    # multi-partition slab dispatches (partition/graph_batch.py)
    hnsw_logical: bool = False
    # binary (bit-packed) index knobs — index/binary.py
    binary_rerank: bool = True       # exact rerank from the shared arena
    binary_rerank_mult: int = 4      # candidate width = mult * k
    binary_bit_metric: str = "hamming"   # "hamming" <~> | "jaccard" <%>
    # big-tier partitions (> big_chunks in the tiled engine) serve from
    # the SHARED arena via row-map gather instead of a contiguous int8
    # copy — the flat-scan analog of hnsw_logical. Trades a per-pass
    # gather for zero duplication; REQUIRED at 10M-scale alpha>1 layouts
    # where gathered big-tier copies alone exceed HBM
    big_logical: bool = False


@dataclass
class OptimizerConfig:
    """AnonySys dynamic-partition knobs (reference
    AnonySys_dynamic_partition.py:730-741)."""

    storage_alpha: float = 1.5   # storage budget multiple of corpus size
    target_recall: Optional[float] = None
    topk: int = 10
    # fitted model parameters; refit on-device via models.fitting
    recall_k: float = 1.0
    recall_beta: float = 0.44240961   # reference hnsw/helper.py:160
    qps_a: float = 550.97             # reference hnsw/helper.py:224
    qps_b: float = 183157.0
    join_time: float = 0.0
    ef_offset: float = 0.0            # models/cost.py extensions (0 = the
    n_ref: float = 0.0                # reference's n-free 2-parameter
    gamma_n: float = 0.0              # family)


@dataclass
class FrameworkConfig:
    seed: int = 0
    dataset_path: str = ""
    artifact_dir: str = "artifacts"   # caches: ground truth, fitted params, layouts
    search: SearchConfig = field(default_factory=SearchConfig)
    index: IndexConfig = field(default_factory=IndexConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "FrameworkConfig":
        sub = {
            "search": SearchConfig,
            "index": IndexConfig,
            "optimizer": OptimizerConfig,
        }
        kwargs: dict[str, Any] = {}
        for k, v in d.items():
            if k in sub and isinstance(v, dict):
                kwargs[k] = sub[k](**v)
            else:
                kwargs[k] = v
        return cls(**kwargs)


def load_config(path: str | None = None) -> FrameworkConfig:
    """Load config from JSON file; fall back to defaults.

    Search order: explicit path, $VSRBAC_CONFIG, ./vsrbac_config.json.
    """
    candidates = [path, os.environ.get("VSRBAC_CONFIG"), "vsrbac_config.json"]
    for cand in candidates:
        if cand and os.path.exists(cand):
            with open(cand) as f:
                return FrameworkConfig.from_dict(json.load(f))
    return FrameworkConfig()
