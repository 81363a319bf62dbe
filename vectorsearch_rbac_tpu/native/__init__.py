"""ctypes bindings for the native runtime (libvsrbac_native.so).

Builds the shared library on demand with `make` (g++ is baked into the
image; pybind11 is not, so the boundary is a plain C ABI). All functions
degrade gracefully: `available()` is False when no compiler exists, and
callers fall back to pure-Python construction (slow, test-sized only).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from ..utils.logger import get_logger

logger = get_logger("native")

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libvsrbac_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # Always invoke make: its dependency check rebuilds when the C++ source
    # is newer than the library and is a no-op otherwise. Never trust a
    # stale/foreign binary (the .so is .gitignore'd, never committed).
    try:
        subprocess.run(
            ["make", "-s", "-C", _DIR],
            check=True, capture_output=True, timeout=300,
        )
    except Exception as e:  # no compiler / build failure -> fallback
        logger.warning("native build failed (%s); using python fallback", e)
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.warning("native load failed (%s); using python fallback", e)
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.vsr_hnsw_build.restype = ctypes.c_int
    lib.vsr_hnsw_build.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64, i32p, i32p, i32p,
    ]
    lib.vsr_hnsw_build_acorn.restype = ctypes.c_int
    lib.vsr_hnsw_build_acorn.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, i32p, i32p, i32p,
    ]
    lib.vsr_rng_prune.restype = ctypes.c_int
    lib.vsr_rng_prune.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int, i32p, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, i32p,
    ]
    lib.vsr_exact_knn.restype = ctypes.c_int
    lib.vsr_exact_knn.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int, f32p, ctypes.c_int64,
        ctypes.c_int, i32p, f32p,
    ]
    lib.vsr_insert_update.restype = ctypes.c_int
    lib.vsr_insert_update.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int, i32p, i32p, ctypes.c_int64,
        ctypes.c_int, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
        ctypes.c_int, ctypes.c_float, i32p, i32p, i32p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def hnsw_build(
    vectors: np.ndarray, m: int = 16, ef_construction: int = 64, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Build an HNSW graph. Returns (neighbors0 (n, 2m) int32, levels (n,),
    entry_point, max_level)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    vec = np.ascontiguousarray(vectors, dtype=np.float32)
    n, d = vec.shape
    nbr = np.full((n, 2 * m), -1, dtype=np.int32)
    levels = np.zeros(n, dtype=np.int32)
    entry = np.zeros(1, dtype=np.int32)
    max_level = lib.vsr_hnsw_build(
        _f32p(vec), n, d, m, ef_construction, seed,
        _i32p(nbr), _i32p(levels), _i32p(entry),
    )
    if max_level < 0:
        raise RuntimeError("vsr_hnsw_build failed")
    return nbr, levels, int(entry[0]), int(max_level)


def hnsw_build_acorn(
    vectors: np.ndarray, m: int = 16, m_beta: int = 64,
    ef_construction: int = 64, seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """ACORN-gamma densified HNSW build (reference acorn_benchmark/src/
    index_creation.cpp:105 gamma=12, M_beta=64): layer-0 lists hold a
    heuristic-selected navigable core of m edges plus the nearest pruned
    candidates up to m_beta — predicate-filtered traversal then keeps
    admissible edges even at low selectivity. Returns (neighbors0
    (n, m_beta) int32, levels (n,), entry_point, max_level)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    vec = np.ascontiguousarray(vectors, dtype=np.float32)
    n, d = vec.shape
    m_beta = max(m_beta, 2 * m)
    nbr = np.full((n, m_beta), -1, dtype=np.int32)
    levels = np.zeros(n, dtype=np.int32)
    entry = np.zeros(1, dtype=np.int32)
    max_level = lib.vsr_hnsw_build_acorn(
        _f32p(vec), n, d, m, m_beta, ef_construction, seed,
        _i32p(nbr), _i32p(levels), _i32p(entry),
    )
    if max_level < 0:
        raise RuntimeError("vsr_hnsw_build_acorn failed")
    return nbr, levels, int(entry[0]), int(max_level)


def rng_prune(
    vectors: np.ndarray, knn: np.ndarray, m: int = 16, alpha: float = 1.2
) -> np.ndarray:
    """Prune a kNN candidate graph into a navigable (n, 2m) adjacency."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    vec = np.ascontiguousarray(vectors, dtype=np.float32)
    knn = np.ascontiguousarray(knn, dtype=np.int32)
    n, d = vec.shape
    k = knn.shape[1]
    out = np.full((n, 2 * m), -1, dtype=np.int32)
    rc = lib.vsr_rng_prune(_f32p(vec), n, d, _i32p(knn), k, m,
                           ctypes.c_float(alpha), _i32p(out))
    if rc != 0:
        raise RuntimeError("vsr_rng_prune failed")
    return out


def exact_knn(
    vectors: np.ndarray, queries: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact CPU kNN (native oracle for tests)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    vec = np.ascontiguousarray(vectors, dtype=np.float32)
    q = np.ascontiguousarray(queries, dtype=np.float32)
    n, d = vec.shape
    nq = q.shape[0]
    ids = np.zeros((nq, k), dtype=np.int32)
    dists = np.zeros((nq, k), dtype=np.float32)
    rc = lib.vsr_exact_knn(_f32p(vec), n, d, _f32p(q), nq, k,
                           _i32p(ids), _f32p(dists))
    if rc != 0:
        raise RuntimeError("vsr_exact_knn failed")
    return ids, dists


def insert_update(
    vec_table: np.ndarray,   # (n_vec, d) f32 vector table
    vmap: np.ndarray,        # (npad,) local id -> vec_table row
    graph: np.ndarray,       # (npad, m0) int32, MUTATED IN PLACE
    cand: np.ndarray,        # (n_new, C) candidate local ids, -1 pads
    n_old: int,
    m: int,
    alpha: float = 1.2,
    nodes: "np.ndarray | None" = None,
) -> np.ndarray:
    """Online-insert edge update (forward alpha-RNG prune + reverse edges
    + shared-candidate peers) in C++ — the host hot loop of
    HNSWIndex.insert_rows. With `nodes` it runs in REFINE mode over those
    existing local ids (HNSWIndex.refine_rows): candidates add the current
    neighbor list, already-linked reverse targets are skipped, peers off.
    Returns the changed graph row ids (insert mode: old rows only — new
    rows always ship; refine mode: every touched row)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    vec = np.ascontiguousarray(vec_table, dtype=np.float32)
    vm = np.ascontiguousarray(vmap, dtype=np.int32)
    assert graph.dtype == np.int32 and graph.flags.c_contiguous
    cd = np.ascontiguousarray(cand, dtype=np.int32)
    n_new = cd.shape[0]
    changed = np.empty(n_new * m + n_new, dtype=np.int32)
    n_changed = ctypes.c_int32(len(changed))
    nd = None
    if nodes is not None:
        nd = np.ascontiguousarray(nodes, dtype=np.int32)
        assert len(nd) == n_new
    rc = lib.vsr_insert_update(
        _f32p(vec), vec.shape[0], vec.shape[1], _i32p(vm), _i32p(graph),
        graph.shape[0], graph.shape[1], _i32p(cd), n_new, cd.shape[1],
        n_old, m, ctypes.c_float(alpha), _i32p(changed),
        ctypes.byref(n_changed),
        _i32p(nd) if nd is not None else ctypes.cast(None, ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"vsr_insert_update failed ({rc})")
    return changed[: n_changed.value]
