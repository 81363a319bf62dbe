"""Cold-start serving measurement (VERDICT-r3 item 5): persist the full
built serving state, then measure load -> first-query in a FRESH process
— the TPU analog of the reference's disk-resident pgvector indexes and
its ACORN suite's read-index-from-disk cold path
(acorn_benchmark/src/acorn_search.cpp:144).

Phases (separate OS processes so nothing warm leaks into the load path):
  build — generate corpus + world, build the int8 arena and two serving
          engines (global RLS Int8FlatIndex; role-partition
          TiledSearcher), snapshot everything, and time the same
          first-query milestones for comparison.
  load  — restore arena + tiled engine from snapshots (no corpus, no
          quantization, no packing), run the first query batch, report
          disk/upload/compile/first-query split.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/cold_start_bench.py
Writes results/cold_start.json.
"""

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/artifacts/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import argparse
import json
import os
import subprocess
import sys
import time

N = int(os.environ.get("COLDSTART_N", 1_000_000))
SNAP_DIR = "/root/repo/artifacts/coldstart"
OUT = ("/root/repo/results/cold_start.json" if N == 1_000_000
       else f"/root/repo/results/cold_start_{N // 1_000_000}m.json")


def _queries(corpus_dim, world, k=100, nq=2048):
    import numpy as np

    rng = np.random.default_rng(5)
    q = rng.integers(0, 256, (nq, corpus_dim)).astype(np.float32)
    users = rng.integers(0, world.num_users, nq)
    return q, users, world.user_masks[users]


def phase_build():
    import numpy as np

    from vectorsearch_rbac_tpu.core import Corpus, build_device_arena
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex
    from vectorsearch_rbac_tpu.partition.strategies import build_role_searcher
    from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
    from vectorsearch_rbac_tpu.utils.config import FrameworkConfig
    from vectorsearch_rbac_tpu.utils.persist import (
        save_arena_snapshot, save_pickle,
    )

    os.makedirs(SNAP_DIR, exist_ok=True)
    rep = {}
    t0 = time.perf_counter()
    cpath = f"/root/repo/artifacts/corpus_sift1m_{N}_0.npz"
    if os.path.exists(cpath):
        z = np.load(cpath)
        corpus = Corpus(vectors=z["vectors"], doc_ids=z["doc_ids"],
                        block_ids=z["block_ids"])
    else:
        from vectorsearch_rbac_tpu.data import sift_like_corpus

        corpus, _ = sift_like_corpus(num_vectors=N, blocks_per_doc=100,
                                     seed=0)
        np.savez(cpath, vectors=corpus.vectors, doc_ids=corpus.doc_ids,
                 block_ids=corpus.block_ids)
    rep["corpus_load_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                              num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                              seed=0).generate()
    rep["world_gen_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    arena = build_device_arena(corpus, world, block_rows=131072,
                               dtype="int8")
    rep["arena_build_s"] = time.perf_counter() - t0   # quantize + upload

    q, users, masks = _queries(corpus.dim, world)

    t0 = time.perf_counter()
    idx = Int8FlatIndex(arena, None, query_batch=2048, q_tile=2048,
                        block_rows=8192, group=128, wire="ids")
    idx.set_user_table(world.user_masks)
    d_, i_ = idx.search(q, masks, 100)
    rep["rls_build_plus_first_query_s"] = time.perf_counter() - t0

    cfg = FrameworkConfig(seed=0)
    cfg.index.kind = "flat_approx"
    t0 = time.perf_counter()
    tiled = build_role_searcher(corpus, world, arena, cfg)
    rep["tiled_build_s"] = time.perf_counter() - t0   # pack + upload
    t0 = time.perf_counter()
    tiled.search_batch(q[:256], users[:256], world.user_masks, 100)
    rep["tiled_first_query_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    save_arena_snapshot(arena, f"{SNAP_DIR}/arena_{N}.npz")
    tiled.save_snapshot(f"{SNAP_DIR}/tiled_role_{N}.npz")
    save_pickle(world, f"{SNAP_DIR}/world.pkl")
    rep["snapshot_save_s"] = time.perf_counter() - t0
    rep["snapshot_bytes"] = (
        os.path.getsize(f"{SNAP_DIR}/arena_{N}.npz")
        + os.path.getsize(f"{SNAP_DIR}/tiled_role_{N}.npz"))
    print("BUILD " + json.dumps(rep), flush=True)


def phase_load():
    from vectorsearch_rbac_tpu.index.flat_int8 import Int8FlatIndex
    from vectorsearch_rbac_tpu.partition.tiled import TiledSearcher
    from vectorsearch_rbac_tpu.utils.persist import (
        load_arena_snapshot, load_pickle,
    )

    rep = {}
    t_all = time.perf_counter()
    t0 = time.perf_counter()
    world = load_pickle(f"{SNAP_DIR}/world.pkl")
    arena = load_arena_snapshot(f"{SNAP_DIR}/arena_{N}.npz")
    rep["arena_load_s"] = time.perf_counter() - t0    # disk + device_put

    q, users, masks = _queries(arena.dim, world)

    t0 = time.perf_counter()
    idx = Int8FlatIndex(arena, None, query_batch=2048, q_tile=2048,
                        block_rows=8192, group=128, wire="ids")
    idx.set_user_table(world.user_masks)
    d_, i_ = idx.search(q[:2048], masks[:2048], 100)
    rep["rls_first_query_s"] = time.perf_counter() - t0
    rep["rls_load_to_first_query_s"] = time.perf_counter() - t_all

    t0 = time.perf_counter()
    user_to_roles = world.user_to_roles
    import numpy as np
    data = np.load(f"{SNAP_DIR}/tiled_role_{N}.npz", allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    pids = set(int(p) for p in meta["part_chunks"]) | set(
        int(p) for p in meta["big"])

    def router(uid):
        return tuple(r for r in user_to_roles.get(uid, ()) if r in pids)

    tiled = TiledSearcher.from_snapshot(arena, router,
                                        f"{SNAP_DIR}/tiled_role_{N}.npz")
    rep["tiled_restore_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    tiled.search_batch(q[:256], users[:256], world.user_masks, 100)
    rep["tiled_first_query_s"] = time.perf_counter() - t0
    rep["total_cold_start_s"] = time.perf_counter() - t_all
    print("LOAD " + json.dumps(rep), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="")
    a = ap.parse_args()
    if a.phase == "build":
        return phase_build()
    if a.phase == "load":
        return phase_load()
    # driver: run both phases as fresh processes, merge reports
    out = {}
    for phase in ("build", "load"):
        p = subprocess.run(
            [sys.executable, __file__, "--phase", phase],
            capture_output=True, text=True, timeout=3000,
            env=dict(os.environ,
                     PYTHONPATH="/root/repo:/root/.axon_site"))
        sys.stderr.write(p.stderr[-2000:])
        for line in p.stdout.splitlines():
            if line.startswith(("BUILD ", "LOAD ")):
                tag, payload = line.split(" ", 1)
                out[tag.lower()] = json.loads(payload)
        if p.returncode:
            print(p.stdout[-2000:])
            sys.exit(p.returncode)
    out["note"] = (
        "load phase is a FRESH process restoring arena + tiled engine "
        "from npz snapshots: no corpus read, no quantization, no packing. "
        "First-query times include XLA compilation of the serving "
        "executables (paid once per process; the jax persistent "
        "compilation cache, when enabled, removes most of it).")
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
