"""Command-line drivers.

One CLI replaces the reference's driver zoo (reference README.md:141-229):
common_prepare_pipeline.py, services/rbac_generator/store_*.py,
basic_benchmark/generate_queries.py, compute_ground_truth.py,
AnonySys_dynamic_partition.py and basic_benchmark/test_all.py. State
between commands lives in an artifact directory (pickled world, query
dataset JSON, ground-truth cache, plan pickle) instead of Postgres tables.

Usage:
  python -m vectorsearch_rbac_tpu.cli prepare --dataset sift1m --n 1000000 \\
      --generator tree --num-roles 100 --num-users 10000
  python -m vectorsearch_rbac_tpu.cli generate-queries --num-queries 1000 --topk 10
  python -m vectorsearch_rbac_tpu.cli plan-dynamic --storage 2.0 --recall 0.95
  python -m vectorsearch_rbac_tpu.cli test --algorithm AnonySys --efs 40
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import time

import numpy as np

from .utils.logger import get_logger

logger = get_logger("cli")

# reference test_all.py:34 --algorithm {RLS, ROLE, USER, AnonySys, QDTree}
ALGORITHM_TO_STRATEGY = {
    "RLS": "rls",
    "ROLE": "role",
    "USER": "user",
    "AnonySys": "dynamic",
    "QDTree": "qdtree",
}


def _art(args, name: str) -> str:
    os.makedirs(args.artifacts, exist_ok=True)
    return os.path.join(args.artifacts, name)


def _load_state(args):
    with open(_art(args, "state.pkl"), "rb") as f:
        return pickle.load(f)


def cmd_prepare(args) -> None:
    """Dataset + RBAC world + persisted state (replaces
    common_prepare_pipeline.py + store_*_rbac_generate_data.py)."""
    from .data import resolve_dataset
    from .rbac.generators import GENERATORS

    corpus, query_pool = resolve_dataset(
        args.dataset, dataset_path=args.dataset_path,
        num_vectors=args.n, seed=args.seed,
    )
    gen_cls = GENERATORS[args.generator]
    kwargs = dict(num_users=args.num_users, num_docs=corpus.num_docs,
                  seed=args.seed)
    if args.generator == "erbac":
        kwargs["n_froles"] = args.num_roles
    elif args.generator == "arxiv_business":
        kwargs["num_categories"] = args.num_roles
    else:
        kwargs["num_roles"] = args.num_roles
    world = gen_cls(**kwargs).generate()
    state = {
        "dataset": args.dataset, "dataset_path": args.dataset_path,
        "n": args.n, "seed": args.seed, "generator": args.generator,
        "world": world, "query_pool": query_pool,
    }
    with open(_art(args, "state.pkl"), "wb") as f:
        pickle.dump(state, f)
    logger.info(
        "prepared: corpus %d x %d, %d roles, %d users, avg user sel %.4f",
        corpus.n, corpus.dim, world.num_roles, world.num_users,
        world.average_user_selectivity(),
    )


def _corpus_from_state(state):
    from .data import resolve_dataset

    corpus, _ = resolve_dataset(
        state["dataset"], dataset_path=state.get("dataset_path", ""),
        num_vectors=state["n"], seed=state["seed"],
    )
    return corpus


def cmd_generate_queries(args) -> None:
    """Replaces basic_benchmark/generate_queries.py (clears the GT cache on
    regeneration, reference generate_queries.py:90-92)."""
    from .bench import generate_query_workload

    state = _load_state(args)
    corpus = _corpus_from_state(state)
    if args.per_role > 0:
        from .bench import generate_query_workload_for_roles

        wl = generate_query_workload_for_roles(
            corpus, state["world"], queries_per_role=args.per_role,
            topk=args.topk, repetitions=args.repetitions,
            query_pool=state.get("query_pool"), seed=args.seed + 1,
        )
    else:
        wl = generate_query_workload(
            corpus, state["world"], num_queries=args.num_queries, topk=args.topk,
            zipf_param=args.zipf, repetitions=args.repetitions,
            query_pool=state.get("query_pool"), seed=args.seed + 1,
        )
    wl.save_json(_art(args, "query_dataset.json"))
    for f in os.listdir(args.artifacts):
        if f.startswith("gt_"):
            os.remove(os.path.join(args.artifacts, f))
    logger.info("wrote %d queries (topk=%d)", wl.num_queries, args.topk)


def _apply_tombstones(state, corpus, arena):
    """Zero the role bits of rows orphaned by delete-role (pgvector's
    deleted-until-VACUUM semantics, hnswvacuum.c) — every scan, kernel,
    and graph admissibility check then rejects them."""
    docs = state.get("tombstoned_docs")
    if not docs:
        return arena
    from .core import tombstone_rows

    rows = corpus.rows_for_docs(np.asarray(docs, dtype=np.int64))
    logger.info("tombstoned %d rows of %d orphaned docs", len(rows), len(docs))
    return tombstone_rows(arena, rows)


def _planner_inputs(args, world, corpus, *, alpha: float, topk: int,
                    recall=None):
    """PlannerInputs from artifacts: fitted params + workload weights when
    cached (the reference's parameter_hnsw.json / query-weight reuse,
    AnonySys_dynamic_partition.py:69-112,795-832)."""
    from .bench.queries import QueryWorkload
    from .models.cost import CostModelParams
    from .partition.dynamic import (
        PlannerInputs, comb_weights_from_workload,
        single_role_weights_from_workload,
    )

    params = CostModelParams()
    for name in ("parameter_hnsw.json", "parameter_ivf.json",
                 "parameter_model.json"):
        pfile = _art(args, name)
        if os.path.exists(pfile):
            with open(pfile) as f:
                params = CostModelParams.from_dict(json.load(f))
            logger.info("loaded fitted params from %s", pfile)
            break

    qfile = _art(args, "query_dataset.json")
    if os.path.exists(qfile):
        wl = QueryWorkload.load_json(qfile)
        comb_w = comb_weights_from_workload(world, wl)
        single_w = single_role_weights_from_workload(world, wl)
    else:
        comb_w = world.comb_weights
        single_w = {r: 1.0 / max(world.num_roles, 1) for r in range(world.num_roles)}

    return PlannerInputs(
        role_to_docs=world.role_to_docs, combs=world.combs,
        comb_weights=comb_w, single_role_weights=single_w,
        params=params, alpha=alpha, topk=topk,
        target_recall=recall,
        avg_blocks_per_doc=corpus.avg_blocks_per_doc,
    )


def cmd_plan_dynamic(args) -> None:
    """Replaces AnonySys_dynamic_partition.py __main__ (--storage alpha,
    --recall r; cached fitted params analog = --params json)."""
    from .partition.dynamic import plan_dynamic_partitions

    state = _load_state(args)
    world = state["world"]
    corpus = _corpus_from_state(state)
    inputs = _planner_inputs(args, world, corpus, alpha=args.storage,
                             topk=args.topk, recall=args.recall)
    t0 = time.perf_counter()
    plan = plan_dynamic_partitions(world, inputs)
    with open(_art(args, "dynamic_plan.pkl"), "wb") as f:
        pickle.dump(plan, f)
    logger.info("planned %d partitions in %.1fs (alpha=%.2f)",
                len(plan.assignment), time.perf_counter() - t0, args.storage)


def _backup_artifact(args, name: str) -> None:
    """Snapshot an artifact before a maintenance mutation (the reference's
    pg_dump backup around insertion/deletion experiments,
    insertion_rolllback.py:5 / deletion_rolllback.py:5-42)."""
    import shutil

    path = _art(args, name)
    if os.path.exists(path):
        shutil.copyfile(path, path + ".bak")


def _clear_gt_cache(args) -> None:
    for f in os.listdir(args.artifacts):
        if f.startswith("gt_"):
            os.remove(os.path.join(args.artifacts, f))


def cmd_insert_role(args) -> None:
    """Online role insertion experiment (reference insertion.py __main__:
    new role samples ~1/num_roles of each existing role's documents,
    insertion.py:507-513, then insert_new_role picks the argmin-cost
    partition and update_database_for_new_role persists). Backs up
    state.pkl/dynamic_plan.pkl first; `rollback` restores them."""
    from .partition.dynamic import insert_role
    from .rbac.world import RBACWorld

    state = _load_state(args)
    world = state["world"]
    corpus = _corpus_from_state(state)
    pfile = _art(args, "dynamic_plan.pkl")
    if not os.path.exists(pfile):
        raise SystemExit("insert-role requires a dynamic plan: run "
                         "plan-dynamic first")
    with open(pfile, "rb") as f:
        plan = pickle.load(f)

    rng = np.random.default_rng(args.seed)
    new_role = world.num_roles
    if args.docs > 0:
        pool = np.arange(world.num_docs)
        new_docs = set(int(d) for d in rng.choice(
            pool, size=min(args.docs, world.num_docs), replace=False))
    else:
        # reference sampling: ratio = 1/num_roles of every existing role's
        # documents (insertion.py:507-513; 5% floor only when no roles)
        ratio = 1.0 / world.num_roles if world.num_roles > 0 else 0.05
        new_docs = set()
        for docs in world.role_to_docs.values():
            docs = np.fromiter(docs, dtype=np.int64, count=len(docs))
            take = max(1, int(len(docs) * ratio))
            new_docs.update(int(d) for d in rng.choice(
                docs, size=min(take, len(docs)), replace=False))

    n_assign = args.assign_users if args.assign_users > 0 else max(
        1, world.num_users // 100)
    assignees = rng.choice(world.num_users, size=min(n_assign, world.num_users),
                           replace=False)
    u2r = dict(world.user_to_roles)
    for u in assignees:
        u = int(u)
        u2r[u] = tuple(sorted(set(u2r.get(u, ())) | {new_role}))
    r2d = dict(world.role_to_docs)
    r2d[new_role] = frozenset(new_docs)
    new_world = RBACWorld(num_users=world.num_users,
                          num_roles=world.num_roles + 1,
                          num_docs=world.num_docs,
                          user_to_roles=u2r, role_to_docs=r2d)

    inputs = _planner_inputs(args, new_world, corpus,
                             alpha=args.storage, topk=args.topk)
    combs_with_role = {c for c in new_world.combs if new_role in c}
    combs_with_role.add((new_role,))

    _backup_artifact(args, "state.pkl")
    _backup_artifact(args, "dynamic_plan.pkl")
    plan2, pid = insert_role(plan, inputs, new_role, new_docs,
                             combs_with_role=combs_with_role)
    with open(pfile, "wb") as f:
        pickle.dump(plan2, f)
    state["world"] = new_world
    with open(_art(args, "state.pkl"), "wb") as f:
        pickle.dump(state, f)
    _clear_gt_cache(args)  # user masks changed
    logger.info("inserted role %d (%d docs, %d users) into partition %d; "
                "rollback with the `rollback` subcommand",
                new_role, len(new_docs), len(assignees), pid)
    print(json.dumps({"new_role": new_role, "num_docs": len(new_docs),
                      "assigned_users": len(assignees), "partition": pid,
                      "num_partitions": len(plan2.assignment)}))


def cmd_delete_role(args) -> None:
    """Online role deletion experiment (reference deletion.py
    delete_role_and_related_data:8-80: cascade user/permission/mapping
    removal + per-partition doc pruning). Documents readable only via the
    deleted role are recorded in state as tombstoned: `test` zeroes their
    rows' role bits in the arena (core.tombstone_rows — the analog of the
    reference dropping the role's rows with its table)."""
    from .partition.dynamic import delete_role
    from .partition.dynamic.maintenance import orphaned_docs_after_role_delete
    from .rbac.world import RBACWorld

    state = _load_state(args)
    world = state["world"]
    corpus = _corpus_from_state(state)
    role = args.role
    if role not in world.role_to_docs:
        raise SystemExit(f"role {role} does not exist")
    pfile = _art(args, "dynamic_plan.pkl")
    if not os.path.exists(pfile):
        raise SystemExit("delete-role requires a dynamic plan: run "
                         "plan-dynamic first")
    with open(pfile, "rb") as f:
        plan = pickle.load(f)

    orphaned = orphaned_docs_after_role_delete(world, role)
    u2r = {}
    for u, roles in world.user_to_roles.items():
        u2r[u] = tuple(r for r in roles if r != role)
    r2d = {r: d for r, d in world.role_to_docs.items() if r != role}
    # role ids stay positional (the reference keeps ids sparse after
    # DELETE FROM Roles); num_roles is unchanged so mask widths hold
    new_world = RBACWorld(num_users=world.num_users, num_roles=world.num_roles,
                          num_docs=world.num_docs,
                          user_to_roles=u2r, role_to_docs=r2d)

    inputs = _planner_inputs(args, new_world, corpus,
                             alpha=args.storage, topk=args.topk)

    _backup_artifact(args, "state.pkl")
    _backup_artifact(args, "dynamic_plan.pkl")
    plan2 = delete_role(plan, inputs, role)
    with open(pfile, "wb") as f:
        pickle.dump(plan2, f)
    state["world"] = new_world
    tomb = set(state.get("tombstoned_docs", ())) | orphaned
    state["tombstoned_docs"] = sorted(tomb)
    with open(_art(args, "state.pkl"), "wb") as f:
        pickle.dump(state, f)
    _clear_gt_cache(args)
    logger.info("deleted role %d: %d partitions remain, %d docs orphaned "
                "(tombstoned at serve time); rollback with `rollback`",
                role, len(plan2.assignment), len(orphaned))
    print(json.dumps({"deleted_role": role, "orphaned_docs": len(orphaned),
                      "num_partitions": len(plan2.assignment)}))


def cmd_compute_ground_truth(args) -> None:
    """Precompute + cache exact ground truth for the query dataset
    (reference basic_benchmark/compute_ground_truth.py: batch exact kNN
    into ground_truth_cache.json, plus the pointer-style (doc, block)
    form, compute_ground_truth.py:35 to_pointer_results)."""
    from .bench import GroundTruthOracle
    from .bench.queries import QueryWorkload
    from .core import build_device_arena

    state = _load_state(args)
    world = state["world"]
    corpus = _corpus_from_state(state)
    qfile = _art(args, "query_dataset.json")
    if not os.path.exists(qfile):
        raise SystemExit("no query_dataset.json: run generate-queries first")
    wl = QueryWorkload.load_json(qfile)

    arena = _apply_tombstones(state, corpus, build_device_arena(
        corpus, world, block_rows=args.block_rows, dtype="float32",
        metric=args.metric))
    oracle = GroundTruthOracle(arena, cache_dir=args.artifacts,
                               block_rows=args.block_rows)
    t0 = time.perf_counter()
    idx = oracle.compute(corpus, world, wl, args.topk)
    dt = time.perf_counter() - t0
    # pointer-style results: arena row -> (doc_id, block_id), -1 pads kept
    pointer = [
        [[int(corpus.doc_ids[r]), int(corpus.block_ids[r])] if r >= 0
         else [-1, -1] for r in row]
        for row in np.asarray(idx)
    ]
    out = _art(args, "ground_truth_cache.json")
    with open(out, "w") as f:
        json.dump({"topk": args.topk, "num_queries": int(idx.shape[0]),
                   "results": pointer}, f)
    logger.info("ground truth for %d queries (top-%d) in %.1fs -> %s",
                idx.shape[0], args.topk, dt, out)


def cmd_serve(args) -> None:
    """Closed-loop online serving over the prepared artifacts: C client
    threads submit single queries from query_dataset.json through the
    micro-batching front-end (serving.BatchingServer) for a fixed wall
    window. The online counterpart of `test` (which measures the offline
    big-batch protocol); reports achieved QPS, latency percentiles, and
    realized device batch sizes."""
    import threading

    from .bench.queries import QueryWorkload
    from .core import build_device_arena
    from .partition import build_searcher
    from .serving import BatchingServer
    from .utils.config import FrameworkConfig

    state = _load_state(args)
    world = state["world"]
    corpus = _corpus_from_state(state)
    cfg = FrameworkConfig(seed=state["seed"])
    cfg.search.block_rows = args.block_rows
    cfg.index.kind = args.index
    cfg.search.ef_search = args.efs

    arena = _apply_tombstones(state, corpus, build_device_arena(
        corpus, world, block_rows=cfg.search.block_rows, dtype=args.dtype))
    kwargs = {}
    strategy = ALGORITHM_TO_STRATEGY[args.algorithm]
    if strategy == "dynamic":
        pfile = _art(args, "dynamic_plan.pkl")
        if os.path.exists(pfile):
            with open(pfile, "rb") as f:
                kwargs["plan"] = pickle.load(f)
    searcher = build_searcher(strategy, corpus, world, arena, cfg, **kwargs)

    qfile = _art(args, "query_dataset.json")
    if os.path.exists(qfile):
        wl = QueryWorkload.load_json(qfile)
        pool_q, pool_u = wl.vectors, wl.user_ids
    else:
        from .bench import generate_query_workload

        wl = generate_query_workload(corpus, world, num_queries=1024,
                                     topk=args.topk,
                                     query_pool=state.get("query_pool"),
                                     seed=state["seed"] + 1)
        pool_q, pool_u = wl.vectors, wl.user_ids

    # warm compiles outside the measured window
    searcher.search_batch(pool_q[:16], pool_u[:16], world.user_masks,
                          args.topk)

    lat_ms: list = []
    lat_lock = threading.Lock()
    stop = threading.Event()
    with BatchingServer(searcher, world.user_masks, max_batch=args.max_batch,
                        max_wait_ms=args.max_wait_ms) as srv:
        def client(seed):
            r = np.random.default_rng(seed)
            local = []
            while not stop.is_set():
                j = int(r.integers(0, len(pool_q)))
                res = srv.search(pool_q[j], int(pool_u[j]), args.topk,
                                 timeout=120)
                local.append(res.latency_ms)
            with lat_lock:
                lat_ms.extend(local)

        threads = [threading.Thread(target=client, args=(7000 + i,))
                   for i in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        time.sleep(args.duration)
        stop.set()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        stats = srv.stats()

    lat = np.asarray(lat_ms) if lat_ms else np.zeros(1)
    report = {
        "algorithm": args.algorithm, "clients": args.clients,
        "duration_s": wall, "requests": int(len(lat_ms)),
        "qps": len(lat_ms) / wall,
        "p50_ms": float(np.percentile(lat, 50)),
        "p95_ms": float(np.percentile(lat, 95)),
        "p99_ms": float(np.percentile(lat, 99)),
        "avg_batch": stats["avg_batch"], "dispatches": stats["dispatches"],
    }
    out = _art(args, "serve_results.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    logger.info("served %d requests at %.0f QPS (p50 %.1f ms)",
                report["requests"], report["qps"], report["p50_ms"])
    print(json.dumps(report))


def cmd_rollback(args) -> None:
    """Restore state.pkl + dynamic_plan.pkl from the pre-maintenance
    snapshots (reference {insertion,deletion}_rolllback.py: dropdb +
    pg_restore of the pre-experiment dump)."""
    import shutil

    restored = []
    for name in ("state.pkl", "dynamic_plan.pkl"):
        bak = _art(args, name) + ".bak"
        if os.path.exists(bak):
            shutil.copyfile(bak, _art(args, name))
            restored.append(name)
    if not restored:
        raise SystemExit("no .bak snapshots found — nothing to roll back")
    _clear_gt_cache(args)
    logger.info("rolled back: %s", ", ".join(restored))


def cmd_fit_params(args) -> None:
    """Fit (k, beta, a, b) by sweeping the index's search-width knob against
    exact ground truth — replaces the reference's EXPLAIN ANALYZE fitting
    pipeline (controller/dynamic_partition/get_parameter.py:135-185,
    analysis_hnsw_recall.py / analysis_hnsw_qps.py); results cached like
    parameter_hnsw.json (AnonySys_dynamic_partition.py:795-832)."""
    import numpy as np

    from .bench import GroundTruthOracle, generate_query_workload
    from .core import build_device_arena
    from .index.hnsw import HNSWIndex
    from .index.ivf import IVFIndex
    from .models.validate import sweep_search_width, validate_models
    from .utils.persist import save_params

    state = _load_state(args)
    world = state["world"]
    corpus = _corpus_from_state(state)
    arena = build_device_arena(corpus, world, block_rows=args.block_rows,
                               dtype=args.dtype)

    wl = generate_query_workload(corpus, world, num_queries=args.num_queries,
                                 topk=args.topk,
                                 query_pool=state.get("query_pool"),
                                 seed=state["seed"] + 2)
    gt_arena = arena if args.dtype == "float32" else build_device_arena(
        corpus, world, block_rows=args.block_rows, dtype="float32")
    oracle = GroundTruthOracle(gt_arena, cache_dir=args.artifacts,
                               block_rows=args.block_rows)
    truth = oracle.compute(corpus, world, wl, args.topk)
    masks = world.user_masks[wl.user_ids]

    def make_index(rows=None):
        if args.index == "hnsw":
            idx = HNSWIndex(arena, rows=rows, m=16, ef_construction=64,
                            query_batch=1024, seed=state["seed"])
            return idx, lambda q, m, k, ef: idx.search(q, m, k, ef_search=ef)
        idx = IVFIndex(arena, rows=rows, nlist=args.nlist, query_batch=1024,
                       seed=state["seed"])
        return idx, lambda q, m, k, ef: idx.search(q, m, k, nprobe=ef)

    # (k, beta, ef_offset): sweep the global index at the workload's average
    # selectivity (reference get_parameter.py:135-185 fits on the RLS index)
    _, search_fn = make_index()
    sweep = sweep_search_width(search_fn, wl.vectors, masks, truth,
                               args.topk, args.efs)
    sel = float(np.mean(wl.selectivities))

    # (a, b): the log(n) factor must be FIT, not assumed — sweep subset
    # indexes at several sizes and fit jointly (the round-1 single-n fit
    # left log(n) unvalidated; reference analysis_hnsw_qps.py:260-334)
    from .models.fitting import (
        fit_join_time, fit_qps_params, fit_recall_params,
    )

    rng = np.random.default_rng(state["seed"] + 7)
    sizes = sorted({max(2048, corpus.n // f) for f in (8, 4, 2, 1)})
    qn, qe, qt = [], [], []
    for size in sizes:
        rows = (None if size >= corpus.n
                else np.sort(rng.choice(corpus.n, size, replace=False)))
        _, sfn = make_index(rows)
        ssweep = sweep_search_width(sfn, wl.vectors, masks, truth,
                                    args.topk, args.efs, timing_reps=1)
        qn += [size] * len(args.efs)
        qe += list(ssweep["efs"])
        qt += ssweep["times_s"]

    # join_time: per-partition probe overhead J (the TPU analog of the
    # reference's SubPlan-2 join-time regression, analysis_hnsw_qps.py:371).
    # fit_join_time's premise is a FIXED total row count split over m
    # partitions, so the slope of t(m) isolates dispatch+merge overhead;
    # probing one index m times would fold the whole scan cost into the
    # slope and bias plans toward fewer/larger partitions (ADVICE r2).
    ef_j = args.efs[len(args.efs) // 2]
    base_rows = np.sort(rng.choice(corpus.n, min(sizes[0], corpus.n),
                                   replace=False))
    jm, jt = [], []
    for m_probes in (1, 2, 4):
        fns = [make_index(np.sort(part))[1]
               for part in np.array_split(base_rows, m_probes)]
        for fn in fns:   # warm: compile outside the timed region
            fn(wl.vectors, masks, args.topk, ef_j)
        t0 = time.perf_counter()
        for fn in fns:
            fn(wl.vectors, masks, args.topk, ef_j)
        jm.append(m_probes)
        jt.append((time.perf_counter() - t0) / len(wl.vectors))
    join_time = fit_join_time(jm, jt)

    a, b = fit_qps_params(qn, qe, qt)
    if args.index == "ivf":
        # IVF recall is coverage-shaped, not piecewise (the round-2
        # artifact's finding, results/ivf_model_validation_1m.json):
        # fit + persist the coverage family behind the same interface
        from .models.fitting import fit_ivf_coverage

        idx_obj, _ = make_index()
        params = fit_ivf_coverage(sweep["efs"], sweep["recalls"],
                                  l_pad=getattr(idx_obj, "l_pad", 1024),
                                  a=a, b=b)
        pred = np.asarray([params.recall(m) for m in sweep["efs"]])
        report = {
            "index": "ivf", "family": "ivf_coverage",
            "recall_mae": float(np.mean(np.abs(
                pred - np.asarray(sweep["recalls"])))),
            "sweep": {"nprobe": list(map(float, sweep["efs"])),
                      "measured": list(map(float, sweep["recalls"])),
                      "predicted": [float(x) for x in pred]},
        }
        save_params(params, _art(args, f"parameter_{args.index}.json"))
        with open(_art(args, "model_validation.json"), "w") as f:
            json.dump(report, f, indent=2)
        logger.info(
            "fitted ivf coverage k=%.3f lam=%.4g sigma=%.3f a=%.4g b=%.4g "
            "(recall MAE %.3f)", params.k, params.lam, params.sigma,
            params.a, params.b, report["recall_mae"])
        return

    rp = fit_recall_params(sweep["efs"], sweep["recalls"], args.topk, sel,
                           fit_offset=True)
    from .models.cost import CostModelParams

    params = CostModelParams(k=rp[0], beta=rp[1], a=a, b=b,
                             join_time=join_time,
                             ef_offset=rp[2] if len(rp) > 2 else 0.0)
    report = validate_models(sweep, params, topk=args.topk, sel=sel,
                             n_vectors=corpus.n)
    save_params(params, _art(args, f"parameter_{args.index}.json"))
    with open(_art(args, "model_validation.json"), "w") as f:
        json.dump(report, f, indent=2)
    logger.info(
        "fitted k=%.3f beta=%.4f ef0=%.1f a=%.4g b=%.4g join=%.2e "
        "(recall MAE %.3f, %d sizes)",
        params.k, params.beta, params.ef_offset, params.a, params.b,
        params.join_time, report["recall_mae"], len(sizes))


def cmd_test(args) -> None:
    """Replaces basic_benchmark/test_all.py: one algorithm, one ef sweep."""
    import jax  # noqa: F401  (device init)

    from .bench import GroundTruthOracle, generate_query_workload, run_benchmark
    from .bench.queries import QueryWorkload
    from .core import build_device_arena
    from .partition import build_searcher
    from .utils.config import FrameworkConfig

    state = _load_state(args)
    world = state["world"]
    corpus = _corpus_from_state(state)

    cfg = FrameworkConfig(seed=state["seed"])
    cfg.search.block_rows = args.block_rows
    cfg.index.kind = args.index
    cfg.search.nprobe = args.nprobe
    cfg.optimizer.storage_alpha = args.storage

    # the planner consumes fitted params when a fit-params run has cached
    # them (the reference's parameter_hnsw.json reuse,
    # AnonySys_dynamic_partition.py:795-832)
    pjson = _art(args, f"parameter_{args.index}.json")
    if os.path.exists(pjson):
        from .utils.persist import load_params

        p = load_params(pjson)
        cfg.optimizer.recall_k = p.k
        cfg.optimizer.recall_beta = p.beta
        cfg.optimizer.qps_a = p.a
        cfg.optimizer.qps_b = p.b
        cfg.optimizer.join_time = p.join_time
        cfg.optimizer.ef_offset = p.ef_offset
        cfg.optimizer.n_ref = p.n_ref
        cfg.optimizer.gamma_n = p.gamma_n
        logger.info("loaded fitted cost-model params from %s", pjson)

    arena = build_device_arena(corpus, world, block_rows=cfg.search.block_rows,
                               dtype=args.dtype, metric=args.metric)
    arena = _apply_tombstones(state, corpus, arena)
    gt_arena = arena if args.dtype == "float32" else _apply_tombstones(
        state, corpus, build_device_arena(
            corpus, world, block_rows=cfg.search.block_rows,
            dtype="float32", metric=args.metric))
    oracle = GroundTruthOracle(gt_arena, cache_dir=args.artifacts,
                               block_rows=cfg.search.block_rows)

    qfile = _art(args, "query_dataset.json")
    if os.path.exists(qfile):
        wl = QueryWorkload.load_json(qfile)
    else:
        wl = generate_query_workload(corpus, world, num_queries=args.queries_num,
                                     topk=args.topk,
                                     query_pool=state.get("query_pool"),
                                     seed=state["seed"] + 1)

    strategy = ALGORITHM_TO_STRATEGY[args.algorithm]
    kwargs = {}
    if strategy == "dynamic":
        pfile = _art(args, "dynamic_plan.pkl")
        if os.path.exists(pfile):
            with open(pfile, "rb") as f:
                kwargs["plan"] = pickle.load(f)
    if strategy == "qdtree":
        kwargs["workload"] = wl

    results = []
    for ef in args.efs:
        cfg.search.ef_search = ef
        cfg.search.nprobe = ef if args.index == "ivf" else cfg.search.nprobe
        t0 = time.perf_counter()
        searcher = build_searcher(strategy, corpus, world, arena, cfg, **kwargs)
        build_s = time.perf_counter() - t0
        if args.cache:
            # cache-workload mode (reference generate_query_dataset_for_cache
            # + 3-repetition runs, read_dataset_function.py:611): wrap the
            # searcher in the comb-keyed LRU; warm-up is skipped so the
            # measured pass sees genuine cold misses + repetition hits
            from .bench.result_cache import CachedSearcher

            searcher = CachedSearcher(searcher, world,
                                      capacity=args.cache_capacity)
            res = run_benchmark(searcher, corpus, world, wl, oracle,
                                k=args.topk, build_time_s=build_s,
                                warmup_runs=0)
            d = json.loads(res.to_json())
            d["cache"] = searcher.stats()
            results.append(d)
            continue
        res = run_benchmark(searcher, corpus, world, wl, oracle,
                            k=args.topk, build_time_s=build_s)
        results.append(json.loads(res.to_json()))

    out = _art(args, f"{args.algorithm.lower()}_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    logger.info("wrote %s", out)
    print(json.dumps(results[-1]))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="vectorsearch_rbac_tpu")
    p.add_argument("--artifacts", default="artifacts")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("prepare")
    sp.add_argument("--dataset", default="sift1m")
    sp.add_argument("--dataset-path", default="")
    sp.add_argument("--n", type=int, default=1_000_000)
    sp.add_argument("--generator", default="tree",
                    choices=["tree", "sharing_tree", "erbac", "random",
                             "arxiv_business"])
    sp.add_argument("--num-roles", type=int, default=100)
    sp.add_argument("--num-users", type=int, default=10_000)
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_prepare)

    sq = sub.add_parser("generate-queries")
    sq.add_argument("--num-queries", type=int, default=1000)
    sq.add_argument("--topk", type=int, default=10)
    sq.add_argument("--zipf", type=float, default=0)
    sq.add_argument("--repetitions", type=int, default=1)
    sq.add_argument("--per-role", type=int, default=0, metavar="Q",
                    help="role-targeted workload: Q queries per role "
                         "(reference generate_query_dataset_for_roles)")
    sq.add_argument("--seed", type=int, default=0)
    sq.set_defaults(fn=cmd_generate_queries)

    sd = sub.add_parser("plan-dynamic")
    sd.add_argument("--storage", type=float, default=1.5)
    sd.add_argument("--recall", type=float, default=None)
    sd.add_argument("--topk", type=int, default=10)
    sd.set_defaults(fn=cmd_plan_dynamic)

    si = sub.add_parser("insert-role", help="online role insertion "
                        "experiment (reference insertion.py)")
    si.add_argument("--docs", type=int, default=0, metavar="N",
                    help="explicit new-role doc count (default: reference "
                    "sampling, 1/num_roles of each role's docs)")
    si.add_argument("--assign-users", type=int, default=0, metavar="K",
                    help="users granted the new role (default num_users/100)")
    si.add_argument("--storage", type=float, default=1.5)
    si.add_argument("--topk", type=int, default=10)
    si.add_argument("--seed", type=int, default=0)
    si.set_defaults(fn=cmd_insert_role)

    sx = sub.add_parser("delete-role", help="online role deletion "
                        "experiment (reference deletion.py)")
    sx.add_argument("--role", type=int, required=True)
    sx.add_argument("--storage", type=float, default=1.5)
    sx.add_argument("--topk", type=int, default=10)
    sx.set_defaults(fn=cmd_delete_role)

    sr = sub.add_parser("rollback", help="restore pre-maintenance snapshots "
                        "(reference {insertion,deletion}_rolllback.py)")
    sr.set_defaults(fn=cmd_rollback)

    sv = sub.add_parser("serve", help="closed-loop online serving through "
                        "the micro-batching front-end")
    sv.add_argument("--algorithm", default="RLS",
                    choices=sorted(ALGORITHM_TO_STRATEGY))
    sv.add_argument("--clients", type=int, default=64)
    sv.add_argument("--duration", type=float, default=10.0)
    sv.add_argument("--topk", type=int, default=10)
    sv.add_argument("--efs", type=int, default=40)
    sv.add_argument("--index", default="flat_approx",
                    choices=["flat", "flat_approx", "ivf", "hnsw", "hybrid"])
    sv.add_argument("--dtype", default="int8")
    sv.add_argument("--block-rows", type=int, default=65536)
    sv.add_argument("--max-batch", type=int, default=2048)
    sv.add_argument("--max-wait-ms", type=float, default=3.0)
    sv.set_defaults(fn=cmd_serve)

    sg = sub.add_parser("compute-ground-truth", help="precompute + cache "
                        "exact ground truth (reference "
                        "compute_ground_truth.py)")
    sg.add_argument("--topk", type=int, default=10)
    sg.add_argument("--metric", default="l2",
                    choices=["l2", "ip", "cosine", "l1"])
    sg.add_argument("--block-rows", type=int, default=65536)
    sg.set_defaults(fn=cmd_compute_ground_truth)

    sf = sub.add_parser("fit-params")
    sf.add_argument("--index", default="hnsw", choices=["hnsw", "ivf"])
    sf.add_argument("--efs", type=int, nargs="+",
                    default=[8, 16, 32, 64, 128, 256])
    sf.add_argument("--topk", type=int, default=10)
    sf.add_argument("--num-queries", type=int, default=256)
    sf.add_argument("--nlist", type=int, default=256)
    sf.add_argument("--dtype", default="float32")
    sf.add_argument("--block-rows", type=int, default=16384)
    sf.set_defaults(fn=cmd_fit_params)

    st = sub.add_parser("test")
    st.add_argument("--algorithm", required=True,
                    choices=sorted(ALGORITHM_TO_STRATEGY))
    st.add_argument("--efs", type=int, nargs="+", default=[40])
    st.add_argument("--metric", default="l2",
                    choices=["l2", "ip", "cosine", "l1"],
                    help="distance metric (pgvector <-> / <#> / <=> "
                         "operator family)")
    st.add_argument("--topk", type=int, default=10)
    st.add_argument("--queries-num", type=int, default=1000)
    st.add_argument("--index", default="flat_approx",
                    choices=["flat", "flat_approx", "ivf", "hnsw", "binary"])
    st.add_argument("--dtype", default="bfloat16")
    st.add_argument("--block-rows", type=int, default=65536)
    st.add_argument("--nprobe", type=int, default=16)
    st.add_argument("--storage", type=float, default=1.5)
    st.add_argument("--cache", action="store_true",
                    help="cache-workload mode: comb-keyed LRU result cache, "
                         "no warm-up, hit-rate reporting")
    st.add_argument("--cache-capacity", type=int, default=10000)
    st.set_defaults(fn=cmd_test)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
