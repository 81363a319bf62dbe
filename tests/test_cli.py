import json
import os

import numpy as np
import pytest

from vectorsearch_rbac_tpu.cli import main


def test_cli_pipeline(tmp_path):
    art = str(tmp_path)
    base = ["--artifacts", art]
    main(base + ["prepare", "--dataset", "synthetic", "--n", "2000",
                 "--generator", "tree", "--num-roles", "10",
                 "--num-users", "50", "--seed", "3"])
    assert os.path.exists(os.path.join(art, "state.pkl"))

    main(base + ["generate-queries", "--num-queries", "12", "--topk", "5"])
    qfile = os.path.join(art, "query_dataset.json")
    assert os.path.exists(qfile)
    with open(qfile) as f:
        entries = json.load(f)
    assert len(entries) == 12 and entries[0]["topk"] == 5

    main(base + ["plan-dynamic", "--storage", "2.0"])
    assert os.path.exists(os.path.join(art, "dynamic_plan.pkl"))

    for algo in ["RLS", "ROLE", "AnonySys"]:
        main(base + ["test", "--algorithm", algo, "--efs", "40",
                     "--topk", "5", "--dtype", "float32",
                     "--block-rows", "512", "--index", "flat"])
        out = os.path.join(art, f"{algo.lower()}_results.json")
        with open(out) as f:
            res = json.load(f)
        assert res[-1]["avg_recall"] == 1.0, f"{algo}: {res[-1]}"


def test_cli_fit_params(tmp_path):
    art = str(tmp_path)
    base = ["--artifacts", art]
    main(base + ["prepare", "--dataset", "synthetic", "--n", "2000",
                 "--generator", "tree", "--num-roles", "8",
                 "--num-users", "40", "--seed", "4"])
    main(base + ["fit-params", "--index", "ivf", "--efs", "2", "4", "8", "16",
                 "--topk", "5", "--num-queries", "24", "--nlist", "32",
                 "--block-rows", "512"])
    with open(os.path.join(art, "parameter_ivf.json")) as f:
        params = json.load(f)
    # IVF persists the coverage family (round-2 artifact's finding), and
    # load_params must reconstruct the right class from the family tag
    assert params["family"] == "ivf_coverage"
    assert set(params) >= {"k", "lam", "sigma", "a", "b"}
    from vectorsearch_rbac_tpu.models.cost import IVFCoverageParams
    from vectorsearch_rbac_tpu.utils.persist import load_params
    loaded = load_params(os.path.join(art, "parameter_ivf.json"))
    assert isinstance(loaded, IVFCoverageParams)
    assert os.path.exists(os.path.join(art, "model_validation.json"))


def test_cli_maintenance_roundtrip(tmp_path):
    """insert-role / delete-role / rollback drivers (reference
    controller/dynamic_partition/hnsw/{insertion,deletion}.py experiments
    with pg_dump rollback)."""
    import pickle

    art = str(tmp_path)
    base = ["--artifacts", art]
    main(base + ["prepare", "--dataset", "synthetic", "--n", "2000",
                 "--generator", "tree", "--num-roles", "10",
                 "--num-users", "50", "--seed", "5"])
    main(base + ["generate-queries", "--num-queries", "16", "--topk", "5"])
    main(base + ["plan-dynamic", "--storage", "2.0"])

    def load(name):
        with open(os.path.join(art, name), "rb") as f:
            return pickle.load(f)

    world0 = load("state.pkl")["world"]
    plan0 = load("dynamic_plan.pkl")

    # --- insert: new role appears in world + plan, serving stays exact
    main(base + ["insert-role", "--assign-users", "3", "--seed", "11"])
    st1 = load("state.pkl")
    world1, plan1 = st1["world"], load("dynamic_plan.pkl")
    new_role = world0.num_roles
    assert world1.num_roles == world0.num_roles + 1
    assert new_role in world1.role_to_docs and world1.role_to_docs[new_role]
    assert (new_role,) in plan1.trackers or any(
        new_role in c for c in plan1.trackers)
    covered = set()
    for pid in plan1.trackers.get((new_role,), {}):
        covered |= plan1.assignment[pid]
    assert set(world1.role_to_docs[new_role]) <= covered
    main(base + ["test", "--algorithm", "AnonySys", "--efs", "40",
                 "--topk", "5", "--dtype", "float32",
                 "--block-rows", "512", "--index", "flat"])
    with open(os.path.join(art, "anonysys_results.json")) as f:
        assert json.load(f)[-1]["avg_recall"] == 1.0

    # --- delete an ORIGINAL leaf role: its own disjoint doc set is not
    # inherited by any other role, so deletion orphans it; the orphans must
    # be tombstoned out of both serving and the oracle
    from vectorsearch_rbac_tpu.partition.dynamic.maintenance import (
        orphaned_docs_after_role_delete,
    )

    victim = next(r for r in range(world0.num_roles)
                  if orphaned_docs_after_role_delete(world0, r))
    main(base + ["delete-role", "--role", str(victim)])
    st2 = load("state.pkl")
    world2, plan2 = st2["world"], load("dynamic_plan.pkl")
    assert victim not in world2.role_to_docs
    assert all(victim not in roles for roles in world2.user_to_roles.values())
    for comb, parts in plan2.trackers.items():
        assert victim not in comb
        for roles in parts.values():
            assert victim not in roles
    assert st2.get("tombstoned_docs"), "tree role delete must orphan docs"
    main(base + ["test", "--algorithm", "AnonySys", "--efs", "40",
                 "--topk", "5", "--dtype", "float32",
                 "--block-rows", "512", "--index", "flat"])
    with open(os.path.join(art, "anonysys_results.json")) as f:
        res = json.load(f)[-1]
    assert res["avg_recall"] == 1.0, res
    # RLS (global fused-mask scan) also honors the tombstones
    main(base + ["test", "--algorithm", "RLS", "--efs", "40",
                 "--topk", "5", "--dtype", "float32",
                 "--block-rows", "512", "--index", "flat"])
    with open(os.path.join(art, "rls_results.json")) as f:
        assert json.load(f)[-1]["avg_recall"] == 1.0

    # --- rollback restores the pre-delete snapshot
    main(base + ["rollback"])
    st3 = load("state.pkl")
    assert st3["world"].num_roles == world1.num_roles
    assert victim in st3["world"].role_to_docs
    assert load("dynamic_plan.pkl").assignment.keys() == plan1.assignment.keys()


def test_cli_compute_ground_truth(tmp_path):
    art = str(tmp_path)
    base = ["--artifacts", art]
    main(base + ["prepare", "--dataset", "synthetic", "--n", "1500",
                 "--generator", "tree", "--num-roles", "8",
                 "--num-users", "30", "--seed", "6"])
    main(base + ["generate-queries", "--num-queries", "10", "--topk", "4"])
    main(base + ["compute-ground-truth", "--topk", "4",
                 "--block-rows", "512"])
    out = os.path.join(art, "ground_truth_cache.json")
    with open(out) as f:
        gt = json.load(f)
    assert gt["topk"] == 4 and gt["num_queries"] == 10
    assert len(gt["results"]) == 10
    assert all(len(row) == 4 for row in gt["results"])
    # pointer entries are (doc, block) pairs within corpus bounds
    for row in gt["results"]:
        for doc, blk in row:
            assert doc >= -1 and blk >= -1
    # the npy cache primes `test`: a subsequent run hits it
    assert any(f.startswith("gt_") for f in os.listdir(art))


def test_cli_serve(tmp_path):
    art = str(tmp_path)
    base = ["--artifacts", art]
    main(base + ["prepare", "--dataset", "synthetic", "--n", "1500",
                 "--generator", "tree", "--num-roles", "8",
                 "--num-users", "30", "--seed", "8"])
    main(base + ["generate-queries", "--num-queries", "24", "--topk", "5"])
    main(base + ["serve", "--algorithm", "RLS", "--clients", "8",
                 "--duration", "2", "--topk", "5", "--dtype", "float32",
                 "--block-rows", "512", "--index", "flat",
                 "--max-wait-ms", "2"])
    with open(os.path.join(art, "serve_results.json")) as f:
        rep = json.load(f)
    assert rep["requests"] > 0 and rep["qps"] > 0
    assert rep["p50_ms"] > 0 and rep["avg_batch"] >= 1.0
