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
