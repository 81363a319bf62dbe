"""Property tests for the dynamic-partition planner over random small
worlds (SURVEY.md section 7 'hard parts': property-test split_comb_roles
against small brute-force checks)."""

import numpy as np
import pytest

from vectorsearch_rbac_tpu.models.cost import CostModelParams
from vectorsearch_rbac_tpu.partition.dynamic import (
    PlannerInputs, plan_dynamic_partitions, split_comb_roles,
    validate_partition_coverage,
)
from vectorsearch_rbac_tpu.rbac.generators import (
    RandomRBACGenerator, SharingTreeRBACGenerator, TreeRBACGenerator,
)


def _inputs(world, alpha):
    return PlannerInputs(
        role_to_docs=world.role_to_docs,
        combs=world.combs,
        comb_weights=world.comb_weights,
        single_role_weights={r: 1.0 for r in range(world.num_roles)},
        params=CostModelParams(),
        alpha=alpha,
        topk=10,
    )


WORLDS = [
    (TreeRBACGenerator, dict(num_users=60, num_roles=12, num_docs=90, h=3, b0=2, b1=3)),
    (RandomRBACGenerator, dict(num_users=50, num_roles=8, num_docs=80, m_roles=3, m_perms=25)),
    (SharingTreeRBACGenerator, dict(num_users=40, num_roles=10, num_docs=70, h=3,
                                    doc_sharing_distribution=(40, 2, 1, 4))),
]


@pytest.mark.parametrize("gen_cls,kwargs", WORLDS)
@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("alpha", [1.2, 2.0])
def test_planner_invariants(gen_cls, kwargs, seed, alpha):
    world = gen_cls(seed=seed, **kwargs).generate()
    inputs = _inputs(world, alpha)
    plan = plan_dynamic_partitions(world, inputs)

    # 1. coverage: every comb reaches all its documents
    validate_partition_coverage(plan, inputs)

    # 2. storage: total load within alpha*n plus at most one comb's docs
    total = sum(len(d) for d in plan.assignment.values())
    biggest_comb = max(
        (len(inputs.comb_docs(c)) for c in inputs.combs), default=0
    )
    assert total <= alpha * world.num_docs + biggest_comb + 1

    # 3. no empty partitions, contiguous ids after reindex
    assert all(plan.assignment.values())
    assert sorted(plan.assignment) == list(range(len(plan.assignment)))

    # 4. every tracked pid exists
    for comb, parts in plan.trackers.items():
        for pid in parts:
            assert pid in plan.assignment

    # 5. partitions only contain documents some tracked role needs there
    needed = {pid: set() for pid in plan.assignment}
    for comb, parts in plan.trackers.items():
        for pid, roles in parts.items():
            for r in roles:
                needed[pid] |= set(inputs.role_to_docs.get(r, ()))
    for pid, docs in plan.assignment.items():
        assert docs <= needed[pid], f"partition {pid} holds unneeded docs"


def test_higher_alpha_not_fewer_partitions():
    """More storage budget must never yield a coarser layout."""
    world = TreeRBACGenerator(num_users=60, num_roles=12, num_docs=90,
                              h=3, b0=2, b1=3, seed=4).generate()
    sizes = []
    for alpha in (1.1, 1.5, 2.5):
        plan = split_comb_roles(_inputs(world, alpha))
        sizes.append(len(plan.assignment))
    assert sizes[0] <= sizes[1] <= sizes[2]


def test_planner_with_tpu_cost_family():
    """The planner must run unchanged on the engine-fitted TPUCostParams
    family (model_ef_for_recall / model_partition_time dispatch)."""
    from vectorsearch_rbac_tpu.models.cost import TPUCostParams

    world = TreeRBACGenerator(num_users=60, num_roles=12, num_docs=90,
                              h=3, b0=2, b1=3, seed=4).generate()
    inputs = PlannerInputs(
        role_to_docs=world.role_to_docs,
        combs=world.combs,
        comb_weights=world.comb_weights,
        single_role_weights={r: 1.0 for r in range(world.num_roles)},
        params=TPUCostParams(),
        alpha=1.5,
        topk=10,
    )
    plan = plan_dynamic_partitions(world, inputs)
    validate_partition_coverage(plan, inputs)
    total = sum(len(d) for d in plan.assignment.values())
    assert total <= 1.5 * world.num_docs + max(
        len(d) for d in world.role_to_docs.values())
