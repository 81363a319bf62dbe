import numpy as np
import pytest

from vectorsearch_rbac_tpu.models.cost import CostModelParams
from vectorsearch_rbac_tpu.partition.dynamic import (
    PlannerInputs,
    delete_role,
    insert_role,
    plan_dynamic_partitions,
    validate_partition_coverage,
)


@pytest.fixture(scope="module")
def planned(small_world):
    inputs = PlannerInputs(
        role_to_docs=small_world.role_to_docs,
        combs=small_world.combs,
        comb_weights=small_world.comb_weights,
        single_role_weights={r: 1.0 for r in range(small_world.num_roles)},
        params=CostModelParams(),
        alpha=2.0,
        topk=10,
    )
    plan = plan_dynamic_partitions(small_world, inputs)
    return small_world, inputs, plan


def test_insert_role(planned):
    world, inputs, plan = planned
    new_role = world.num_roles
    new_docs = set(range(0, 30))
    r2d = dict(inputs.role_to_docs)
    r2d[new_role] = frozenset(new_docs)
    inputs2 = PlannerInputs(
        role_to_docs=r2d, combs=list(inputs.combs) + [(new_role,)],
        comb_weights=inputs.comb_weights,
        single_role_weights={**inputs.single_role_weights, new_role: 1.0},
        params=inputs.params, alpha=inputs.alpha, topk=inputs.topk,
    )
    plan2, pid = insert_role(plan, inputs2, new_role, new_docs)
    # new role's docs fully covered by its tracked partitions
    covered = set()
    for p in plan2.trackers[(new_role,)]:
        covered |= plan2.assignment[p]
    assert new_docs <= covered
    # old combs unchanged
    for comb in inputs.combs:
        assert comb in plan2.trackers


def test_delete_role(planned):
    world, inputs, plan = planned
    victim = world.combs[0][0]
    plan2 = delete_role(plan, inputs, victim)
    # victim gone from every tracker
    for comb, parts in plan2.trackers.items():
        assert victim not in comb
        for roles in parts.values():
            assert victim not in roles
    # remaining combs still covered
    for comb, parts in plan2.trackers.items():
        docs = inputs.comb_docs(comb)
        covered = set()
        for pid in parts:
            covered |= plan2.assignment.get(pid, set())
        assert docs <= covered, f"comb {comb} lost coverage after deletion"
    # no partition retains docs that only the victim needed
    needed = set()
    for comb, parts in plan2.trackers.items():
        for pid, roles in parts.items():
            for r in roles:
                needed |= inputs.role_to_docs.get(r, frozenset())
    for pid, docs in plan2.assignment.items():
        assert docs <= needed
