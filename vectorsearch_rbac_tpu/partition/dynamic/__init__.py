from .optimizer import PlannerInputs, PartitionPlan, split_comb_roles
from .weights import comb_weights_from_workload, single_role_weights_from_workload
from .materialize import (
    apply_plan_update,
    build_dynamic_searcher,
    plan_dynamic_partitions,
    validate_partition_coverage,
)
from .maintenance import insert_role, delete_role, choose_partition_for_new_role

__all__ = [
    "PlannerInputs",
    "PartitionPlan",
    "split_comb_roles",
    "comb_weights_from_workload",
    "single_role_weights_from_workload",
    "build_dynamic_searcher",
    "plan_dynamic_partitions",
    "validate_partition_coverage",
    "insert_role",
    "delete_role",
    "choose_partition_for_new_role",
    "apply_plan_update",
]
