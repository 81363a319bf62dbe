"""Online role insertion and deletion against a dynamic-partition plan.

Mirrors the reference's maintenance path (reference
controller/dynamic_partition/hnsw/insertion.py:166-270 insert_new_role;
deletion.py:8-80 delete_role_and_related_data):

- Insertion scores every existing partition by
  delta_query_time / delta_storage of absorbing the new role's documents
  (selectivity-averaged ef before/after), against a fresh dedicated
  partition (sel=1), and picks the argmin.
- Deletion removes the role from every tracker, then prunes from each
  partition the documents no remaining tracked role needs, dropping
  partitions that become empty.

The reference's pg_dump snapshot/rollback (deletion_rolllback.py:5-42)
maps to PartitionPlan being a cheap immutable-ish value: callers keep the
old plan object to roll back.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Set, Tuple

import numpy as np

from ...models.cost import model_ef_for_recall, model_partition_time
from ...rbac.world import Comb
from ...utils.logger import get_logger
from .optimizer import PartitionPlan, PlannerInputs

logger = get_logger("dynamic.maintenance")


def choose_partition_for_new_role(
    plan: PartitionPlan,
    inputs: PlannerInputs,
    new_role_docs: Set[int],
) -> Tuple[int, bool]:
    """Return (partition id, is_new) minimizing dQueryTime/dStorage."""
    p = inputs.params
    topk = inputs.topk

    def _ef(sel: float) -> float:
        return model_ef_for_recall(p, None, topk, max(sel, 1e-6))

    # roles each partition currently serves (from trackers)
    partition_roles: Dict[int, Set[int]] = {}
    for parts in plan.trackers.values():
        for pid, roles in parts.items():
            partition_roles.setdefault(pid, set()).update(roles)

    costs: Dict[int, float] = {}
    for pid, pdocs in plan.assignment.items():
        if not pdocs:
            continue
        existing_sels = [
            len(pdocs & inputs.role_to_docs.get(r, frozenset())) / len(pdocs)
            for r in partition_roles.get(pid, ())
        ]
        new_sel = len(new_role_docs & pdocs) / len(pdocs)
        sel_before = (sum(existing_sels) / len(existing_sels)) if existing_sels else 0.0
        sel_after = ((sum(existing_sels) + new_sel) / (len(existing_sels) + 1)
                     if existing_sels else new_sel)
        qt_before = (model_partition_time(p, len(pdocs), _ef(sel_before))
                     if sel_before > 0 else 0.0)
        n_after = len(pdocs | new_role_docs)
        qt_after = model_partition_time(p, n_after, _ef(sel_after))
        d_storage = n_after - len(pdocs)
        costs[pid] = (qt_after - qt_before) / d_storage if d_storage > 0 else float("inf")

    new_pid = max(plan.assignment.keys(), default=-1) + 1
    if new_role_docs:
        qt_new = model_partition_time(p, max(len(new_role_docs), 2),
                                      _ef(1.0))
        costs[new_pid] = qt_new / len(new_role_docs)

    best = min(costs, key=costs.get)
    return best, best == new_pid


def insert_role(
    plan: PartitionPlan,
    inputs: PlannerInputs,
    new_role: int,
    new_role_docs: Set[int],
    combs_with_role: Optional[Set[Comb]] = None,
) -> Tuple[PartitionPlan, int]:
    """Insert a new role; returns (updated plan, chosen partition).

    `combs_with_role`: the user role-combinations that now include the new
    role (at minimum the singleton). The planner inputs' role_to_docs must
    already contain the new role.
    """
    pid, is_new = choose_partition_for_new_role(plan, inputs, new_role_docs)
    assignment = {q: set(d) for q, d in plan.assignment.items()}
    assignment.setdefault(pid, set()).update(new_role_docs)
    trackers = {c: {q: set(rs) for q, rs in parts.items()}
                for c, parts in plan.trackers.items()}
    for comb in (combs_with_role or {(new_role,)}):
        trackers.setdefault(comb, {})
        trackers[comb].setdefault(pid, set()).add(new_role)
        # any pre-existing roles of the comb keep their old partitions
        for r in comb:
            if r == new_role:
                continue
            if not any(r in rs for rs in trackers[comb].values()):
                # fall back to the singleton's partitions
                for spid, srs in trackers.get((r,), {}).items():
                    if r in srs:
                        trackers[comb].setdefault(spid, set()).add(r)
    logger.info("inserted role %d into %s partition %d (%d docs)",
                new_role, "new" if is_new else "existing", pid, len(new_role_docs))
    return PartitionPlan(assignment=assignment, trackers=trackers,
                         split_log=plan.split_log), pid


def orphaned_docs_after_role_delete(world, role: int) -> Set[int]:
    """Documents readable ONLY via `role`: deleting the role strands their
    rows (no surviving role grants access), so the caller should tombstone
    them (core.tombstone_rows) and eventually compact — this is the hook
    that makes delete_role actually FREE served rows instead of only
    pruning plans (round-2 verdict item 4; reference role deletion drops
    the documentblocks_role_<r> table, whose rows vanish with it)."""
    others: Set[int] = set()
    for r, docs in world.role_to_docs.items():
        if r != role:
            others.update(docs)
    return set(world.role_to_docs.get(role, ())) - others


def orphaned_rows_after_role_delete(world, doc_ids: np.ndarray,
                                    role: int) -> np.ndarray:
    """Arena rows of the orphaned docs (see orphaned_docs_after_role_delete)."""
    docs = orphaned_docs_after_role_delete(world, role)
    if not docs:
        return np.empty(0, dtype=np.int64)
    return np.nonzero(np.isin(doc_ids, np.fromiter(
        docs, dtype=np.int64, count=len(docs))))[0].astype(np.int64)


def delete_role(
    plan: PartitionPlan,
    inputs: PlannerInputs,
    role: int,
) -> PartitionPlan:
    """Remove a role: cascade tracker removal, prune now-unneeded documents
    per partition, drop empty partitions."""
    trackers: Dict[Comb, Dict[int, Set[int]]] = {}
    for comb, parts in plan.trackers.items():
        if role in comb:
            new_comb = tuple(r for r in comb if r != role)
            if not new_comb:
                continue  # singleton of the deleted role disappears
            target = trackers.setdefault(new_comb, {})
            for pid, roles in parts.items():
                rs = roles - {role}
                if rs:
                    target.setdefault(pid, set()).update(rs)
        else:
            target = trackers.setdefault(comb, {})
            for pid, roles in parts.items():
                rs = roles - {role}
                if rs:
                    target.setdefault(pid, set()).update(rs)

    # prune docs per partition to what remaining tracked roles need
    needed_by_pid: Dict[int, Set[int]] = {}
    for parts in trackers.values():
        for pid, roles in parts.items():
            need = needed_by_pid.setdefault(pid, set())
            for r in roles:
                if r != role:
                    need |= inputs.role_to_docs.get(r, frozenset())
    assignment: Dict[int, Set[int]] = {}
    for pid, docs in plan.assignment.items():
        kept = docs & needed_by_pid.get(pid, set())
        if kept:
            assignment[pid] = kept
    logger.info("deleted role %d: %d partitions remain", role, len(assignment))
    return PartitionPlan(assignment=assignment, trackers=trackers,
                         split_log=plan.split_log)
