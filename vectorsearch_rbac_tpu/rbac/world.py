"""RBACWorld: the in-memory permission model.

Replaces the reference's five Postgres tables Users / Roles / UserRoles /
Documents / PermissionAssignment (reference
controller/initialize_main_tables.py:17-72) with plain arrays + dicts. All
ids are 0-based contiguous indexes (the reference uses 1-based SQL serials).

The world is host-side setup state; the device-facing artifacts it derives
are role bitsets (`doc_role_bits`) and user masks consumed by the fused
distance-scan kernels.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass
from functools import cached_property
from typing import Dict, FrozenSet, Iterable, List, Mapping, Sequence, Tuple

import numpy as np

from .bitset import num_words, pack_role_sets, role_mask

Comb = Tuple[int, ...]  # sorted tuple of role ids — a user's role combination


def query_masks_for(user_masks: np.ndarray, user_ids: np.ndarray) -> np.ndarray:
    """Resolve the per-query masks from the (num_users, W) user-mask TABLE.

    The searcher contract is explicit: `user_masks` is always the full
    per-user table (RBACWorld.user_masks) and is always indexed by
    `user_ids`. A shape heuristic here previously mis-enforced RBAC when
    num_users happened to equal the query count (a (num_users, W) table was
    silently treated as per-query masks) — that ambiguity is now an error.
    """
    user_masks = np.asarray(user_masks, dtype=np.uint32)
    user_ids = np.asarray(user_ids)
    assert user_masks.ndim == 2, "user_masks must be the (num_users, W) table"
    if len(user_ids):
        hi = int(user_ids.max())
        assert hi < user_masks.shape[0], (
            f"user id {hi} out of range for user_masks table "
            f"({user_masks.shape[0]} rows) — pass RBACWorld.user_masks, "
            "not per-query masks"
        )
    return user_masks[user_ids]


@dataclass(frozen=True)
class RBACWorld:
    """Immutable RBAC universe.

    user_to_roles: user id -> sorted tuple of role ids.
    role_to_docs:  role id -> frozenset of doc ids the role may read.
    """

    num_users: int
    num_roles: int
    num_docs: int
    user_to_roles: Mapping[int, Comb]
    role_to_docs: Mapping[int, FrozenSet[int]]

    # ---------------------------------------------------------------- checks

    def validate(self) -> None:
        for u, roles in self.user_to_roles.items():
            assert 0 <= u < self.num_users, f"bad user id {u}"
            assert roles == tuple(sorted(set(roles))), f"roles not sorted-unique for {u}"
            for r in roles:
                assert 0 <= r < self.num_roles, f"bad role id {r} for user {u}"
        covered: set[int] = set()
        for r, docs in self.role_to_docs.items():
            assert 0 <= r < self.num_roles, f"bad role id {r}"
            for d in docs:
                assert 0 <= d < self.num_docs, f"bad doc id {d} in role {r}"
            covered.update(docs)
        # Mirrors the full-coverage assertion of the reference generators
        # (tree_based_rbac_data_generator.py:206-209).
        assert covered == set(range(self.num_docs)), (
            f"{self.num_docs - len(covered)} documents not reachable by any role"
        )

    # ------------------------------------------------------------- bitsets

    @cached_property
    def words(self) -> int:
        return num_words(self.num_roles)

    @cached_property
    def doc_role_bits(self) -> np.ndarray:
        """(num_docs, W) uint32 — bit r set iff role r may read the doc."""
        bits = np.zeros((self.num_docs, self.words), dtype=np.uint32)
        for r, docs in self.role_to_docs.items():
            w, b = r // 32, np.uint32(1 << (r % 32))
            idx = np.fromiter(docs, dtype=np.int64, count=len(docs))
            np.bitwise_or.at(bits[:, w], idx, b)
        return bits

    def user_mask(self, user_id: int) -> np.ndarray:
        return role_mask(self.user_to_roles[user_id], self.num_roles)

    @cached_property
    def user_masks(self) -> np.ndarray:
        """(num_users, W) uint32 role bitmask per user."""
        return pack_role_sets(
            [self.user_to_roles.get(u, ()) for u in range(self.num_users)],
            self.num_roles,
        )

    # ------------------------------------------------------ combinations

    @cached_property
    def combs(self) -> List[Comb]:
        """Distinct user role-combinations, sorted (reference
        AnonySys_dynamic_partition.py:38-66 init_user_role_combination_data)."""
        return sorted({tuple(r) for r in self.user_to_roles.values() if r})

    @cached_property
    def comb_user_counts(self) -> Dict[Comb, int]:
        counts: Dict[Comb, int] = defaultdict(int)
        for roles in self.user_to_roles.values():
            if roles:
                counts[tuple(roles)] += 1
        return dict(counts)

    @cached_property
    def comb_weights(self) -> Dict[Comb, float]:
        """comb -> fraction of users holding exactly this combination."""
        total = sum(self.comb_user_counts.values())
        return {c: n / total for c, n in self.comb_user_counts.items()}

    def comb_docs(self, comb: Comb) -> FrozenSet[int]:
        docs: set[int] = set()
        for r in comb:
            docs.update(self.role_to_docs.get(r, ()))
        return frozenset(docs)

    def user_docs(self, user_id: int) -> FrozenSet[int]:
        return self.comb_docs(self.user_to_roles[user_id])

    # ------------------------------------------------------- selectivity

    def role_selectivity(self, role_id: int) -> float:
        """|docs(role)| / |docs| (reference services/rbac_generator/common.py:26)."""
        return len(self.role_to_docs.get(role_id, ())) / max(1, self.num_docs)

    def user_selectivity(self, user_id: int) -> float:
        """|union docs over user roles| / |docs| (reference common.py:43)."""
        return len(self.user_docs(user_id)) / max(1, self.num_docs)

    def average_role_selectivity(self) -> float:
        sels = [self.role_selectivity(r) for r in range(self.num_roles)]
        return float(np.mean(sels)) if sels else 0.0

    def average_user_selectivity(self) -> float:
        sels = [self.user_selectivity(u) for u in self.user_to_roles]
        return float(np.mean(sels)) if sels else 0.0

    def storage_ratio(self) -> float:
        """Sum over roles of |docs(role)| / |docs| — duplication factor of a
        per-role physical layout (reference common.py storage reporting)."""
        return sum(len(d) for d in self.role_to_docs.values()) / max(1, self.num_docs)

    # ------------------------------------------------------------- update

    def with_new_role(
        self,
        role_docs: Iterable[int],
        users: Sequence[int] = (),
    ) -> tuple["RBACWorld", int]:
        """Return a new world with one extra role appended (online role
        insertion, reference controller/dynamic_partition/hnsw/insertion.py)."""
        new_role = self.num_roles
        r2d = dict(self.role_to_docs)
        r2d[new_role] = frozenset(role_docs)
        u2r = dict(self.user_to_roles)
        for u in users:
            u2r[u] = tuple(sorted(set(u2r.get(u, ())) | {new_role}))
        world = RBACWorld(
            num_users=self.num_users,
            num_roles=self.num_roles + 1,
            num_docs=self.num_docs,
            user_to_roles=u2r,
            role_to_docs=r2d,
        )
        return world, new_role

    def without_role(self, role_id: int) -> "RBACWorld":
        """Return a new world with `role_id` removed from all users (online
        role deletion, reference controller/dynamic_partition/hnsw/deletion.py:8-80).

        Role ids are NOT renumbered so existing bitsets/layouts stay aligned;
        the slot simply becomes empty.
        """
        r2d = {r: d for r, d in self.role_to_docs.items() if r != role_id}
        u2r = {
            u: tuple(r for r in roles if r != role_id)
            for u, roles in self.user_to_roles.items()
        }
        return RBACWorld(
            num_users=self.num_users,
            num_roles=self.num_roles,
            num_docs=self.num_docs,
            user_to_roles=u2r,
            role_to_docs=r2d,
        )
