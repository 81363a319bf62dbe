"""Tree-based RBAC generator.

Semantics follow the reference's TreeBasedRBACDataGenerator
(services/rbac_generator/tree_based_rbac_data_generator.py:21):

- A role tree of height `h`; each internal node gets between b0 and b1
  children, drawn from the remaining role pool, depth-first.
- Documents are shuffled and split into (num_tree_roles) disjoint chunks;
  each role owns one chunk and inherits every ancestor's chunks
  (child permissions are a superset of the parent's).
- Users are split evenly over the roles in tree order; each user holds
  exactly one role.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..world import RBACWorld
from .base import RBACGenerator, split_into_chunks


class TreeRBACGenerator(RBACGenerator):
    def __init__(
        self,
        num_users: int = 10000,
        num_roles: int = 100,
        num_docs: int = 10000,
        h: int = 4,
        b0: int = 3,
        b1: int = 4,
        seed: int = 0,
    ):
        super().__init__(seed)
        if num_roles > num_docs:
            raise ValueError("need at least one document per role")
        self.num_users = num_users
        self.num_roles = num_roles
        self.num_docs = num_docs
        self.h, self.b0, self.b1 = h, b0, b1

    def _build_tree(self) -> Tuple[List[int], Dict[int, int]]:
        """Return (roles in depth-first tree order, role -> parent role).

        parent == -1 means the role hangs directly off the virtual root.
        """
        pool = list(range(self.num_roles))
        order: List[int] = []
        parent: Dict[int, int] = {}

        def add_children(p: int, level: int) -> None:
            if level >= self.h or not pool:
                return
            n_children = min(int(self.rng.integers(self.b0, self.b1 + 1)), len(pool))
            for _ in range(n_children):
                if not pool:
                    break
                child = pool.pop(0)
                order.append(child)
                parent[child] = p
                add_children(child, level + 1)

        add_children(-1, 0)
        # Any roles the tree couldn't absorb become extra root children so
        # every role exists (the reference merely warns and drops them; we
        # keep full coverage so user->role assignment stays total).
        while pool:
            child = pool.pop(0)
            order.append(child)
            parent[child] = -1
        return order, parent

    def generate(self) -> RBACWorld:
        order, parent = self._build_tree()
        chunks = split_into_chunks(self.rng, self.num_docs, len(order))
        own_docs = {role: set(chunks[i].tolist()) for i, role in enumerate(order)}

        # permission = own chunk union all ancestors' chunks
        role_to_docs: Dict[int, frozenset] = {}

        def full_docs(role: int) -> frozenset:
            if role in role_to_docs:
                return role_to_docs[role]
            docs = set(own_docs[role])
            p = parent[role]
            if p != -1:
                docs |= full_docs(p)
            role_to_docs[role] = frozenset(docs)
            return role_to_docs[role]

        for role in order:
            full_docs(role)

        # users split evenly over roles in tree order; one role per user
        user_to_roles: Dict[int, Tuple[int, ...]] = {}
        user_splits = np.array_split(np.arange(self.num_users), len(order))
        for role, users in zip(order, user_splits):
            for u in users.tolist():
                user_to_roles[u] = (role,)

        world = RBACWorld(
            num_users=self.num_users,
            num_roles=self.num_roles,
            num_docs=self.num_docs,
            user_to_roles=user_to_roles,
            role_to_docs=role_to_docs,
        )
        world.validate()
        return world
