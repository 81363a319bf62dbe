"""Sharing-tree RBAC generator.

Semantics follow SharingTreeBasedRBACDataGenerator (reference
services/rbac_generator/sharing_tree_based_rbac_data_generator.py:23): same
role tree as the tree generator, but document ownership is shared across
tree nodes — `percent_shared` percent of documents are each assigned to a
Poisson(poisson_mean)-many nodes (clipped to [min_roles, max_roles]); the
remaining documents are dealt uniquely round-robin over shuffled nodes.
Each role's final permission set is its own node's documents union all
ancestors' (inheritance as in the tree generator).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..world import RBACWorld
from .tree import TreeRBACGenerator


class SharingTreeRBACGenerator(TreeRBACGenerator):
    def __init__(
        self,
        num_users: int = 10000,
        num_roles: int = 100,
        num_docs: int = 10000,
        h: int = 4,
        b0: int = 3,
        b1: int = 4,
        doc_sharing_distribution: Tuple[float, float, int, int] = (30, 3, 1, 10),
        seed: int = 0,
    ):
        super().__init__(num_users, num_roles, num_docs, h, b0, b1, seed)
        self.doc_sharing_distribution = doc_sharing_distribution

    def generate(self) -> RBACWorld:
        order, parent = self._build_tree()
        n_nodes = len(order)
        percent_shared, poisson_mean, min_roles, max_roles = self.doc_sharing_distribution

        docs = self.rng.permutation(self.num_docs)
        n_shared = round(percent_shared / 100 * self.num_docs)
        degrees = np.clip(
            self.rng.poisson(lam=poisson_mean, size=n_shared),
            min_roles,
            min(max_roles, n_nodes),
        )

        own_docs: Dict[int, set] = {role: set() for role in order}
        # shared docs: each goes to `degree` distinct nodes
        for doc, degree in zip(docs[:n_shared].tolist(), degrees.tolist()):
            for node_idx in self.rng.choice(n_nodes, size=degree, replace=False):
                own_docs[order[int(node_idx)]].add(doc)
        # remaining docs: unique, dealt round-robin over shuffled nodes
        shuffled = self.rng.permutation(n_nodes)
        for i, doc in enumerate(docs[n_shared:].tolist()):
            own_docs[order[int(shuffled[i % n_nodes])]].add(doc)

        role_to_docs: Dict[int, frozenset] = {}

        def full_docs(role: int) -> frozenset:
            if role in role_to_docs:
                return role_to_docs[role]
            d = set(own_docs[role])
            p = parent[role]
            if p != -1:
                d |= full_docs(p)
            role_to_docs[role] = frozenset(d)
            return role_to_docs[role]

        for role in order:
            full_docs(role)

        user_to_roles: Dict[int, Tuple[int, ...]] = {}
        user_splits = np.array_split(np.arange(self.num_users), n_nodes)
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
