"""Random RBAC generator.

Semantics follow RandomRBACDataGenerator (reference
services/rbac_generator/random_rbac_data_generator.py:26):

- each user gets 1..m_roles distinct random roles;
- each role gets a unique random doc set of size m_perms//2..m_perms;
- a fix-up pass assigns any uncovered document to a random role that still
  has headroom under m_perms.
"""

from __future__ import annotations

from typing import Dict, Tuple

from ..world import RBACWorld
from .base import RBACGenerator


class RandomRBACGenerator(RBACGenerator):
    def __init__(
        self,
        num_users: int = 10000,
        num_roles: int = 100,
        num_docs: int = 10000,
        m_roles: int = 3,
        m_perms: int = 300,
        seed: int = 0,
    ):
        super().__init__(seed)
        self.num_users = num_users
        self.num_roles = num_roles
        self.num_docs = num_docs
        self.m_roles = m_roles
        self.m_perms = m_perms
        if num_roles * m_perms < num_docs:
            raise ValueError("num_roles * m_perms must cover num_docs")

    def generate(self) -> RBACWorld:
        rng = self.rng
        user_to_roles: Dict[int, Tuple[int, ...]] = {}
        for u in range(self.num_users):
            n = int(rng.integers(1, self.m_roles + 1))
            roles = rng.choice(self.num_roles, size=n, replace=False)
            user_to_roles[u] = tuple(sorted(roles.tolist()))

        seen: set = set()
        role_docs: Dict[int, set] = {}
        for r in range(self.num_roles):
            for _ in range(1000):
                size = int(rng.integers(max(1, self.m_perms // 2), self.m_perms + 1))
                docs = tuple(sorted(rng.choice(self.num_docs, size=size, replace=False).tolist()))
                if docs not in seen:
                    seen.add(docs)
                    role_docs[r] = set(docs)
                    break
            else:
                raise RuntimeError("could not draw a unique permission set")

        covered = set().union(*role_docs.values())
        for doc in sorted(set(range(self.num_docs)) - covered):
            for _ in range(10 * self.num_roles):
                r = int(rng.integers(self.num_roles))
                if len(role_docs[r]) < self.m_perms:
                    role_docs[r].add(doc)
                    break
            else:  # all roles full — place anyway to keep coverage total
                role_docs[int(rng.integers(self.num_roles))].add(doc)

        world = RBACWorld(
            num_users=self.num_users,
            num_roles=self.num_roles,
            num_docs=self.num_docs,
            user_to_roles=user_to_roles,
            role_to_docs={r: frozenset(d) for r, d in role_docs.items()},
        )
        world.validate()
        return world
