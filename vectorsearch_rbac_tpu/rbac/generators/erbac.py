"""ERBAC (enterprise RBAC) generator.

Semantics follow ERBACDataGenerator (reference
services/rbac_generator/erbac_data_generator.py:29):

- n_froles functional roles each own a unique random doc set of size
  1..m_perms; a fix-up pass distributes uncovered documents round-robin
  respecting m_perms (growing a role past m_perms only if every role is
  full).
- n_broles business roles each reference a unique random subset of
  1..m_froles functional roles.
- Each user holds 1..m_broles business roles; the user's effective role
  set (what lands in UserRoles in the reference) is the union of the
  functional roles behind their business roles.

The RBACWorld's roles are the functional roles — the grantable
permission-bearing unit — matching how the reference persists ERBAC data.
"""

from __future__ import annotations

from typing import Dict, Tuple

from ..world import RBACWorld
from .base import RBACGenerator


class ERBACGenerator(RBACGenerator):
    def __init__(
        self,
        num_users: int = 10000,
        n_froles: int = 100,
        n_broles: int = 50,
        num_docs: int = 10000,
        m_perms: int = 300,
        m_froles: int = 3,
        m_broles: int = 2,
        seed: int = 0,
    ):
        super().__init__(seed)
        self.num_users = num_users
        self.n_froles = n_froles
        self.n_broles = n_broles
        self.num_docs = num_docs
        self.m_perms = m_perms
        self.m_froles = m_froles
        self.m_broles = m_broles
        if n_froles * m_perms < num_docs:
            raise ValueError("n_froles * m_perms must cover num_docs")

    def generate(self) -> RBACWorld:
        rng = self.rng
        # functional role -> docs, unique sets
        seen: set = set()
        frole_docs: Dict[int, set] = {}
        for r in range(self.n_froles):
            for _ in range(1000):
                size = int(rng.integers(1, self.m_perms + 1))
                docs = tuple(sorted(rng.choice(self.num_docs, size=size, replace=False).tolist()))
                if docs not in seen:
                    seen.add(docs)
                    frole_docs[r] = set(docs)
                    break
            else:
                raise RuntimeError("could not draw a unique permission set")

        # coverage fix-up: deal uncovered docs round-robin, respecting m_perms
        covered = set().union(*frole_docs.values())
        uncovered = sorted(set(range(self.num_docs)) - covered)
        roles_cycle = list(range(self.n_froles))
        ptr = 0
        for doc in uncovered:
            for _ in range(self.n_froles):
                role = roles_cycle[ptr % self.n_froles]
                ptr += 1
                if len(frole_docs[role]) < self.m_perms:
                    frole_docs[role].add(doc)
                    break
            else:  # every role at m_perms: place anyway to keep coverage total
                frole_docs[roles_cycle[ptr % self.n_froles]].add(doc)
                ptr += 1

        # business role -> functional roles, unique subsets
        seen_b: set = set()
        brole_froles: Dict[int, Tuple[int, ...]] = {}
        for b in range(self.n_broles):
            for _ in range(1000):
                size = int(rng.integers(1, self.m_froles + 1))
                fr = tuple(sorted(rng.choice(self.n_froles, size=size, replace=False).tolist()))
                if fr not in seen_b:
                    seen_b.add(fr)
                    brole_froles[b] = fr
                    break
            else:
                raise RuntimeError("could not draw a unique business role")

        # user -> business roles -> effective functional role set
        user_to_roles: Dict[int, Tuple[int, ...]] = {}
        for u in range(self.num_users):
            n_b = int(rng.integers(1, self.m_broles + 1))
            broles = rng.choice(self.n_broles, size=n_b, replace=False)
            froles: set = set()
            for b in broles.tolist():
                froles.update(brole_froles[b])
            user_to_roles[u] = tuple(sorted(froles))

        world = RBACWorld(
            num_users=self.num_users,
            num_roles=self.n_froles,
            num_docs=self.num_docs,
            user_to_roles=user_to_roles,
            role_to_docs={r: frozenset(d) for r, d in frole_docs.items()},
        )
        world.validate()
        return world
