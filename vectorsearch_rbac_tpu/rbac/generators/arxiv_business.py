"""Category-driven business-role generator (the arXiv generator).

Semantics follow ArXivGeneratorWithBusinessRoles (reference
services/rbac_generator/arxiv_generator_business.py:20): documents carry
category labels (arXiv primary categories in the reference); each category
becomes a *functional role* owning exactly its documents; *business roles*
sample several functional roles; users hold business roles, and their
effective role set is the union of the sampled functional roles.

Category labels come from a metadata mapping (doc id -> category). When no
real metadata is available (zero-egress environments), `synthetic_categories`
draws zipf-distributed labels so category sizes are realistically skewed.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Mapping, Tuple

import numpy as np

from ..world import RBACWorld
from .base import RBACGenerator


def synthetic_categories(num_docs: int, num_categories: int, seed: int = 0,
                         zipf_a: float = 1.5) -> np.ndarray:
    """Zipf-skewed category labels (arXiv category sizes are heavy-tailed)."""
    rng = np.random.default_rng(seed)
    raw = rng.zipf(zipf_a, size=num_docs) - 1
    return (raw % num_categories).astype(np.int64)


class ArxivBusinessRBACGenerator(RBACGenerator):
    def __init__(
        self,
        num_users: int = 10000,
        n_broles: int = 50,
        num_docs: int = 10000,
        doc_categories: Mapping[int, int] | np.ndarray | None = None,
        num_categories: int = 40,
        m_froles: int = 3,
        m_broles: int = 2,
        seed: int = 0,
    ):
        super().__init__(seed)
        self.num_users = num_users
        self.n_broles = n_broles
        self.num_docs = num_docs
        self.m_froles = m_froles
        self.m_broles = m_broles
        if doc_categories is None:
            doc_categories = synthetic_categories(num_docs, num_categories, seed)
        self.doc_categories = np.asarray(
            [doc_categories[d] for d in range(num_docs)], dtype=np.int64
        ) if not isinstance(doc_categories, np.ndarray) else doc_categories

    def generate(self) -> RBACWorld:
        rng = self.rng
        # functional role per category that actually has documents
        cat_docs: Dict[int, set] = defaultdict(set)
        for doc, cat in enumerate(self.doc_categories.tolist()):
            cat_docs[int(cat)].add(doc)
        cats = sorted(cat_docs)
        role_of_cat = {c: i for i, c in enumerate(cats)}
        n_froles = len(cats)
        role_to_docs = {role_of_cat[c]: frozenset(cat_docs[c]) for c in cats}

        # business roles sample functional roles (unique combinations)
        seen: set = set()
        brole_froles: Dict[int, Tuple[int, ...]] = {}
        for b in range(self.n_broles):
            for _ in range(1000):
                size = int(rng.integers(1, self.m_froles + 1))
                fr = tuple(sorted(rng.choice(n_froles, size=size, replace=False).tolist()))
                if fr not in seen:
                    seen.add(fr)
                    brole_froles[b] = fr
                    break
            else:
                raise RuntimeError("could not draw a unique business role")

        user_to_roles: Dict[int, Tuple[int, ...]] = {}
        for u in range(self.num_users):
            n_b = int(rng.integers(1, self.m_broles + 1))
            froles: set = set()
            for b in rng.choice(self.n_broles, size=n_b, replace=False).tolist():
                froles.update(brole_froles[b])
            user_to_roles[u] = tuple(sorted(froles))

        world = RBACWorld(
            num_users=self.num_users,
            num_roles=n_froles,
            num_docs=self.num_docs,
            user_to_roles=user_to_roles,
            role_to_docs=role_to_docs,
        )
        world.validate()
        return world
