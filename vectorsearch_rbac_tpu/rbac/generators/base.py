"""Shared scaffolding for synthetic RBAC world generators.

The reference ships four synthetic generators plus an arXiv-metadata one
(services/rbac_generator/*). Ours are seeded (`np.random.Generator`) so the
same parameters always produce the same world — the deterministic-fixture
requirement of SURVEY.md section 4.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import List

import numpy as np

from ..world import RBACWorld


class RBACGenerator(ABC):
    """Generate an RBACWorld for `num_docs` documents."""

    def __init__(self, seed: int = 0):
        self.rng = np.random.default_rng(seed)

    @abstractmethod
    def generate(self) -> RBACWorld:
        ...


def split_into_chunks(rng: np.random.Generator, n_items: int, n_chunks: int) -> List[np.ndarray]:
    """Shuffle 0..n_items-1 and split into n_chunks contiguous disjoint chunks
    (reference tree_based_rbac_data_generator.py:88-110
    split_documents_into_disjoint_sets — last chunk takes the remainder)."""
    perm = rng.permutation(n_items)
    size = n_items // n_chunks
    chunks = []
    for i in range(n_chunks):
        if i == n_chunks - 1:
            chunks.append(perm[i * size:])
        else:
            chunks.append(perm[i * size:(i + 1) * size])
    return chunks
