"""Role bitset packing.

Roles are packed into uint32 lanes so a permission check between a query's
role-set and a vector's role-set is `any(q_mask & v_bits)` — the form the
fused Pallas/XLA distance-scan kernels consume (SURVEY.md section 7 "Role
bitsets for 100-300+ roles ... pack as uint32 lanes"). This subsumes the
reference's SQL enforcement paths: RLS policies (reference
controller/baseline/pg_row_security/row_level_security.py:54-65) and the
per-query permission bitmap of the ACORN benchmark (reference
acorn_benchmark/src/benchmark_utils.cpp:342-392).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

WORD_BITS = 32


def num_words(num_roles: int) -> int:
    return max(1, (num_roles + WORD_BITS - 1) // WORD_BITS)


def role_mask(roles: Iterable[int], num_roles: int) -> np.ndarray:
    """Pack a set of 0-based role ids into a (W,) uint32 bitmask."""
    w = num_words(num_roles)
    mask = np.zeros(w, dtype=np.uint32)
    for r in roles:
        if not 0 <= r < num_roles:
            raise ValueError(f"role id {r} out of range [0, {num_roles})")
        mask[r // WORD_BITS] |= np.uint32(1 << (r % WORD_BITS))
    return mask


def pack_role_sets(role_sets: Sequence[Iterable[int]], num_roles: int) -> np.ndarray:
    """Pack n role-sets into an (n, W) uint32 bit matrix."""
    w = num_words(num_roles)
    out = np.zeros((len(role_sets), w), dtype=np.uint32)
    for i, roles in enumerate(role_sets):
        for r in roles:
            if not 0 <= r < num_roles:
                raise ValueError(f"role id {r} out of range [0, {num_roles})")
            out[i, r // WORD_BITS] |= np.uint32(1 << (r % WORD_BITS))
    return out


def unpack_mask(mask: np.ndarray, num_roles: int) -> set[int]:
    """Inverse of role_mask: bitmask -> set of role ids."""
    roles: set[int] = set()
    for w, word in enumerate(np.asarray(mask, dtype=np.uint64)):
        word = int(word)
        while word:
            low = word & -word
            roles.add(w * WORD_BITS + low.bit_length() - 1)
            word ^= low
    return {r for r in roles if r < num_roles}


def masks_intersect(a: np.ndarray, b: np.ndarray) -> bool:
    return bool(np.any(np.bitwise_and(a, b)))
