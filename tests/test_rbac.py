import numpy as np
import pytest

from vectorsearch_rbac_tpu.rbac.bitset import (
    masks_intersect,
    pack_role_sets,
    role_mask,
    unpack_mask,
)
from vectorsearch_rbac_tpu.rbac.generators import (
    ERBACGenerator,
    RandomRBACGenerator,
    SharingTreeRBACGenerator,
    TreeRBACGenerator,
)


def test_role_mask_roundtrip():
    roles = {0, 5, 31, 32, 63, 64, 90}
    mask = role_mask(roles, 100)
    assert mask.shape == (4,)
    assert unpack_mask(mask, 100) == roles


def test_pack_role_sets():
    bits = pack_role_sets([{0}, {1, 33}, set()], 40)
    assert bits.shape == (3, 2)
    assert bits[0, 0] == 1
    assert bits[1, 0] == 2 and bits[1, 1] == 2
    assert bits[2].sum() == 0
    assert masks_intersect(bits[0], role_mask({0, 7}, 40))
    assert not masks_intersect(bits[2], role_mask({0}, 40))


@pytest.mark.parametrize(
    "gen_cls,kwargs",
    [
        (TreeRBACGenerator, dict(num_users=100, num_roles=20, num_docs=150, h=3, b0=2, b1=3)),
        (SharingTreeRBACGenerator, dict(num_users=100, num_roles=20, num_docs=150, h=3,
                                        doc_sharing_distribution=(30, 2, 1, 5))),
        (ERBACGenerator, dict(num_users=100, n_froles=20, n_broles=10, num_docs=150,
                              m_perms=30, m_froles=3, m_broles=2)),
        (RandomRBACGenerator, dict(num_users=100, num_roles=20, num_docs=150,
                                   m_roles=3, m_perms=30)),
    ],
)
def test_generators_produce_valid_worlds(gen_cls, kwargs):
    world = gen_cls(seed=11, **kwargs).generate()
    world.validate()
    # deterministic: regenerate identical
    world2 = gen_cls(seed=11, **kwargs).generate()
    assert world.user_to_roles == world2.user_to_roles
    assert world.role_to_docs == world2.role_to_docs
    # different seed differs somewhere
    world3 = gen_cls(seed=12, **kwargs).generate()
    assert (world.user_to_roles != world3.user_to_roles
            or world.role_to_docs != world3.role_to_docs)


def test_tree_inheritance(small_world):
    """Child role permissions must be a superset of the parent's: with one
    role per user, any two roles whose doc sets intersect must be nested or
    share an ancestor chunk — weaker check: every role's docs non-empty and
    comb machinery consistent."""
    w = small_world
    assert all(len(d) > 0 for d in w.role_to_docs.values())
    assert all(len(c) == 1 for c in w.combs)  # tree gen: single role per user
    assert abs(sum(w.comb_weights.values()) - 1.0) < 1e-9


def test_doc_role_bits_consistency(small_world):
    w = small_world
    bits = w.doc_role_bits
    assert bits.shape == (w.num_docs, w.words)
    for r, docs in w.role_to_docs.items():
        col, b = r // 32, np.uint32(1 << (r % 32))
        has = (bits[:, col] & b) != 0
        assert set(np.nonzero(has)[0].tolist()) == set(docs)


def test_user_masks_and_selectivity(small_world):
    w = small_world
    assert w.user_masks.shape == (w.num_users, w.words)
    u = 0
    docs = w.user_docs(u)
    assert w.user_selectivity(u) == len(docs) / w.num_docs
    assert 0 < w.average_user_selectivity() <= 1
    assert w.storage_ratio() >= 1.0  # inheritance duplicates docs across roles


def test_role_insert_delete(small_world):
    w = small_world
    w2, new_role = w.with_new_role(range(10), users=[0, 1])
    assert new_role == w.num_roles
    assert w2.num_roles == w.num_roles + 1
    assert new_role in w2.user_to_roles[0]
    assert w2.role_to_docs[new_role] == frozenset(range(10))
    w3 = w2.without_role(new_role)
    assert new_role not in w3.user_to_roles[0]
    assert new_role not in w3.role_to_docs
