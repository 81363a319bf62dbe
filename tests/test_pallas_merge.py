"""All-Pallas group-minima merge (ops/pallas_merge.py), interpret mode.

Production geometry (nsub=32, t=16, npc=512) runs on TPU and is
cross-checked against the cascade on the real 1M shape in
scripts/r4_merge_lab6.py (output-identical); these tests exercise the
same kernels at a small geometry the CPU interpreter can afford."""

import numpy as np
import pytest

import jax.numpy as jnp

from vectorsearch_rbac_tpu.ops.pallas_merge import (
    merge_supported, pallas_merge_topk,
)

MASKED = 0x7F000000


@pytest.fixture(scope="module")
def packed():
    rng = np.random.default_rng(3)
    ng, q = 512, 128
    p = (rng.integers(1 << 10, 1 << 28, size=(ng, q), dtype=np.int64)
         .astype(np.int32) & ~np.int32(127))
    p |= rng.integers(0, 128, size=(ng, q), dtype=np.int64).astype(np.int32)
    # query 5: only 3 admissible groups; query 7: none at all
    p[3:, 5] = MASKED
    p[:, 7] = MASKED
    return p


def test_pallas_merge_matches_exact(packed):
    k = 10
    vals, pos = pallas_merge_topk(jnp.asarray(packed), k, nsub=8, t=8,
                                  q_tile=128, interpret=True)
    vals, pos = np.asarray(vals), np.asarray(pos)
    mt = packed.T
    order = np.argsort(mt, axis=1, kind="stable")[:, :k]
    want = np.take_along_axis(mt, order, axis=1)
    for qi in range(mt.shape[0]):
        got_real = vals[qi][vals[qi] < MASKED]
        want_real = want[qi][want[qi] < MASKED]
        np.testing.assert_array_equal(np.sort(got_real),
                                      np.sort(want_real), err_msg=f"q{qi}")
        # positions agree with values: packed[pos, qi] == vals
        back = packed[pos[qi][vals[qi] < MASKED], qi]
        np.testing.assert_array_equal(back, got_real)
    assert (np.diff(vals, axis=1) >= 0).all()


def test_pallas_merge_drained_subgroups(packed):
    """Queries with fewer admissible groups than k: the extraction
    sentinel (INT32_MAX) must land in the empty-detection range, never
    decode to a row."""
    k = 10
    vals, pos = pallas_merge_topk(jnp.asarray(packed), k, nsub=8, t=8,
                                  q_tile=128, interpret=True)
    vals = np.asarray(vals)
    EMPTY = 0x7E000000
    assert (vals[5, 3:] >= EMPTY).all()   # only 3 real candidates
    assert (vals[5, :3] < EMPTY).all()
    assert (vals[7] >= EMPTY).all()       # nothing admissible


def test_merge_supported_gate():
    assert merge_supported(8192, 2048, 100)          # the 1M headline shape
    assert merge_supported(78848, 2048, 100)         # the 10M shape
    assert not merge_supported(8192, 2048, 600)      # k beyond survivors
    assert not merge_supported(100, 2048, 10)        # sub not 8-multiple
    assert not merge_supported(1024, 2048, 10)       # sub < 64


def test_merge_supported_rejects_undividable_q_tile():
    """ADVICE r4: a large-but-awkward query count whose only multiple-of-8
    divisors are tiny must be rejected (the old path forced qt = nq and
    blew the VMEM budget instead of falling back to the cascade)."""
    from vectorsearch_rbac_tpu.ops.pallas_merge import _pick_q_tile

    nq = 8 * 331                                     # 2648: divisors 8, 2648
    assert _pick_q_tile(64, nq, 2048) == 8           # exists but tiny
    assert not merge_supported(8192, nq, 100)        # gate rejects it
    # 2560 at 10M-scale sub: budget-constrained divisor is found, not nq
    sub = 78848 // 32
    qt = _pick_q_tile(sub, 2560, 2048)
    assert qt > 0 and 2560 % qt == 0 and sub * qt * 4 <= 2_600_000
    assert merge_supported(78848, 2560, 100)
    # the 16384-group 1M crossover shape that OOM'd scoped VMEM at
    # qt=2048 (sub=512 block 4.2 MB -> 19.7 MB stack): the calibrated
    # budget must cap its block at ~2 MB
    qt = _pick_q_tile(16384 // 32, 2048, 2048)
    assert qt > 0 and (16384 // 32) * qt * 4 <= 2_600_000, qt
    # headline 8192-group shape keeps the full 2048 tile
    assert _pick_q_tile(8192 // 32, 2048, 2048) == 2048
