"""Multi-host (DCN) ingestion sharding: assemble one globally-sharded
arena from per-host local row shards.

The reference is single-node by construction (one Postgres instance;
SURVEY.md section 2.5) — this is the remaining scale-out surface the TPU
rebuild owns beyond single-host ICI sharding (parallel/sharded.py): on a
multi-host pod slice, each HOST ingests only its slice of the corpus
(read from its local files / object-store range), quantizes it locally,
and contributes process-local shards to ONE jax.Array per arena column via
`jax.make_array_from_process_local_data`. The global (host, chip) mesh
puts the row axis over hosts x chips, so

  - ingestion bandwidth scales with hosts (no host ever materializes the
    full corpus — a 10B-row corpus is ingested as N_host slices),
  - the serving collectives (the all-gather top-k merge in
    sharded_int8_topk / sharded_masked_topk) ride ICI within a host and
    cross DCN only for the final (S, Q, k) candidate exchange, which is
    tiny (k * 8 bytes per query per shard).

On a single process (`jax.process_count() == 1`, e.g. the CPU test mesh or
the one-chip bench host) the same code path degenerates to a plain
device_put-sharded upload, so it is exercised by the regular test suite;
the process-spanning behavior is the documented contract of
`make_array_from_process_local_data` (each process passes only its
addressable shard of the global (Npad, ...) aval).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..core import bits_to_onehot8, quantize_corpus
from ..rbac.world import RBACWorld
from ..utils.logger import get_logger
from .mesh import SHARD_AXIS

logger = get_logger("parallel.multihost")


def local_row_range(n_global: int, block_rows: int = 4096,
                    process_index: Optional[int] = None,
                    process_count: Optional[int] = None) -> Tuple[int, int]:
    """[start, end) of the corpus rows THIS host should ingest: the global
    padded row space splits evenly over processes on block boundaries."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    npad = _pad(n_global, block_rows * pc)
    per = npad // pc
    return pi * per, min((pi + 1) * per, n_global)


def _pad(n: int, unit: int) -> int:
    return ((max(n, 1) + unit - 1) // unit) * unit


def multihost_quant_arena(
    local_vectors: np.ndarray,      # this host's corpus slice (rows, d)
    local_doc_bits: np.ndarray,     # (rows, W) uint32 role bitsets
    world: RBACWorld,
    mesh,                           # global Mesh with a SHARD_AXIS row axis
    n_global: int,                  # total corpus rows across hosts
    block_rows: int = 4096,
    scale_hint: Optional[Tuple[float, np.ndarray, int]] = None,
    # (scale, center, qclip): quantization params must be GLOBAL — either
    # precomputed from corpus stats (one cheap metadata pass / a sample) or
    # the known dataset family (SIFT: scale 1, center 128). Defaults to
    # fitting on the local slice, which is exact for integer-valued
    # corpora and approximate otherwise.
):
    """Each host quantizes its slice and contributes process-local shards
    of the global int8 arena columns. Returns device arrays shaped/sharded
    like shard_quant_arrays' output plus (scale, center, qclip)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    pc = jax.process_count()
    # row padding unit: whole blocks per SHARD chip; the shard axis spans
    # pc processes x (shards/pc) local chips, so npad divides pc evenly
    npad = _pad(n_global, block_rows * max(mesh.shape[SHARD_AXIS], pc))
    local_pad = npad // pc

    # quantize locally with GLOBAL params
    n_local, d = local_vectors.shape
    if scale_hint is None:
        xq, nq_, scale, center, lossless, qclip = quantize_corpus(
            local_vectors, local_pad)
    else:
        scale, center, qclip = scale_hint
        d_pad = ((d + 127) // 128) * 128
        xq = np.zeros((local_pad, d_pad), dtype=np.int8)
        xs = (local_vectors - center[None, :]) * scale
        xq[:n_local, :d] = np.clip(
            np.rint(xs), -qclip, min(qclip, 127)).astype(np.int8)
        x64 = xq[:n_local].astype(np.int64)
        nq_ = np.zeros(local_pad, dtype=np.int32)
        nq_[:n_local] = np.einsum("nd,nd->n", x64, x64).astype(np.int32)
    r_pad = ((world.num_roles + 127) // 128) * 128
    bits_pad = np.zeros((local_pad, local_doc_bits.shape[1]), np.uint32)
    bits_pad[:n_local] = local_doc_bits
    roles8 = bits_to_onehot8(bits_pad, world.num_roles, r_pad)

    spec2 = NamedSharding(mesh, P(SHARD_AXIS, None))
    spec1 = NamedSharding(mesh, P(SHARD_AXIS))

    def _global(local, spec, gshape):
        if pc == 1:
            return jax.device_put(local, spec)
        return jax.make_array_from_process_local_data(spec, local, gshape)

    vq = _global(xq, spec2, (npad, xq.shape[1]))
    nq_d = _global(nq_, spec1, (npad,))
    r8 = _global(roles8, spec2, (npad, r_pad))
    logger.info(
        "multihost arena: %d global rows (%d padded) over %d processes, "
        "%d local rows on this host",
        n_global, npad, pc, n_local,
    )
    return vq, nq_d, r8, (scale, center, qclip)
