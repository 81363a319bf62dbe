"""Multi-chip searcher: the single-arena scan over a device mesh.

Presents the same search_batch API as partition.PartitionedSearcher but
executes on a (repl x shard) mesh: corpus rows sharded over `shard`
(each chip scans N/S rows from local HBM), query batches data-parallel
over `repl`, per-shard top-k merged with one all-gather over ICI. This is
the scale-out story the reference lacks (single Postgres instance,
SURVEY.md section 2.5) — QPS scales ~linearly in chips because the merge
traffic (S*Q*k*8 bytes) is negligible against local HBM scans.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..core import Corpus
from ..rbac.world import RBACWorld
from ..utils.logger import get_logger
from .mesh import REPL_AXIS, SHARD_AXIS, make_mesh
from .sharded import shard_arena_arrays, sharded_masked_topk

logger = get_logger("parallel.searcher")


class ShardedGlobalSearcher:
    """RLS-analog global searcher over a mesh (fused-bitmask exact/approx
    scan, rows sharded across chips)."""

    name = "rls_sharded"

    def __init__(
        self,
        corpus: Corpus,
        world: RBACWorld,
        mesh=None,
        n_devices: Optional[int] = None,
        n_replicas: int = 1,
        block_rows: int = 16384,
        dtype: str = "float32",
        mode: str = "exact",
    ):
        import jax
        import jax.numpy as jnp

        self.mesh = mesh or make_mesh(n_devices, n_replicas=n_replicas)
        self.n_shards = self.mesh.shape[SHARD_AXIS]
        self.n_repl = self.mesh.shape[REPL_AXIS]
        self.block_rows = block_rows
        self.mode = mode
        self.world = world

        n, d = corpus.n, corpus.dim
        # pad so every shard holds a whole number of blocks
        unit = block_rows * self.n_shards
        npad = ((n + unit - 1) // unit) * unit
        bits = np.zeros((npad, world.words), dtype=np.uint32)
        bits[:n] = corpus.vector_role_bits(world)

        self.quantized = dtype == "int8"
        if self.quantized:
            # the FLAGSHIP path, sharded: the same int8 fused Pallas kernel
            # the single-chip bench measures, rows split over chips
            from ..core import (
                ArenaQuant, bits_to_onehot8, quantize_corpus,
            )
            from .sharded import shard_quant_arrays

            xq, nq_, scale, center, lossless, qclip = quantize_corpus(
                corpus.vectors, npad)
            r_pad = ((world.num_roles + 127) // 128) * 128
            roles8 = bits_to_onehot8(bits, world.num_roles, r_pad)
            vq, nqd, r8 = shard_quant_arrays(self.mesh, xq, nq_, roles8)
            self._quant = ArenaQuant(
                vectors_q=vq, norms_q=nqd, roles8=r8, scale=scale,
                center=center, lossless=lossless, qclip=qclip)
            self.num_roles = world.num_roles
        else:
            vecs = np.zeros((npad, d), dtype=np.float32)
            vecs[:n] = corpus.vectors
            norms = np.zeros(npad, dtype=np.float32)
            norms[:n] = np.einsum("nd,nd->n", corpus.vectors, corpus.vectors)
            self._vectors, self._norms, self._bits = shard_arena_arrays(
                self.mesh, vecs.astype(jnp.dtype(dtype)), norms, bits
            )
        self.n = n
        self.npad = npad
        logger.info("sharded arena: %d rows over %d shards x %d replicas (%s)",
                    npad, self.n_shards, self.n_repl, dtype)

    def search_batch(
        self, queries: np.ndarray, user_ids: np.ndarray,
        user_masks: np.ndarray, k: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        from ..rbac.world import query_masks_for

        q = np.asarray(queries, dtype=np.float32)
        user_ids = np.asarray(user_ids)
        masks = query_masks_for(user_masks, user_ids)
        nq = q.shape[0]
        if self.quantized:
            import jax

            from .sharded import sharded_int8_topk

            quant = self._quant
            # pad so each replica's slice divides the kernel q_tile
            q_tile = min(256, 1 << (max(nq // self.n_repl, 1) - 1).bit_length())
            unit = self.n_repl * q_tile
            pad = (-nq) % unit
            if pad:
                q = np.concatenate([q, np.zeros((pad, q.shape[1]), np.float32)])
                masks = np.concatenate(
                    [masks, np.zeros((pad, masks.shape[1]), np.uint32)])
            q8, qn = quant.quantize_queries(q)
            m8 = quant.quantize_masks(masks, self.num_roles)
            interp = jax.default_backend() == "cpu"
            d, i = sharded_int8_topk(
                self.mesh, jnp.asarray(q8), jnp.asarray(qn),
                quant.vectors_q, quant.norms_q, quant.roles8,
                jnp.asarray(m8), jnp.float32(1.0 / quant.scale**2), k,
                q_tile=q_tile, block_rows=min(self.block_rows, 4096),
                group=self._int8_group(), interpret=interp,
                score_shift=quant.score_shift,
            )
            return np.asarray(d)[:nq], np.asarray(i)[:nq].astype(np.int64)
        # pad query count to a replica multiple
        pad = (-nq) % self.n_repl
        if pad:
            q = np.concatenate([q, np.zeros((pad, q.shape[1]), np.float32)])
            masks = np.concatenate([masks, np.zeros((pad, masks.shape[1]), np.uint32)])
        d, i = sharded_masked_topk(
            self.mesh, jnp.asarray(q), self._vectors, self._norms, self._bits,
            jnp.asarray(masks), k=k, block_rows=self.block_rows, mode=self.mode,
        )
        return np.asarray(d)[:nq], np.asarray(i)[:nq].astype(np.int64)

    def _int8_group(self) -> int:
        """Per-shard group-min width: keep >= 8192 group minima per chip
        (same collision-floor policy as Int8FlatIndex)."""
        local = self.npad // self.n_shards
        fit = local // 8192
        if fit >= 8:
            return min(128, 1 << (fit.bit_length() - 1))
        return 8

    def storage_report(self):
        mb = 1024 * 1024
        if self.quantized:
            q = self._quant
            total = self.npad * (q.vectors_q.shape[1] + 4
                                 + q.roles8.shape[1])
        else:
            d = self._vectors.shape[1]
            total = self.npad * (d * self._vectors.dtype.itemsize + 4
                                 + 4 * self._bits.shape[1])
        return {
            "total_mb": total / mb,
            "per_shard_mb": total / mb / self.n_shards,
            "num_partitions": self.n_shards,
        }
