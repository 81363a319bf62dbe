"""IVF-Flat index: k-means clustering + padded inverted lists.

Replaces pgvector's IVFFlat access method (reference pgvector/src/
ivfbuild.c, ivfkmeans.c, ivfscan.c; GUC ivfflat.probes) with a TPU-native
layout: centroids fitted with the batched device k-means (ops/kmeans.py),
rows bucketed into (nlist, L_pad) padded inverted lists so every probe is
a static-shape gather + matmul. Padding slots carry zero role bits and
row id -1, so the fused permission check rejects them for free.

Oversized lists spill: rows beyond L_pad are reassigned to their
next-nearest centroid with space (keeps exactness of membership while
bounding padding waste).
"""

from __future__ import annotations

import math
import time
from typing import Dict, Optional, Tuple

import numpy as np

from ..core import DeviceArena
from ..ops.ivf_scan import ivf_search_fn
from ..ops.kmeans import assign_clusters_blocked, kmeans_fit, kmeans_init
from ..utils.logger import get_logger

logger = get_logger("index.ivf")


class IVFIndex:
    def __init__(
        self,
        arena: DeviceArena,
        rows: Optional[np.ndarray] = None,
        nlist: int = 1024,
        nprobe: int = 16,
        kmeans_iters: int = 10,
        query_batch: int = 256,
        seed: int = 0,
        pad_quantile: float = 0.995,
        train_sample: int = 200_000,
    ):
        import jax
        import jax.numpy as jnp

        self.query_batch = query_batch
        self.nprobe = nprobe
        self.metric = arena.metric
        # pgvector parity: ivfflat ships l2/ip/cosine opclasses only
        assert self.metric != "l1", "IVF has no l1 opclass (use flat/hnsw)"

        if arena.host_vectors is not None:
            host_vec = arena.host_vectors
            host_norm = arena.host_norms
            host_bits = arena.host_bits
        else:
            host_vec = np.asarray(arena.vectors, dtype=np.float32)
            host_norm = np.asarray(arena.norms)
            host_bits = np.asarray(arena.role_bits)

        if rows is None:
            rows = np.arange(arena.n, dtype=np.int64)
        else:
            rows = np.asarray(rows, dtype=np.int64)
        self.n_rows = len(rows)
        vec = host_vec[rows]
        d = vec.shape[1]

        nlist = max(1, min(nlist, self.n_rows))
        self.nlist = nlist
        self.nprobe = min(nprobe, nlist)

        # ---- train centroids on a sample, assign all rows
        t0 = time.perf_counter()
        rng = np.random.default_rng(seed)
        sample = vec if len(vec) <= train_sample else vec[
            rng.choice(len(vec), train_sample, replace=False)
        ]
        init = kmeans_init(sample, nlist, seed=seed)
        centroids, _ = kmeans_fit(
            jnp.asarray(sample), jnp.asarray(init), iters=kmeans_iters
        )
        self._centroids = centroids.astype(jnp.float32)
        assign = assign_clusters_blocked(vec, self._centroids)
        self.build_time_s = time.perf_counter() - t0

        # ---- bucket rows into padded lists with spill to next centroid
        counts = np.bincount(assign, minlength=nlist)
        l_pad = int(np.quantile(counts, pad_quantile)) if nlist > 1 else int(counts[0])
        l_pad = max(8, int(math.ceil(l_pad / 8) * 8))
        cent_np = np.asarray(self._centroids)

        list_rows: list[list[int]] = [[] for _ in range(nlist)]
        spill: list[int] = []
        for i, c in enumerate(assign.tolist()):
            if len(list_rows[c]) < l_pad:
                list_rows[c].append(i)
            else:
                spill.append(i)
        if spill:
            sv = vec[spill]
            cd = (
                np.einsum("nd,nd->n", sv, sv)[:, None]
                - 2.0 * sv @ cent_np.T
                + np.einsum("cd,cd->c", cent_np, cent_np)[None, :]
            )
            order = np.argsort(cd, axis=1)
            for j, i in enumerate(spill):
                placed = False
                for c in order[j]:
                    if len(list_rows[int(c)]) < l_pad:
                        list_rows[int(c)].append(i)
                        placed = True
                        break
                if not placed:  # every list full: grow padding once
                    l_pad = int(l_pad * 1.25 + 8) // 8 * 8
                    list_rows[int(order[j, 0])].append(i)
        self.l_pad = l_pad

        inv_vec = np.zeros((nlist, l_pad, d), dtype=np.float32)
        inv_norm = np.zeros((nlist, l_pad), dtype=np.float32)
        inv_bits = np.zeros((nlist, l_pad, host_bits.shape[1]), dtype=np.uint32)
        inv_rows = np.full((nlist, l_pad), -1, dtype=np.int32)
        for c, members in enumerate(list_rows):
            m = len(members)
            if not m:
                continue
            local = np.asarray(members, dtype=np.int64)
            arena_ids = rows[local]
            inv_vec[c, :m] = vec[local]
            inv_norm[c, :m] = host_norm[arena_ids]
            inv_bits[c, :m] = host_bits[arena_ids]
            inv_rows[c, :m] = arena_ids.astype(np.int32)

        compute_dtype = arena.vectors.dtype
        self._inv_vectors = jax.device_put(inv_vec.astype(compute_dtype))
        self._inv_norms = jax.device_put(inv_norm)
        self._inv_bits = jax.device_put(inv_bits)
        self._inv_rows = jax.device_put(inv_rows)
        logger.info(
            "IVF built: %d rows, nlist=%d, L_pad=%d (fill %.1f%%), %.2fs",
            self.n_rows, nlist, l_pad,
            100.0 * self.n_rows / (nlist * l_pad), self.build_time_s,
        )

    # ------------------------------------------------------------- search

    def search(
        self, queries: np.ndarray, query_masks: np.ndarray, k: int,
        nprobe: Optional[int] = None,
        iterative: bool = False,         # ivfflat.iterative_scan analog
                                         # (reference pgvector/src/ivfscan.c:257,
                                         # ivfflat.c:44-50): low-selectivity
                                         # queries that fill fewer than k
                                         # admissible slots re-probe with a
                                         # doubled probe budget
        max_probes: Optional[int] = None,  # ivfflat.max_probes analog
    ) -> Tuple[np.ndarray, np.ndarray]:
        nprobe = min(nprobe or self.nprobe, self.nlist)
        q = np.asarray(queries, dtype=np.float32)
        m = np.asarray(query_masks, dtype=np.uint32)
        nq = q.shape[0]
        out_d = np.empty((nq, k), dtype=np.float32)
        out_i = np.empty((nq, k), dtype=np.int64)
        self._dispatch(q, m, k, nprobe, out_d, out_i, np.arange(nq))

        if iterative:
            # expand probes for the queries that came back short — the
            # batched form of pgvector's resume-the-scan loop. Probe counts
            # double (pow2 ladder: one compile per rung), so a deficient
            # query pays at most 2x the probes it needed.
            cap = min(max_probes or self.nlist, self.nlist)
            np2 = nprobe
            while np2 < cap:
                np2 = min(np2 * 2, cap)
                short = np.flatnonzero((out_i < 0).any(axis=1))
                if not len(short):
                    break
                self._dispatch(q[short], m[short], k, np2,
                               out_d, out_i, short)
        return out_d, out_i

    def _dispatch(self, q, m, k, nprobe, out_d, out_i, dest) -> None:
        """One padded-batch pass at a fixed nprobe; writes rows `dest`."""
        import jax.numpy as jnp

        nq = q.shape[0]
        bs = self.query_batch
        pending = []  # async dispatch, single sync at the end
        for s in range(0, nq, bs):
            e = min(s + bs, nq)
            qb = np.zeros((bs, q.shape[1]), dtype=np.float32)
            mb = np.zeros((bs, m.shape[1]), dtype=np.uint32)
            qb[: e - s] = q[s:e]
            mb[: e - s] = m[s:e]
            d, i = ivf_search_fn(
                jnp.asarray(qb), self._centroids, self._inv_vectors,
                self._inv_norms, self._inv_bits, self._inv_rows,
                jnp.asarray(mb), k, nprobe, metric=self.metric,
            )
            pending.append((s, e, d, i))
        for s, e, d, i in pending:
            out_d[dest[s:e]] = np.asarray(d)[: e - s]
            out_i[dest[s:e]] = np.asarray(i)[: e - s]

    # -------------------------------------------------------- maintenance

    def insert_rows(self, arena: DeviceArena, new_rows: np.ndarray) -> None:
        """Online insert — the pgvector IVFFlat insert analog (reference
        pgvector/src/ivfinsert.c: each new tuple is appended to its nearest
        centroid's list; centroids are never retrained). Lists here are
        padded device slabs, so inserts fill free slots (padding or
        previously deleted) and the slabs re-upload once per call:

        - each new row goes to its nearest centroid with a free slot
          (same spill rule as the build);
        - if every list on a row's preference order is full, L_pad grows
          once (×1.25) and the slabs re-pad — the analog of pgvector
          extending a list onto a fresh page.
        """
        import jax

        new_rows = np.asarray(new_rows, dtype=np.int64)
        if new_rows.size == 0:
            return
        if arena.host_vectors is not None:
            vec = arena.host_vectors[new_rows].astype(np.float32)
            norm = arena.host_norms[new_rows]
            bits = arena.host_bits[new_rows]
        else:
            vec = np.asarray(arena.vectors, dtype=np.float32)[new_rows]
            norm = np.asarray(arena.norms)[new_rows]
            bits = np.asarray(arena.role_bits)[new_rows]

        inv_vec = np.array(self._inv_vectors, dtype=np.float32)
        inv_norm = np.array(self._inv_norms)
        inv_bits = np.array(self._inv_bits)
        inv_rows = np.array(self._inv_rows)
        cent_np = np.asarray(self._centroids, dtype=np.float32)

        # full preference order per new row (nearest centroid first)
        cd = (
            np.einsum("nd,nd->n", vec, vec)[:, None]
            - 2.0 * vec @ cent_np.T
            + np.einsum("cd,cd->c", cent_np, cent_np)[None, :]
        )
        order = np.argsort(cd, axis=1)
        free: list[list[int]] = [
            np.flatnonzero(inv_rows[c] < 0).tolist() for c in range(self.nlist)
        ]
        placements: list[tuple[int, int, int]] = []  # (list, slot, new idx)
        grow = 0
        for j in range(len(new_rows)):
            placed = False
            for c in order[j]:
                if free[int(c)]:
                    placements.append((int(c), free[int(c)].pop(0), j))
                    placed = True
                    break
            if not placed:
                grow += 1
                placements.append((int(order[j, 0]), -1, j))
        if grow:
            old_pad = self.l_pad
            need = int(np.max(np.bincount(
                [c for c, s, _ in placements if s < 0], minlength=self.nlist)))
            new_pad = max(int(old_pad * 1.25) + 8, old_pad + need)
            new_pad = int(math.ceil(new_pad / 8) * 8)
            pad = new_pad - old_pad
            inv_vec = np.pad(inv_vec, ((0, 0), (0, pad), (0, 0)))
            inv_norm = np.pad(inv_norm, ((0, 0), (0, pad)))
            inv_bits = np.pad(inv_bits, ((0, 0), (0, pad), (0, 0)))
            inv_rows = np.pad(inv_rows, ((0, 0), (0, pad)),
                              constant_values=-1)
            nxt = [old_pad] * self.nlist
            fixed = []
            for c, s, j in placements:
                if s < 0:
                    s = nxt[c]
                    nxt[c] += 1
                fixed.append((c, s, j))
            placements = fixed
            self.l_pad = new_pad
            logger.info("IVF insert grew L_pad %d -> %d", old_pad, new_pad)

        for c, s, j in placements:
            inv_vec[c, s] = vec[j]
            inv_norm[c, s] = norm[j]
            inv_bits[c, s] = bits[j]
            inv_rows[c, s] = int(new_rows[j])

        compute_dtype = self._inv_vectors.dtype
        self._inv_vectors = jax.device_put(inv_vec.astype(compute_dtype))
        self._inv_norms = jax.device_put(inv_norm)
        self._inv_bits = jax.device_put(inv_bits)
        self._inv_rows = jax.device_put(inv_rows)
        self.n_rows += len(new_rows)

    def delete_rows(self, arena: DeviceArena, rows: np.ndarray) -> int:
        """Row-level delete — the pgvector IVFFlat vacuum analog (reference
        pgvector/src/ivfvacuum.c: dead tuples leave their list pages; lists
        themselves persist). Slots free (row -1, zero bits) and are reused
        by later insert_rows; pair with core.tombstone_rows so arena-backed
        paths agree. Returns the number of rows deleted."""
        import jax

        rows = np.asarray(rows, dtype=np.int64)
        inv_rows = np.asarray(self._inv_rows)
        hit = np.isin(inv_rows, rows.astype(np.int32)) & (inv_rows >= 0)
        ndel = int(hit.sum())
        if not ndel:
            return 0
        inv_bits = np.array(self._inv_bits)
        inv_rows = inv_rows.copy()
        inv_rows[hit] = -1
        inv_bits[hit] = 0
        self._inv_rows = jax.device_put(inv_rows)
        self._inv_bits = jax.device_put(inv_bits)
        self.n_rows -= ndel
        return ndel

    # ------------------------------------------------------------ storage

    def storage_bytes(self) -> Dict[str, int]:
        d = self._inv_vectors.shape[2]
        w = self._inv_bits.shape[2]
        slots = self.nlist * self.l_pad
        vec_bytes = slots * d * self._inv_vectors.dtype.itemsize
        aux = slots * (4 + 4 * w + 4) + self.nlist * d * 4  # norms+bits+rows+centroids
        return {"vectors": int(vec_bytes), "index": int(aux)}
