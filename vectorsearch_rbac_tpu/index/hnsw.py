"""HNSW index: native graph construction + batched device beam search.

Replaces pgvector's HNSW access method (reference pgvector/src/hnswbuild.c
build, hnswscan.c scan, GUC hnsw.ef_search) and the C++ pointer-graph
indexes (reference logical_partition_benchmark/.../pointer_hnsw_index.cpp:
graph-only index over the shared vector table). The graph addresses the
partition's row set; vectors live once in the gathered partition arrays
(or the arena itself for the global index) — the logical/pointer design.

Two builders:
- "classic": the native C++ Malkov-Yashunin construction
  (native/hnsw_builder.cpp vsr_hnsw_build);
- "tpu": device-side exact kNN graph (blockwise MXU matmuls) + native
  alpha-RNG prune (vsr_rng_prune) — a Vamana-style flat graph that builds
  orders of magnitude faster for large partitions.
"auto" picks tpu above 50k rows when a device is present.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import numpy as np

from ..core import DeviceArena
from ..ops.graph_search import (
    graph_search_filtered_fn,
    graph_search_fn,
    graph_search_iterative_fn,
)
from ..utils.logger import get_logger
from .flat import _pad_to_bucket

logger = get_logger("index.hnsw")

_SCATTER_FNS: dict = {}


def _scatter_rows(dev_arr, idx: np.ndarray, vals: np.ndarray):
    """Scatter-update rows of a device array: `dev_arr[idx] = vals` compiled
    with buffer donation (the old device buffer is reused in place). The
    index count pads to a pow2 bucket by repeating idx[0]/vals[0] (same
    value written twice — order-independent), so maintenance calls land on
    ~log2 compiled shapes instead of one per batch size."""
    import jax
    import jax.numpy as jnp

    n = len(idx)
    cap = max(1, 1 << (n - 1).bit_length()) if n else 1
    if n < cap:
        idx = np.concatenate([idx, np.full(cap - n, idx[0], idx.dtype)])
        vals = np.concatenate(
            [vals, np.broadcast_to(vals[0], (cap - n,) + vals.shape[1:])])
    fn = _SCATTER_FNS.get("fn")
    if fn is None:
        fn = jax.jit(lambda a, i, v: a.at[i].set(v), donate_argnums=(0,))
        _SCATTER_FNS["fn"] = fn
    return fn(dev_arr, jnp.asarray(idx), jnp.asarray(vals))


def _device_knn_graph_ivf(vec: np.ndarray, k: int, seed: int = 0) -> np.ndarray:
    """Approximate kNN graph via IVF probing — the scalable graph-build
    path: cluster once with device k-means, then find each row's neighbors
    among its nprobe nearest lists. ~O(N * nprobe * N/nlist * d) MXU work
    instead of O(N^2 d); the alpha-RNG prune downstream tolerates the
    approximation (Vamana-style builds start from approximate kNN)."""
    import jax
    import jax.numpy as jnp

    from ..ops.ivf_scan import ivf_search_fn
    from ..ops.kmeans import assign_clusters_blocked, kmeans_fit, kmeans_init

    n, d = vec.shape
    nlist = max(16, int(np.sqrt(n)))
    nprobe = 6
    rng = np.random.default_rng(seed)
    sample = vec if n <= 200_000 else vec[rng.choice(n, 200_000, replace=False)]
    cents, _ = kmeans_fit(jnp.asarray(sample),
                          jnp.asarray(kmeans_init(sample, nlist, seed)), iters=8)
    assign = assign_clusters_blocked(vec, cents)

    # padded inverted lists (no permission bits needed: all-ones). Spilled
    # rows go to their nearest centroid with free space — never dropped
    # (a dropped row would vanish from every kNN candidate list); if every
    # probed list is full, grow l_pad (same policy as index/ivf.py).
    counts = np.bincount(assign, minlength=nlist)
    l_pad = max(8, int(np.quantile(counts, 0.99)) // 8 * 8 + 8)
    lists: list[list[int]] = [[] for _ in range(nlist)]
    spill = []
    for i, c in enumerate(assign.tolist()):
        (lists[c] if len(lists[c]) < l_pad else spill).append(i)
    if spill:
        cent_np = np.asarray(cents, dtype=np.float32)
        sv = vec[spill]
        cd = (
            np.einsum("nd,nd->n", sv, sv)[:, None]
            - 2.0 * sv @ cent_np.T
            + np.einsum("cd,cd->c", cent_np, cent_np)[None, :]
        )
        order = np.argsort(cd, axis=1)
        for j, i in enumerate(spill):
            for c in order[j]:
                if len(lists[int(c)]) < l_pad:
                    lists[int(c)].append(i)
                    break
            else:  # every list full: grow padding, keep the row
                l_pad = int(l_pad * 1.25 + 8) // 8 * 8
                lists[int(order[j, 0])].append(i)
    assert sum(len(x) for x in lists) == n, "IVF graph lists lost rows"

    inv_vec = np.zeros((nlist, l_pad, d), dtype=np.float32)
    inv_norm = np.full((nlist, l_pad), 3e37, dtype=np.float32)
    inv_bits = np.zeros((nlist, l_pad, 1), dtype=np.uint32)
    inv_rows = np.full((nlist, l_pad), -1, dtype=np.int32)
    norms = np.einsum("nd,nd->n", vec, vec)
    for c, members in enumerate(lists):
        assert len(members) <= l_pad
        mm = np.asarray(members, dtype=np.int64)
        inv_vec[c, : len(mm)] = vec[mm]
        inv_norm[c, : len(mm)] = norms[mm]
        inv_bits[c, : len(mm), 0] = 1
        inv_rows[c, : len(mm)] = mm.astype(np.int32)

    dv = jax.device_put(inv_vec.astype(jnp.bfloat16))
    dn = jax.device_put(inv_norm)
    db = jax.device_put(inv_bits)
    dr = jax.device_put(inv_rows)
    masks = np.ones((4096, 1), dtype=np.uint32)
    dm = jax.device_put(masks)

    out = np.empty((n, k + 1), dtype=np.int32)
    pending = []
    for s in range(0, n, 4096):
        e = min(s + 4096, n)
        qb = np.zeros((4096, d), dtype=np.float32)
        qb[: e - s] = vec[s:e]
        _, ids = ivf_search_fn(jnp.asarray(qb), cents, dv, dn, db, dr, dm,
                               k + 1, nprobe)
        pending.append((s, e, ids))
    for s, e, ids in pending:
        out[s:e] = np.asarray(ids)[: e - s]
    return out


def _vamana_refine(
    vec: np.ndarray,
    nbr: np.ndarray,
    entry: int,
    m: int,
    alpha: float,
    knn: Optional[np.ndarray] = None,
    ef: int = 48,
    batch: int = 4096,
    passes: int = 1,
    seed: int = 0,
) -> np.ndarray:
    """Search-based Vamana refinement pass (DiskANN's second phase): for
    every node, run the batched greedy beam search ON THE CURRENT GRAPH from
    the medoid, and re-prune with the visited candidates. This is what makes
    the flat graph NAVIGABLE: a raw kNN graph fragments into cluster islands
    (measured: recall@10 = 0.0 from a medoid entry on clustered data at 30k
    rows — the round-1 tpu builder bug), while search-based candidates give
    every node edges along the search path toward the medoid, so greedy
    descent can retrace them. The beam search itself is the device op the
    index serves with (ops/graph_search.py), so construction exercises the
    exact traversal it optimizes for."""
    import jax.numpy as jnp

    from .. import native

    n, d = vec.shape
    norms = np.einsum("nd,nd->n", vec, vec).astype(np.float32)
    ones_bits = np.ones((n, 1), dtype=np.uint32)
    k_cand = min(ef, 32)

    for _ in range(passes):
        dv = jnp.asarray(vec)
        dn = jnp.asarray(norms)
        db = jnp.asarray(ones_bits)
        dg = jnp.asarray(np.ascontiguousarray(nbr))
        masks = jnp.ones((batch, 1), dtype=jnp.uint32)
        found = np.full((n, k_cand), -1, dtype=np.int32)
        pending = []
        for s in range(0, n, batch):
            e = min(s + batch, n)
            qb = np.zeros((batch, d), dtype=np.float32)
            qb[: e - s] = vec[s:e]
            _, ids = graph_search_fn(
                jnp.asarray(qb), dv, dn, db, dg, masks, int(entry),
                k_cand, ef,
            )
            pending.append((s, e, ids))
        for s, e, ids in pending:
            found[s:e] = np.asarray(ids)[: e - s]
        parts = [found, nbr]
        if knn is not None:
            parts.append(knn)
        cands = np.concatenate(parts, axis=1).astype(np.int32)
        nbr = native.rng_prune(vec, cands, m=m, alpha=alpha)
    return nbr


def _device_knn_graph(vec: np.ndarray, k: int, block: int = 4096) -> np.ndarray:
    """Exact kNN graph via blockwise device matmuls (the MXU-native part of
    the tpu builder)."""
    import jax
    import jax.numpy as jnp

    n, d = vec.shape
    v = jnp.asarray(vec)
    norms = jnp.sum(v * v, axis=1)

    import functools

    # v/norms are ARGUMENTS, not closure captures: a captured device array
    # is inlined into the HLO as a literal, and at 768-d that is a ~400 MB
    # compile payload (the remote-compile tunnel rejects it with HTTP 413).
    @functools.partial(jax.jit, static_argnames=("k",))
    def block_knn(qb, v, norms, k):
        dots = jnp.dot(qb, v.T, preferred_element_type=jnp.float32)
        s = norms[None, :] - 2.0 * dots
        _, idx = jax.lax.top_k(-s, k + 1)  # +1: self
        return idx

    out = np.empty((n, k + 1), dtype=np.int32)
    pending = []
    for s in range(0, n, block):
        e = min(s + block, n)
        qb = np.zeros((block, d), dtype=np.float32)
        qb[: e - s] = vec[s:e]
        pending.append((s, e, block_knn(jnp.asarray(qb), v, norms, k)))
    for s, e, idx in pending:
        out[s:e] = np.asarray(idx)[: e - s]
    return out


class HNSWIndex:
    def __init__(
        self,
        arena: DeviceArena,
        rows: Optional[np.ndarray] = None,
        m: int = 16,
        ef_construction: int = 64,
        ef_search: int = 40,
        query_batch: int = 256,
        builder: str = "auto",
        knn_k: int = 32,
        alpha: float = 1.2,
        m_beta: int = 64,    # dense layer-0 width for builder="acorn"
        seed: int = 0,
        graph_state: Optional[dict] = None,  # from .graph_state(): skip build
        logical: bool = False,  # no-copy mode: serve from the SHARED arena
                                # via row_map indirection — per-partition
                                # storage is the graph + row map only (the
                                # reference's pointer-HNSW over one shared
                                # vector table, logical_partition_benchmark/
                                # benchmark/src/pointer_hnsw_index.cpp:77);
                                # False = gathered per-partition copies (its
                                # "physical" arm)
        use_packed: Optional[bool] = None,  # packed-row gather for the
                                # iterative engine (round 5): ONE int8 row
                                # gather per candidate ([vq | roles8 |
                                # norm]) instead of three takes — see
                                # ops/graph_search packed_rows. None = auto:
                                # on when the arena has a LOSSLESS int8
                                # mirror and the index addresses arena rows
                                # (logical or whole-arena); scores are then
                                # bit-exact dequant distances. Lossy
                                # corpora keep the bf16-mirror path unless
                                # explicitly opted in. Built lazily; like
                                # TiledSearcher chunks, a built table keeps
                                # serving pre-tombstone bits until rebuilt
                                # (pgvector index-until-VACUUM semantics).
    ):
        import jax
        import jax.numpy as jnp

        self.m = m
        self.ef_search = ef_search
        self.query_batch = query_batch
        self.logical = logical
        rows_whole_arena = rows is None
        packed_eligible = (
            arena.quant is not None
            and arena.metric in ("l2", "ip", "cosine")
            and (logical or rows_whole_arena)
        )
        if use_packed is None:
            use_packed = packed_eligible and bool(arena.quant.lossless)
        self.use_packed = bool(use_packed) and packed_eligible
        self._packed_arena = arena if self.use_packed else None
        self._packed = None
        # serving metric follows the arena. Graph CONSTRUCTION is L2-based;
        # for "cosine" the arena rows are unit vectors so L2 order == cosine
        # order (exact); for "ip" the L2 graph is a navigable proxy (pair
        # with iterative/sampled_entry search for best recall); for "l1"
        # (pgvector <+>, hnsw vector_l1_ops) the L2 graph is likewise a
        # proxy — L1 and L2 neighborhoods coincide closely in low-to-mid
        # dimensions — while TRAVERSAL scores are true L1 distances
        self.metric = arena.metric

        if arena.host_vectors is not None:
            host_vec, host_norm, host_bits = (
                arena.host_vectors, arena.host_norms, arena.host_bits
            )
        else:
            host_vec = np.asarray(arena.vectors, dtype=np.float32)
            host_norm = np.asarray(arena.norms)
            host_bits = np.asarray(arena.role_bits)

        if rows is None:
            rows = np.arange(arena.n, dtype=np.int64)
        else:
            rows = np.asarray(rows, dtype=np.int64)
        self.n_rows = len(rows)
        vec = np.ascontiguousarray(host_vec[rows], dtype=np.float32)
        n, d = vec.shape
        if self.metric == "ip" and n:
            # MIPS-to-L2 build transform (Bachrach et al.; the standard way
            # to reuse an L2 graph builder for max-inner-product): append
            # sqrt(M^2 - ||x||^2) so L2 proximity in the lifted space tracks
            # inner-product order. Serving still traverses with -q.x scores
            # on the ORIGINAL vectors; only edge selection uses the lift.
            nrm2 = np.einsum("nd,nd->n", vec, vec)
            lift = np.sqrt(np.maximum(float(nrm2.max()) - nrm2, 0.0))
            vec_build = np.concatenate(
                [vec, lift[:, None].astype(np.float32)], axis=1)
        else:
            vec_build = vec

        if builder == "auto":
            builder = "tpu" if n > 50_000 else "classic"
        self.builder = builder

        t0 = time.perf_counter()
        from .. import native

        if graph_state is not None:
            # resume from a persisted graph (utils/persist.py npz state —
            # the reference's .faiss / custom binary graph files analog)
            nbr = np.asarray(graph_state["neighbors"], dtype=np.int32)
            entry = int(np.asarray(graph_state["entry"]).reshape(-1)[0])
            assert nbr.shape[0] == n, "graph state does not match row set"
        elif builder == "classic":
            if native.available():
                nbr, levels, entry, _ = native.hnsw_build(
                    vec_build, m=m, ef_construction=ef_construction, seed=seed
                )
            else:
                nbr, entry = _python_fallback_graph(vec_build, m, seed)
        elif builder == "acorn":
            # ACORN-gamma build-side densification (reference
            # acorn_benchmark/src/index_creation.cpp:105): dense layer-0
            # lists keep admissible edges under predicate filtering —
            # pair with filtered_traversal / iterative search
            if not native.available():
                raise RuntimeError("acorn builder needs the native library")
            nbr, levels, entry, _ = native.hnsw_build_acorn(
                vec_build, m=m, m_beta=m_beta,
                ef_construction=ef_construction, seed=seed
            )
        elif builder == "tpu":
            if not native.available():
                raise RuntimeError("tpu builder needs the native prune library")
            if n > 200_000:  # quadratic exact kNN too costly: IVF-assisted
                knn = _device_knn_graph_ivf(vec_build, k=knn_k, seed=seed)
            else:
                knn = _device_knn_graph(vec_build, k=knn_k)
            # Vamana-style construction: kNN candidates + random long-range
            # candidates (navigability seeds), alpha-RNG prune, then a
            # search-based refinement pass. The random edges and the
            # refinement are NOT optional: a pruned kNN graph alone is not
            # navigable from a single entry (cluster islands; see
            # _vamana_refine docstring).
            rng_ = np.random.default_rng(seed)
            rand_edges = rng_.integers(0, n, size=(n, 16), dtype=np.int64)
            cand0 = np.concatenate(
                [knn[:, 1:], rand_edges.astype(np.int32)], axis=1)
            nbr = native.rng_prune(vec_build, cand0, m=m, alpha=alpha)
            # entry: medoid-ish — node closest to the mean
            mean = vec_build.mean(axis=0, keepdims=True)
            entry = int(np.argmin(((vec_build - mean) ** 2).sum(axis=1)))
            nbr = _vamana_refine(vec_build, nbr, entry, m=m, alpha=alpha,
                                 knn=knn[:, 1:], seed=seed)
        else:
            raise ValueError(f"unknown builder {builder}")
        self.build_time_s = time.perf_counter() - t0
        self.entry = int(entry)
        m0 = nbr.shape[1]

        # pad to a pow2 bucket so few shapes compile: partitions of one
        # strategy land on ~log2 distinct (npad, M0) shapes instead of one
        # per partition — each XLA compile through the axon tunnel costs
        # minutes, so shape discipline dominates serving latency for
        # many-partition strategies
        npad = max(1024, 1 << (max(n, 1) - 1).bit_length())
        pad = npad - n
        ggraph = np.concatenate([nbr, np.full((pad, m0), -1, np.int32)])
        rmap = np.concatenate([rows, np.full(pad, -1)]).astype(np.int32)

        if logical:
            # no-copy: the vector table IS the shared arena; per-partition
            # device storage is the local graph + the row map only
            self._vectors = arena.vectors
            self._norms = arena.norms
            self._bits = arena.role_bits
            self._hvec = self._hnorm = self._hbits = None
        else:
            gvec = np.concatenate([vec, np.zeros((pad, d), np.float32)])
            gnorm = np.concatenate([host_norm[rows], np.zeros(pad, np.float32)])
            gbits = np.concatenate(
                [host_bits[rows], np.zeros((pad, host_bits.shape[1]), np.uint32)]
            )
            compute_dtype = arena.vectors.dtype
            self._vectors = jax.device_put(gvec.astype(compute_dtype))
            self._norms = jax.device_put(gnorm)
            self._bits = jax.device_put(gbits)
            # persistent host mirrors: maintenance (insert/delete) mutates
            # these and delta-scatters to device — never a device->host
            # round trip of the full arrays (through the tunnel that fetch
            # + re-upload dominated insert cost, ~2.7s per 4096-row batch)
            self._hvec, self._hnorm, self._hbits = gvec, gnorm, gbits
        self._graph = jax.device_put(ggraph)
        self._row_map = jax.device_put(rmap)
        self._hgraph, self._hrmap = ggraph, rmap
        avg_deg = float((nbr >= 0).sum(axis=1).mean())
        logger.info(
            "HNSW built (%s): %d rows, M0=%d (avg deg %.1f), %.2fs",
            builder, n, m0, avg_deg, self.build_time_s,
        )

    def insert_rows(self, arena: DeviceArena, rows: np.ndarray,
                    ef_construction: Optional[int] = None) -> None:
        """Online insert of arena rows into the live graph — the pgvector
        HNSW insert path analog (reference pgvector/src/hnswinsert.c:
        greedy-search for neighbors, RNG-prune, add bidirectional edges,
        prune overflowing neighbor lists). Batched: candidates for each
        4096-row sub-batch come from one device beam-search pass over the
        current graph (sub-batching keeps clustered bulk loads connected:
        later rows\' searches SEE earlier inserts, pgvector\'s sequential
        semantics); edge updates mutate persistent HOST MIRRORS and
        delta-scatter to the device graph — only the changed rows travel,
        never a full fetch/re-upload round trip (which dominated insert
        cost through the tunnel). Crossing a pow2 padding bucket re-uploads
        once."""
        rows = np.asarray(rows, dtype=np.int64)
        if len(rows) == 0:
            return
        efc = ef_construction or max(self.m * 2, 48)
        if arena.host_vectors is not None:
            hv, hn, hb = arena.host_vectors, arena.host_norms, arena.host_bits
        else:
            hv = np.asarray(arena.vectors, dtype=np.float32)
            hn = np.asarray(arena.norms)
            hb = np.asarray(arena.role_bits)
        # pre-grow the pow2 bucket ONCE to the final size: mid-insert
        # growth would recompile the beam search + scatter at a new shape
        # (minutes through the tunnel) and force an extra full upload
        self._grow_to(self.n_rows + len(rows))
        for s in range(0, len(rows), 4096):
            self._insert_sub_batch(rows[s:s + 4096], efc, hv, hn, hb)
        # sampled-entry cache covers only pre-insert rows — rebuild lazily
        if hasattr(self, "_entry_sample"):
            del self._entry_sample
        logger.info("inserted %d rows (now %d, npad %d)",
                    len(rows), self.n_rows, self._hgraph.shape[0])

    def _grow_to(self, n_total: int) -> None:
        """Grow host mirrors + device arrays to the pow2 bucket holding
        n_total rows (no-op when they already fit)."""
        import jax

        npad_new = max(1024, 1 << (max(n_total, 1) - 1).bit_length())
        if npad_new <= self._hgraph.shape[0]:
            return

        def _grow(a, fill):
            out = np.full((npad_new,) + a.shape[1:], fill, dtype=a.dtype)
            out[: a.shape[0]] = a
            return out

        self._hgraph = _grow(self._hgraph, -1)
        self._hrmap = _grow(self._hrmap, -1)
        if hasattr(self, "_deleted_local"):
            self._deleted_local = _grow(self._deleted_local, False)
        self._graph = jax.device_put(self._hgraph)
        self._row_map = jax.device_put(self._hrmap)
        if not self.logical:
            self._hvec = _grow(self._hvec, 0)
            self._hnorm = _grow(self._hnorm, 0)
            self._hbits = _grow(self._hbits, 0)
            self._vectors = jax.device_put(
                self._hvec.astype(self._vectors.dtype))
            self._norms = jax.device_put(self._hnorm)
            self._bits = jax.device_put(self._hbits)

    def _insert_sub_batch(self, rows: np.ndarray, efc: int,
                          hv: np.ndarray, hn: np.ndarray,
                          hb: np.ndarray) -> None:
        import jax
        import jax.numpy as jnp

        graph = self._hgraph
        rmap_all = self._hrmap
        m0 = graph.shape[1]
        n_old, n_new = self.n_rows, len(rows)
        new_vec = np.ascontiguousarray(hv[rows], dtype=np.float32)

        # 1) candidates: batched unfiltered beam search on the current
        # device graph (which the previous sub-batch\'s scatter updated)
        # candidate width 32: widening to 48 measured NO recall gain
        # (0.743 vs 0.750 inserted-region recall@10 at 200k+100k) at 1.15x
        # cost — insert quality is candidate-VISIBILITY bound (same-batch
        # rows invisible to the pre-insert graph), which refine_rows fixes
        cand = np.full((n_new, min(efc, 32)), -1, dtype=np.int32)
        bs = 1024
        masks = jnp.ones((bs, 1), dtype=jnp.uint32)
        ones_bits = jnp.ones((self._vectors.shape[0], 1), dtype=jnp.uint32)
        pending = []
        for s in range(0, n_new, bs):
            e = min(s + bs, n_new)
            qb = np.zeros((bs, new_vec.shape[1]), dtype=np.float32)
            qb[: e - s] = new_vec[s:e]
            _, ids = graph_search_fn(
                jnp.asarray(qb), self._vectors, self._norms, ones_bits,
                self._graph, masks, self.entry, cand.shape[1], efc,
                row_map=self._row_map if self.logical else None,
            )
            pending.append((s, e, ids))
        for s, e, ids in pending:
            cand[s:e] = np.asarray(ids)[: e - s]
        if hasattr(self, "_deleted_local"):
            cand[(cand >= 0) & self._deleted_local[np.maximum(cand, 0)]] = -1

        # 2) the bucket was pre-grown by insert_rows; only delta scatters
        # remain
        n_total = n_old + n_new
        assert n_total <= graph.shape[0], "insert_rows did not pre-grow"
        rmap_all[n_old:n_total] = rows.astype(np.int32)
        if self.logical:
            def getv(ids):
                return hv[rmap_all[np.asarray(ids, dtype=np.int64)]].astype(
                    np.float32, copy=False)
        else:
            self._hvec[n_old:n_total] = new_vec
            self._hnorm[n_old:n_total] = hn[rows]
            self._hbits[n_old:n_total] = hb[rows]
            vec_all = self._hvec

            def getv(ids):
                return vec_all[np.asarray(ids, dtype=np.int64)]

        # 3) alpha-prune each new node\'s candidate list (hnswinsert.c
        # HnswFindElementNeighbors + RNG heuristic), then reverse edges
        # with overflow re-prune. The edge loop is native C++ when the
        # library is present (vsr_insert_update — measured the host hot
        # spot at 1e5-row batches); the numpy loop below is the fallback
        # with identical semantics.
        from .. import native

        alpha = 1.2
        if native.available():
            if self.logical:
                vec_table, vmap = hv, rmap_all
            else:
                vec_table = self._hvec
                vmap = np.arange(graph.shape[0], dtype=np.int32)
            changed_old = native.insert_update(
                vec_table, vmap, graph, cand, n_old, self.m, alpha)
            self._finish_sub_batch(graph, rmap_all, n_old, n_total,
                                   np.unique(changed_old))
            return
        changed: set = set()
        # shared-candidate map: old node -> already-inserted batch members
        # that listed it — lets same-sub-batch rows become each other\'s
        # neighbors (they are invisible to the pre-insert graph search)
        seen_by_cand: dict = {}
        for j in range(n_new):
            nid = n_old + j
            cids = [c for c in cand[j].tolist() if c >= 0]
            peers = {p for c in cids for p in seen_by_cand.get(c, ())}
            for c in cids:
                seen_by_cand.setdefault(c, []).append(nid)
            cids.extend(peers)
            if not cids:
                graph[nid, :] = -1
                continue
            cvecs = getv(cids).astype(np.float64)
            dists = ((cvecs - new_vec[j].astype(np.float64)) ** 2).sum(axis=1)
            order = np.argsort(dists, kind="stable")
            # one candidate-pairwise distance matrix per node: the RNG
            # domination checks below become row lookups instead of a
            # fresh O(d) einsum per (candidate, kept) pair — the host-side
            # hot spot at 1e5-row insert batches
            sq = (cvecs * cvecs).sum(axis=1)
            pair = sq[:, None] + sq[None, :] - 2.0 * (cvecs @ cvecs.T)
            kept_idx: list = []
            for oi in order:
                if len(kept_idx) >= self.m:
                    break
                if not np.any(pair[oi, kept_idx] * alpha < dists[oi]):
                    kept_idx.append(oi)
            kept = [cids[oi] for oi in kept_idx]
            graph[nid, : len(kept)] = kept
            graph[nid, len(kept):] = -1
            # reverse edges: append nid; if full, drop the farthest edge
            gv_new = new_vec[j]
            for c in kept:
                slots = np.nonzero(graph[c] < 0)[0]
                if len(slots):
                    graph[c, slots[0]] = nid
                    changed.add(int(c))
                else:
                    nbrs = graph[c]
                    gv_c = getv([c])[0]
                    dn = ((getv(nbrs) - gv_c) ** 2).sum(axis=1)
                    worst = int(np.argmax(dn))
                    if ((gv_new - gv_c) ** 2).sum() < dn[worst]:
                        graph[c, worst] = nid
                        changed.add(int(c))

        self._finish_sub_batch(
            graph, rmap_all, n_old, n_total,
            np.fromiter((c for c in sorted(changed) if c < n_old),
                        dtype=np.int32))

    def _finish_sub_batch(self, graph, rmap_all, n_old, n_total,
                          changed_old: np.ndarray) -> None:
        """Device update: scatter only the changed graph rows + the new
        region (logical mode: graph + row map are the only per-partition
        device arrays — the shared table already holds the new rows)."""
        compute_dtype = self._vectors.dtype
        new_ids = np.arange(n_old, n_total, dtype=np.int32)
        gidx = np.concatenate([new_ids, changed_old.astype(np.int32)])
        self._graph = _scatter_rows(self._graph, gidx, graph[gidx])
        self._row_map = _scatter_rows(self._row_map, new_ids,
                                      rmap_all[new_ids])
        if not self.logical:
            self._vectors = _scatter_rows(
                self._vectors, new_ids,
                self._hvec[new_ids].astype(compute_dtype))
            self._norms = _scatter_rows(self._norms, new_ids,
                                        self._hnorm[new_ids])
            self._bits = _scatter_rows(self._bits, new_ids,
                                       self._hbits[new_ids])
        self.n_rows = n_total

    def refine_rows(self, arena: DeviceArena, rows: np.ndarray,
                    ef: Optional[int] = None) -> None:
        """Re-prune the given (arena-id) rows\' neighborhoods against the
        CURRENT graph — the insert-path analog of the builder\'s Vamana
        refinement pass (_vamana_refine). Bulk inserts need it because a
        sub-batch\'s candidate searches cannot see rows inserted later: a
        clustered 1e5-row load links mostly forward-in-batch. One batched
        device search over the final graph + a host re-prune + delta
        scatter closes most of the gap to built-graph recall (measured in
        results/online_insert_scale.json). pgvector has no equivalent —
        its sequential hnswinsert.c never has invisible siblings."""
        import jax.numpy as jnp

        rows = np.asarray(rows, dtype=np.int64)
        if len(rows) == 0:
            return
        if arena.host_vectors is not None:
            hv = arena.host_vectors
        else:
            hv = np.asarray(arena.vectors, dtype=np.float32)
        graph = self._hgraph
        rmap_all = self._hrmap
        local_of = {int(r): i for i, r in enumerate(rmap_all[: self.n_rows])}
        nodes = np.asarray([local_of[int(r)] for r in rows
                            if int(r) in local_of], dtype=np.int64)
        if hasattr(self, "_deleted_local"):
            # never re-link deleted nodes (resurrection would undo
            # delete_rows' unreachability guarantee)
            nodes = nodes[~self._deleted_local[nodes]]
        if len(nodes) == 0:
            return
        if self.logical:
            def getv(ids):
                return hv[rmap_all[np.asarray(ids, dtype=np.int64)]].astype(
                    np.float32, copy=False)
        else:
            vec_all = self._hvec

            def getv(ids):
                return vec_all[np.asarray(ids, dtype=np.int64)]
        node_vec = getv(nodes)

        # candidates from the FINAL graph (every inserted row now visible)
        efr = ef or max(self.m * 2, 48)
        width = min(efr, 32)
        cand = np.full((len(nodes), width), -1, dtype=np.int32)
        bs = 1024
        masks = jnp.ones((bs, 1), dtype=jnp.uint32)
        ones_bits = jnp.ones((self._vectors.shape[0], 1), dtype=jnp.uint32)
        pending = []
        for s in range(0, len(nodes), bs):
            e = min(s + bs, len(nodes))
            qb = np.zeros((bs, node_vec.shape[1]), dtype=np.float32)
            qb[: e - s] = node_vec[s:e]
            _, ids = graph_search_fn(
                jnp.asarray(qb), self._vectors, self._norms, ones_bits,
                self._graph, masks, self.entry, width, efr,
                row_map=self._row_map if self.logical else None,
            )
            pending.append((s, e, ids))
        for s, e, ids in pending:
            cand[s:e] = np.asarray(ids)[: e - s]
        if hasattr(self, "_deleted_local"):
            cand[(cand >= 0) & self._deleted_local[np.maximum(cand, 0)]] = -1

        alpha = 1.2
        from .. import native

        if native.available():
            if self.logical:
                vec_table, vmap = hv, rmap_all
            else:
                vec_table = self._hvec
                vmap = np.arange(graph.shape[0], dtype=np.int32)
            touched = native.insert_update(
                vec_table, vmap, graph, cand, self.n_rows, self.m, alpha,
                nodes=nodes)
            cidx = np.unique(touched).astype(np.int32)
            if len(cidx):
                self._graph = _scatter_rows(self._graph, cidx, graph[cidx])
            if hasattr(self, "_entry_sample"):
                del self._entry_sample
            logger.info("refined %d rows (%d graph rows updated, native)",
                        len(nodes), len(cidx))
            return
        changed: set = set()
        for j, nid in enumerate(nodes.tolist()):
            cids = sorted({int(c) for c in cand[j] if c >= 0 and c != nid}
                          | {int(c) for c in graph[nid] if c >= 0})
            if not cids:
                continue
            cvecs = getv(cids).astype(np.float64)
            base = node_vec[j].astype(np.float64)
            dists = ((cvecs - base) ** 2).sum(axis=1)
            order = np.argsort(dists, kind="stable")
            sq = (cvecs * cvecs).sum(axis=1)
            pair = sq[:, None] + sq[None, :] - 2.0 * (cvecs @ cvecs.T)
            kept_idx: list = []
            for oi in order:
                if len(kept_idx) >= self.m:
                    break
                if not np.any(pair[oi, kept_idx] * alpha < dists[oi]):
                    kept_idx.append(oi)
            kept = [cids[oi] for oi in kept_idx]
            graph[nid, : len(kept)] = kept
            graph[nid, len(kept):] = -1
            changed.add(int(nid))
            gv_j = node_vec[j]
            for c in kept:
                if nid in graph[c]:
                    continue
                slots = np.nonzero(graph[c] < 0)[0]
                if len(slots):
                    graph[c, slots[0]] = nid
                    changed.add(int(c))
                else:
                    nbrs = graph[c]
                    gv_c = getv([c])[0]
                    dn = ((getv(nbrs) - gv_c) ** 2).sum(axis=1)
                    worst = int(np.argmax(dn))
                    if ((gv_j - gv_c) ** 2).sum() < dn[worst]:
                        graph[c, worst] = nid
                        changed.add(int(c))

        cidx = np.fromiter(sorted(changed), dtype=np.int32,
                           count=len(changed))
        if len(cidx):
            self._graph = _scatter_rows(self._graph, cidx, graph[cidx])
        if hasattr(self, "_entry_sample"):
            del self._entry_sample
        logger.info("refined %d rows (%d graph rows updated)",
                    len(nodes), len(cidx))

    def delete_rows(self, arena: DeviceArena, rows: np.ndarray) -> int:
        """Row-level delete with graph repair — the pgvector HNSW vacuum
        analog (reference pgvector/src/hnswvacuum.c: HnswRepairGraph
        rewires every element that pointed at a deleted element before the
        deleted pages are recycled). Host-side repair, one device
        re-upload:

        - deleted nodes leave every neighbor list; each affected live node
          repairs with candidates = its live neighbors + the deleted
          neighbor's live neighbors (routing through the hole), alpha-RNG
          pruned to M0 — connectivity across the hole is preserved;
        - deleted nodes' own lists empty, so they are unreachable;
        - physical mode zeroes their role bits (never returnable even
          before the caller tombstones the arena); logical mode relies on
          core.tombstone_rows zeroing the SHARED arena bits;
        - entry / sampled-entry state moves off deleted nodes.

        Storage is unchanged until a rebuild over core.compact_corpus (the
        actual VACUUM reclaim). Returns the number of rows deleted."""
        import jax

        rows = np.asarray(rows, dtype=np.int64)
        rmap = self._hrmap
        local_of = {int(r): i for i, r in enumerate(rmap[: self.n_rows])}
        dels = np.asarray(sorted(local_of[int(r)] for r in rows
                                 if int(r) in local_of), dtype=np.int64)
        if len(dels) == 0:
            return 0
        graph = self._hgraph  # host mirror, mutated in place
        npad = graph.shape[0]
        is_del = np.zeros(npad, dtype=bool)
        is_del[dels] = True
        if not hasattr(self, "_deleted_local"):
            self._deleted_local = np.zeros(npad, dtype=bool)
        self._deleted_local[dels] = True

        if arena.host_vectors is not None:
            hv = arena.host_vectors
        else:
            hv = np.asarray(arena.vectors, dtype=np.float32)

        def vec_of(local_ids):
            return hv[rmap[np.asarray(local_ids, dtype=np.int64)]].astype(
                np.float32)

        # live nodes holding an edge to a deleted node
        hit = np.isin(graph, dels) & (graph >= 0)
        affected = np.nonzero(hit.any(axis=1) & ~is_del)[0]
        alpha = 1.2
        for node in affected.tolist():
            nbrs = graph[node]
            live = [int(c) for c in nbrs if c >= 0 and not is_del[c]]
            cand = set(live)
            for c in nbrs:
                if c >= 0 and is_del[c]:
                    cand.update(int(x) for x in graph[c]
                                if x >= 0 and not is_del[x] and x != node)
            cand.discard(node)
            cids = sorted(cand)
            if not cids:
                graph[node, :] = -1
                continue
            base = vec_of([node])[0]
            dists = ((vec_of(cids) - base) ** 2).sum(axis=1)
            order = np.argsort(dists, kind="stable")
            kept: list = []
            kept_vecs: list = []
            for oi in order:
                if len(kept) >= graph.shape[1]:
                    break
                dc = dists[oi]
                cv = vec_of([cids[oi]])[0]
                if any(((cv - kv) ** 2).sum() * alpha < dc for kv in kept_vecs):
                    continue
                kept.append(cids[oi])
                kept_vecs.append(cv)
            graph[node, : len(kept)] = kept
            graph[node, len(kept):] = -1
        graph[dels, :] = -1

        # entry repair: nearest live node to the old entry
        if is_del[self.entry]:
            live_nodes = np.nonzero(~self._deleted_local[: self.n_rows])[0]
            if len(live_nodes):
                ev = vec_of([self.entry])[0]
                sub = live_nodes[np.random.default_rng(0).permutation(
                    len(live_nodes))[: 4096]]
                self.entry = int(sub[np.argmin(
                    ((vec_of(sub) - ev) ** 2).sum(axis=1))])
            else:
                self.entry = 0

        rmap[dels] = -1  # deleted arena rows are no longer addressable
        self._row_map = _scatter_rows(self._row_map, dels.astype(np.int32),
                                      rmap[dels])
        changed = np.unique(np.concatenate([affected, dels])).astype(np.int32)
        if not self.logical:
            self._hbits[dels] = 0
            self._bits = _scatter_rows(self._bits, dels.astype(np.int32),
                                       self._hbits[dels])
        self._graph = _scatter_rows(self._graph, changed, graph[changed])
        if hasattr(self, "_entry_sample"):
            del self._entry_sample
        logger.info("deleted %d rows (graph repaired at %d nodes)",
                    len(dels), len(affected))
        return len(dels)

    def _sampled_entries(self, q: np.ndarray, sample: int = 1024,
                         seed: int = 0) -> np.ndarray:
        """Per-query entry = nearest node among a fixed random sample, from
        ONE batched matmul. Entry quality matches a 2-3 level HNSW descent
        (the sample plays the role of the upper layers' ~N/1000 nodes)
        without any sequential hops."""
        import functools

        import jax
        import jax.numpy as jnp

        if not hasattr(self, "_entry_sample"):
            rng = np.random.default_rng(seed)
            n = self.n_rows
            pool = np.arange(n, dtype=np.int32)
            if hasattr(self, "_deleted_local"):
                pool = pool[~self._deleted_local[:n]]
            ids = np.sort(pool if len(pool) <= sample
                          else rng.choice(pool, sample, replace=False).astype(np.int32))
            # vector-table rows for the sample (== ids unless logical)
            trows = (np.asarray(self._row_map)[ids] if self.logical else ids)
            self._entry_sample = (jax.device_put(jnp.asarray(ids)),
                                  jax.device_put(jnp.asarray(trows)))

        @functools.partial(jax.jit, static_argnames=("metric",))
        def _nearest(qb, vec, norms, ids, trows, metric):
            if metric == "cosine":
                qb = qb / jnp.maximum(
                    jnp.linalg.norm(qb, axis=1, keepdims=True), 1e-30)
            x = jnp.take(vec, trows, axis=0).astype(jnp.float32)   # (S, d)
            nrm = jnp.take(norms, trows, axis=0)
            if metric == "l1":
                s = jnp.sum(jnp.abs(x[None, :, :] - qb[:, None, :]), axis=-1)
            else:
                dots = jnp.dot(qb, x.T, preferred_element_type=jnp.float32)
                s = (nrm[None, :] - 2.0 * dots) if metric == "l2" else -dots
            return jnp.take(ids, jnp.argmin(s, axis=1))   # LOCAL ids

        out = _nearest(jnp.asarray(q), self._vectors, self._norms,
                       *self._entry_sample, metric=self.metric)
        return np.asarray(out)

    def graph_state(self) -> dict:
        """Persistable graph (pair with utils.persist.save_npz)."""
        return {
            "neighbors": np.asarray(self._graph)[: self.n_rows],
            "entry": np.asarray([self.entry], dtype=np.int32),
        }

    # ------------------------------------------------------------- search

    def search(
        self, queries: np.ndarray, query_masks: np.ndarray, k: int,
        ef_search: Optional[int] = None,
        filtered_traversal: bool = False,  # ACORN-style 2-hop filtered beam:
                                           # use at low within-index selectivity
        iterative: bool = False,   # pgvector-style iterative rescan: expand
                                   # until k admissible results (per query)
        entries: Optional[np.ndarray] = None,  # (Q,) per-query entry nodes
                                               # (LOCAL ids) — e.g. per-comb
                                               # admissible medoids
        entry_local: Optional[int] = None,     # one entry node (LOCAL id) for
                                               # every query in the call — the
                                               # probe_params-groupable form
                                               # of `entries`
        max_steps: Optional[int] = None,       # iterative expansion budget
        harvest_2hop: bool = False,
        sampled_entry: bool = False,  # per-query entry from one matmul over
                                      # a fixed random row sample — the
                                      # TPU-native replacement for HNSW's
                                      # upper-layer descent (hierarchy A/B,
                                      # PERF.md): descent saves sequential
                                      # hops; a batched sample scan buys the
                                      # same entry quality in ONE MXU pass.
                                      # Implies the iterative engine.
    ) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        ef = max(ef_search or self.ef_search, k + 1)
        q = np.asarray(queries, dtype=np.float32)
        mm = np.asarray(query_masks, dtype=np.uint32)
        nq = q.shape[0]
        if sampled_entry:
            iterative = True
            if entries is None:
                entries = self._sampled_entries(q)
        # small dedupe margin: the device result list may rarely contain
        # duplicates (see ops/graph_search.py) — fetch extra, dedupe on host
        kk = min(k + 8, ef)
        out_d = np.empty((nq, k), dtype=np.float32)
        out_i = np.empty((nq, k), dtype=np.int64)
        packed_kw = {}
        if iterative and self.use_packed:
            from ..core import (
                bits_to_onehot8, build_packed_graph_rows,
                packed_query_operands,
            )

            ar = self._packed_arena
            if self._packed is None:
                self._packed = build_packed_graph_rows(ar)
            dqs, qcd = packed_query_operands(ar, q)
            r_pad = ar.quant.r_pad
        # adaptive pow2 batch: probe groups are often much smaller than the
        # configured batch (a (comb, partition) group holds ~nq/combs
        # queries); padding them all to query_batch would waste most of
        # every dispatch. Pow2 buckets keep the compile count logarithmic.
        bs = min(self.query_batch,
                 max(64, 1 << (max(nq, 1) - 1).bit_length()))
        pending = []
        for s in range(0, nq, bs):
            e = min(s + bs, nq)
            qb = np.zeros((bs, q.shape[1]), dtype=np.float32)
            mb = np.zeros((bs, mm.shape[1]), dtype=np.uint32)
            qb[: e - s] = q[s:e]
            mb[: e - s] = mm[s:e]
            if iterative:
                default_entry = (self.entry if entry_local is None
                                 else int(entry_local))
                ent = np.full(bs, default_entry, dtype=np.int32)
                if entries is not None:
                    ent[: e - s] = np.asarray(entries[s:e], dtype=np.int32)
                ms = max_steps or 4 * ef
                if self.use_packed:
                    qcd_b = np.zeros(bs, np.float32)
                    qcd_b[: e - s] = qcd[s:e]
                    packed_kw = dict(
                        packed_rows=self._packed,
                        mask8=jnp.asarray(bits_to_onehot8(mb, r_pad, r_pad)),
                        dq_scale=float(dqs),
                        q_center_dot=jnp.asarray(qcd_b),
                    )
                d, i = graph_search_iterative_fn(
                    jnp.asarray(qb), self._vectors, self._norms, self._bits,
                    self._graph, jnp.asarray(mb), jnp.asarray(ent), kk, ef,
                    ms, harvest_2hop,
                    row_map=self._row_map if self.logical else None,
                    metric=self.metric, **packed_kw,
                )
            else:
                fn = (graph_search_filtered_fn if filtered_traversal
                      else graph_search_fn)
                d, i = fn(
                    jnp.asarray(qb), self._vectors, self._norms, self._bits,
                    self._graph, jnp.asarray(mb), self.entry, kk, ef,
                    row_map=self._row_map if self.logical else None,
                    metric=self.metric,
                )
            pending.append((s, e, d, i))
        from ..ops.topk import merge_topk_host

        for s, e, d, i in pending:
            d = np.asarray(d)[: e - s].astype(np.float64)
            i = np.asarray(i)[: e - s].astype(np.int64)
            # local -> arena ids, with host dedupe to k
            rmap = np.asarray(self._row_map)
            i = np.where(i >= 0, rmap[np.maximum(i, 0)], -1)
            md, mi = merge_topk_host([d], [i], k)
            out_d[s:e] = md
            out_i[s:e] = mi
        return out_d, out_i

    # ------------------------------------------------------------ storage

    def storage_bytes(self) -> Dict[str, int]:
        npad_g, m0 = self._graph.shape
        if self.logical:
            # shared-table mode: only the graph and the row map are
            # per-partition bytes (mirrors the reference's logical-partition
            # storage accounting, role_partition_results.json "storage")
            return {"vectors": 0, "index": int(npad_g * (m0 * 4 + 4))}
        npad, d = self._vectors.shape
        w = self._bits.shape[1]
        return {
            "vectors": int(npad * d * self._vectors.dtype.itemsize),
            "index": int(npad * (m0 * 4 + 4 + 4 * w + 4)),  # graph+norm+bits+rmap
        }


def _python_fallback_graph(vec: np.ndarray, m: int, seed: int) -> Tuple[np.ndarray, int]:
    """Tiny pure-python builder for environments without a compiler: exact
    kNN graph + naive prune. Test-sized inputs only."""
    n = len(vec)
    d2 = ((vec[:, None, :] - vec[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    knn = np.argsort(d2, axis=1)[:, : 2 * m].astype(np.int32)
    mean = vec.mean(axis=0, keepdims=True)
    entry = int(np.argmin(((vec - mean) ** 2).sum(axis=1)))
    return knn, entry
