"""Batched HNSW/graph beam search on device.

Replaces pgvector's per-query HNSW scan (reference pgvector/src/hnswscan.c,
GUC hnsw.ef_search) and the C++ pointer-graph search (reference
logical_partition_benchmark/.../pointer_hnsw_index.cpp) with a
batch-synchronous traversal: Q queries advance together; each step expands
one frontier node per query, gathers its padded neighbor row, computes
distances with a batched VPU dot, and merges into (a) an unfiltered
traversal beam and (b) a permission-filtered result list.

Key filtered-search property (matches ACORN's design, reference
acorn_benchmark/src/acorn_search.cpp): traversal IGNORES permissions —
inaccessible nodes still route — while results admit only rows whose role
bitset intersects the query mask. This keeps graph connectivity intact
under low selectivity.

Visited-set: membership is tested against the current beam plus the
expansion history (both bounded, static shapes) instead of a per-node
bitmap — revisits are rare and only cost duplicate work; final result
duplicates are removed by requesting a small k margin and deduping on the
host merge path.

Logical (no-copy) mode: every search accepts an optional `row_map`
((n_local,) int32 local node -> arena row). When given, vector / norm /
role-bit lookups gather `vectors[row_map[node]]` from the SHARED arena
instead of a per-partition copy — the TPU analog of the reference's
pointer-HNSW over one shared vector table (reference
logical_partition_benchmark/benchmark/src/shared_vector_table.h:18-90,
pointer_hnsw_index.cpp:77 add_from_storage_ids). Graph arrays stay local;
only they and the row map are per-partition storage.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

INF = jnp.inf
NEG = jnp.int32(-1)


def graph_beam_search(
    queries: jax.Array,      # (Q, d) float32
    vectors: jax.Array,      # (n_pad, d) compute dtype
    norms: jax.Array,        # (n_pad,) float32
    role_bits: jax.Array,    # (n_pad, W) uint32
    graph: jax.Array,        # (n_pad, M0) int32 local neighbor ids, -1 pad
    query_masks: jax.Array,  # (Q, W) uint32
    entry: int,              # entry node id
    k: int,
    ef: int,                 # beam width; expansions = ef - 1 (the entry
                             # node seeds the beam and the loop runs
                             # fori_loop(1, ef)). The fitted cost models'
                             # ef_offset absorbs this shift — do not
                             # "fix" to ef without refitting (k, beta,
                             # ef0) and re-measuring the committed
                             # recall artifacts
    row_map: jax.Array = None,  # (n_local,) local -> arena row (no-copy mode)
    metric: str = "l2",      # "l2" | "ip" | "cosine" (pgvector operator
                             # family; cosine expects unit corpus rows and
                             # normalizes queries here)
) -> Tuple[jax.Array, jax.Array]:
    """Return (dists (Q, k) ascending in the metric's distance, local ids
    (Q, k))."""
    q = queries.astype(jnp.float32)
    if metric == "cosine":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    nq, d = q.shape
    m0 = graph.shape[1]
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    compute_dtype = vectors.dtype
    qc = q.astype(compute_dtype)

    def _rows(ids):  # local node ids -> vector-table rows
        safe = jnp.maximum(ids, 0)
        return safe if row_map is None else jnp.take(row_map, safe)

    def dist_to(ids):  # ids (Q, C) -> metric scores (Q, C)
        safe = _rows(ids)
        x = jnp.take(vectors, safe, axis=0)              # (Q, C, d)
        nrm = jnp.take(norms, safe, axis=0)              # (Q, C)
        if metric == "l1":   # pgvector <+>: no matmul form, VPU reduce
            s = jnp.sum(jnp.abs(x.astype(jnp.float32) - q[:, None, :]),
                        axis=-1)
        else:
            dots = jnp.einsum("qd,qcd->qc", qc, x,
                              preferred_element_type=jnp.float32)
            s = (nrm - 2.0 * dots) if metric == "l2" else -dots
        return jnp.where(ids >= 0, s, INF)

    def allowed(ids):
        bits = jnp.take(role_bits, _rows(ids), axis=0)   # (Q, C, W)
        ok = jnp.any(jnp.bitwise_and(query_masks[:, None, :], bits) != 0, axis=-1)
        return jnp.logical_and(ok, ids >= 0)

    # init: beam = entry point
    entry_ids = jnp.full((nq, 1), entry, dtype=jnp.int32)
    entry_d = dist_to(entry_ids)
    pad_ids = jnp.full((nq, ef - 1), -1, dtype=jnp.int32)
    pad_d = jnp.full((nq, ef - 1), INF)
    beam_ids = jnp.concatenate([entry_ids, pad_ids], axis=1)     # (Q, ef)
    beam_d = jnp.concatenate([entry_d, pad_d], axis=1)
    beam_expanded = jnp.concatenate(
        [jnp.zeros((nq, 1), bool), jnp.ones((nq, ef - 1), bool)], axis=1
    )

    res_ids = jnp.full((nq, k), -1, dnp := jnp.int32)
    res_d = jnp.full((nq, k), INF)
    e_ok = allowed(entry_ids)
    res_ids = res_ids.at[:, 0].set(jnp.where(e_ok[:, 0], entry_ids[:, 0], -1))
    res_d = res_d.at[:, 0].set(jnp.where(e_ok[:, 0], entry_d[:, 0], INF))

    history = jnp.full((nq, ef), -1, dtype=jnp.int32)   # expanded nodes

    rows = jnp.arange(nq)

    def body(t, state):
        beam_ids, beam_d, beam_expanded, res_ids, res_d, history = state
        # pick the closest unexpanded beam node per query
        masked = jnp.where(beam_expanded, INF, beam_d)
        sel = jnp.argmin(masked, axis=1)                           # (Q,)
        sel_d = masked[rows, sel]
        active = jnp.isfinite(sel_d)                               # any frontier left
        node = jnp.where(active, beam_ids[rows, sel], -1)          # (Q,)
        beam_expanded = beam_expanded.at[rows, sel].set(True)
        history = history.at[:, t].set(node)

        nb = jnp.take(graph, jnp.maximum(node, 0), axis=0)         # (Q, M0)
        nb = jnp.where((node >= 0)[:, None], nb, -1)
        # drop already-seen: in beam or in history
        seen_beam = jnp.any(nb[:, :, None] == beam_ids[:, None, :], axis=-1)
        seen_hist = jnp.any(nb[:, :, None] == history[:, None, :], axis=-1)
        nb = jnp.where(seen_beam | seen_hist, -1, nb)

        nd = dist_to(nb)                                           # (Q, M0)

        # traversal beam merge (unfiltered)
        all_ids = jnp.concatenate([beam_ids, nb], axis=1)
        all_d = jnp.concatenate([beam_d, nd], axis=1)
        all_exp = jnp.concatenate(
            [beam_expanded, jnp.zeros_like(nb, dtype=bool)], axis=1
        )
        neg_top, pos = jax.lax.top_k(-all_d, ef)
        beam_d = -neg_top
        beam_ids = jnp.take_along_axis(all_ids, pos, axis=1)
        beam_expanded = jnp.take_along_axis(all_exp, pos, axis=1)

        # filtered result merge
        ok = allowed(nb)
        rd = jnp.where(ok, nd, INF)
        r_ids = jnp.concatenate([res_ids, nb], axis=1)
        r_d = jnp.concatenate([res_d, rd], axis=1)
        neg_top, pos = jax.lax.top_k(-r_d, k)
        res_d = -neg_top
        res_ids = jnp.take_along_axis(r_ids, pos, axis=1)

        return beam_ids, beam_d, beam_expanded, res_ids, res_d, history

    state = (beam_ids, beam_d, beam_expanded, res_ids, res_d, history)
    state = jax.lax.fori_loop(1, ef, body, state)
    _, _, _, res_ids, res_d, _ = state

    empty = jnp.isinf(res_d)
    if metric == "l2":
        fin = jnp.maximum(res_d + qn, 0.0)
    elif metric == "cosine":
        fin = jnp.clip(1.0 + res_d, 0.0, 2.0)
    else:
        fin = res_d
    dists = jnp.where(empty, INF, fin)
    ids = jnp.where(empty, -1, res_ids)
    return dists, ids


@functools.partial(jax.jit, static_argnames=("entry", "k", "ef", "metric"))
def graph_search_fn(queries, vectors, norms, role_bits, graph, query_masks,
                    entry, k, ef, row_map=None, metric="l2"):
    return graph_beam_search(
        queries, vectors, norms, role_bits, graph, query_masks,
        entry=entry, k=k, ef=ef, row_map=row_map, metric=metric,
    )


def graph_beam_search_filtered(
    queries: jax.Array,      # (Q, d) float32
    vectors: jax.Array,      # (n_pad, d)
    norms: jax.Array,        # (n_pad,)
    role_bits: jax.Array,    # (n_pad, W)
    graph: jax.Array,        # (n_pad, M0)
    query_masks: jax.Array,  # (Q, W)
    entry: int,
    k: int,
    ef: int,
    row_map: jax.Array = None,  # (n_local,) local -> arena row (no-copy mode)
    metric: str = "l2",
) -> Tuple[jax.Array, jax.Array]:
    """ACORN-style two-hop harvesting (reference acorn_benchmark /
    faiss::IndexACORNFlat semantics): navigation uses the full, unfiltered
    graph (keeping beam quality), while each expansion HARVESTS admissible
    results from the expanded node's 2-hop neighborhood — a ~M0x larger
    admissible sample per hop. Fixes the structural recall loss at low
    within-partition selectivity (results/anonysys_hnsw_1m.json): an
    unfiltered 1-hop traversal only ever sees sel*M0 admissible nodes per
    expansion, starving the result list.

    Cost per expansion is ~M0^2 candidate distances instead of M0 — use at
    low selectivity; plain graph_beam_search is cheaper when the user can
    read most of the partition.
    """
    q = queries.astype(jnp.float32)
    if metric == "cosine":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    nq, d = q.shape
    m0 = graph.shape[1]
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    compute_dtype = vectors.dtype
    qc = q.astype(compute_dtype)

    def _rows(ids):
        safe = jnp.maximum(ids, 0)
        return safe if row_map is None else jnp.take(row_map, safe)

    def dist_to(ids):
        safe = _rows(ids)
        x = jnp.take(vectors, safe, axis=0)
        nrm = jnp.take(norms, safe, axis=0)
        if metric == "l1":   # pgvector <+>: no matmul form, VPU reduce
            s = jnp.sum(jnp.abs(x.astype(jnp.float32) - q[:, None, :]),
                        axis=-1)
        else:
            dots = jnp.einsum("qd,qcd->qc", qc, x,
                              preferred_element_type=jnp.float32)
            s = (nrm - 2.0 * dots) if metric == "l2" else -dots
        return jnp.where(ids >= 0, s, INF)

    def allowed(ids):
        bits = jnp.take(role_bits, _rows(ids), axis=0)
        ok = jnp.any(jnp.bitwise_and(query_masks[:, None, :], bits) != 0, axis=-1)
        return jnp.logical_and(ok, ids >= 0)

    # traversal init: identical to the unfiltered beam
    entry_ids = jnp.full((nq, 1), entry, dtype=jnp.int32)
    entry_d = dist_to(entry_ids)
    beam_ids = jnp.concatenate(
        [entry_ids, jnp.full((nq, ef - 1), -1, jnp.int32)], axis=1)
    beam_d = jnp.concatenate([entry_d, jnp.full((nq, ef - 1), INF)], axis=1)
    beam_expanded = jnp.concatenate(
        [jnp.zeros((nq, 1), bool), jnp.ones((nq, ef - 1), bool)], axis=1)

    res_ids = jnp.full((nq, k), -1, jnp.int32)
    res_d = jnp.full((nq, k), INF)
    e_ok = allowed(entry_ids)
    res_ids = res_ids.at[:, 0].set(jnp.where(e_ok[:, 0], entry_ids[:, 0], -1))
    res_d = res_d.at[:, 0].set(jnp.where(e_ok[:, 0], entry_d[:, 0], INF))

    history = jnp.full((nq, ef), -1, dtype=jnp.int32)
    rows = jnp.arange(nq)

    def body(t, state):
        beam_ids, beam_d, beam_expanded, res_ids, res_d, history = state
        masked = jnp.where(beam_expanded, INF, beam_d)
        sel = jnp.argmin(masked, axis=1)
        active = jnp.isfinite(masked[rows, sel])
        node = jnp.where(active, beam_ids[rows, sel], -1)
        beam_expanded = beam_expanded.at[rows, sel].set(True)
        history = history.at[:, t].set(node)

        nb1 = jnp.take(graph, jnp.maximum(node, 0), axis=0)          # (Q, M0)
        nb1 = jnp.where((node >= 0)[:, None], nb1, -1)

        # navigation: UNFILTERED 1-hop beam update (beam quality preserved)
        seen_beam = jnp.any(nb1[:, :, None] == beam_ids[:, None, :], axis=-1)
        seen_hist = jnp.any(nb1[:, :, None] == history[:, None, :], axis=-1)
        nav = jnp.where(seen_beam | seen_hist, -1, nb1)
        nav_d = dist_to(nav)
        all_ids = jnp.concatenate([beam_ids, nav], axis=1)
        all_d = jnp.concatenate([beam_d, nav_d], axis=1)
        all_exp = jnp.concatenate(
            [beam_expanded, jnp.zeros_like(nav, dtype=bool)], axis=1)
        neg_top, pos = jax.lax.top_k(-all_d, ef)
        beam_d = -neg_top
        beam_ids = jnp.take_along_axis(all_ids, pos, axis=1)
        beam_expanded = jnp.take_along_axis(all_exp, pos, axis=1)

        # harvest: ADMISSIBLE results from the full 2-hop neighborhood
        nb2 = jnp.take(graph, jnp.maximum(nb1, 0), axis=0)           # (Q, M0, M0)
        nb2 = jnp.where((nb1 >= 0)[:, :, None], nb2, -1)
        cand = jnp.concatenate([nb1, nb2.reshape(nq, m0 * m0)], axis=1)
        seen_res = jnp.any(cand[:, :, None] == res_ids[:, None, :], axis=-1)
        ok = allowed(cand) & ~seen_res
        cd = jnp.where(ok, dist_to(cand), INF)
        # in-hop duplicates (a node reachable via several 1-hop parents)
        # share one distance; they can transiently occupy extra result
        # slots until displaced — the host merge's k-margin dedupes
        negc, posc = jax.lax.top_k(-cd, k)
        hv_d = -negc
        hv_ids = jnp.take_along_axis(jnp.where(ok, cand, -1), posc, axis=1)
        # drop in-hop duplicates (one node reachable via several parents)
        dup = jnp.any(
            (hv_ids[:, :, None] == hv_ids[:, None, :])
            & (jax.lax.broadcasted_iota(jnp.int32, (1, k, k), 2)
               < jax.lax.broadcasted_iota(jnp.int32, (1, k, k), 1)),
            axis=2,
        )
        hv_d = jnp.where(dup, INF, hv_d)
        hv_ids = jnp.where(dup, -1, hv_ids)
        r_ids = jnp.concatenate([res_ids, hv_ids], axis=1)
        r_d = jnp.concatenate([res_d, hv_d], axis=1)
        neg_top, pos = jax.lax.top_k(-r_d, k)
        res_d = -neg_top
        res_ids = jnp.take_along_axis(r_ids, pos, axis=1)
        return beam_ids, beam_d, beam_expanded, res_ids, res_d, history

    state = (beam_ids, beam_d, beam_expanded, res_ids, res_d, history)
    state = jax.lax.fori_loop(1, ef, body, state)
    _, _, _, res_ids, res_d, _ = state

    empty = jnp.isinf(res_d)
    if metric == "l2":
        fin = jnp.maximum(res_d + qn, 0.0)
    elif metric == "cosine":
        fin = jnp.clip(1.0 + res_d, 0.0, 2.0)
    else:
        fin = res_d
    dists = jnp.where(empty, INF, fin)
    ids = jnp.where(empty, -1, res_ids)
    return dists, ids


@functools.partial(jax.jit, static_argnames=("entry", "k", "ef", "metric"))
def graph_search_filtered_fn(queries, vectors, norms, role_bits, graph,
                             query_masks, entry, k, ef, row_map=None,
                             metric="l2"):
    return graph_beam_search_filtered(
        queries, vectors, norms, role_bits, graph, query_masks,
        entry=entry, k=k, ef=ef, row_map=row_map, metric=metric,
    )


def graph_beam_search_iterative(
    queries: jax.Array,      # (Q, d) float32
    vectors: jax.Array,      # (n_pad, d) compute dtype
    norms: jax.Array,        # (n_pad,) float32
    role_bits: jax.Array,    # (n_pad, W) uint32
    graph: jax.Array,        # (n_pad, M0) int32, -1 pad
    query_masks: jax.Array,  # (Q, W) uint32
    entries: jax.Array,      # (Q,) int32 per-query entry nodes — e.g. the
                             # comb's admissible medoid (predicate-aware)
    k: int,
    ef: int,                 # beam (priority queue) width
    max_steps: int,          # expansion budget
    harvest_2hop: bool = False,
    row_map: jax.Array = None,  # (n_local,) local -> arena row (no-copy mode)
    metric: str = "l2",
    pids: jax.Array = None,  # (Q,) int32 — MULTI-GRAPH mode: `graph` is a
                             # (P, n_class, M0) slab of many partitions'
                             # graphs and `row_map` is (P, n_class); each
                             # query q traverses graph[pids[q]]. This is
                             # the slotted-dispatch analog of
                             # tiled_bucket_topk for graph probes: a
                             # hybrid-dynamic strategy's 100+ per-(comb,
                             # partition) probe groups collapse into one
                             # dispatch per (graph class, ef bucket).
    step_budget: jax.Array = None,  # (Q,) int32 — per-QUERY expansion caps
                             # (traced, so probe groups that differ only in
                             # max_steps share one dispatch AND one
                             # compile; max_steps stays the static loop
                             # bound = max over the batch). A query whose
                             # budget is exhausted terminates exactly as if
                             # it ran in its own dispatch with
                             # max_steps=budget.
    packed_rows: jax.Array = None,  # (n_pad, d_pad + r_pad + 4) int8 —
                             # PACKED-ROW mode (round 5): one gather per
                             # candidate brings [int8 code | role one-hot |
                             # f32 norm bytes] instead of the three
                             # separate row gathers (bf16 vector + f32
                             # norm + u32 bits). XLA's row gather runs at
                             # ~50 ns/row regardless of width, so 3 takes
                             # -> 1 take cuts the gather half of the step
                             # (3.45 of 5.3 ms at Q=2048,
                             # scripts/gather_attrib_probe.py) roughly 3x.
                             # Build with core.build_packed_graph_rows.
    mask8: jax.Array = None,  # (Q, r_pad) int8 0/1 role one-hot per query
                             # (packed mode's admissibility operand)
    dq_scale: float = 1.0,   # 1 / quant scale (packed mode dequant)
    q_center_dot: jax.Array = None,  # (Q,) f32 query . quant-center
) -> Tuple[jax.Array, jax.Array]:
    """Iterative-rescan filtered beam search — the batched analog of
    pgvector's `hnsw.iterative_scan` (reference pgvector/src/hnsw.c:90,
    hnswscan.c: keep scanning until k rows survive the filter).

    Differences vs graph_beam_search (the round-1 fixed-budget traversal,
    whose recall plateaued at 0.51 on 1M dynamic partitions):

    - per-query TERMINATION with classic ef semantics: a query stops when
      its frontier is exhausted, or when the nearest unexpanded candidate
      is farther than the ef-th nearest VISITED node (the unfiltered
      window W — pgvector's termination test against the ef_search-wide
      candidate set, hnswscan.c) AND the filtered result list is full.
      Terminating against the filtered list alone prunes wrongly at high
      selectivity (measured recall 0.90 vs 0.983: a frontier node farther
      than the kk-th admissible result can still route to closer nodes);
      low-selectivity queries keep expanding past standard termination
      until k admissible rows are found, up to max_steps — that
      continuation is exactly pgvector's hnsw.iterative_scan;
    - dedup by BEAM+HISTORY broadcast compare: a new neighbor is dropped
      if it sits in the current beam (unexpanded candidates) or in the
      expansion history (width = the static step bound, so an expanded
      node can NEVER be re-expanded — unlike the round-1 approximate
      check whose fixed ef-wide history overflowed). A node evicted from
      the beam unexpanded may be re-enqueued (and re-enter the result
      list; the host merge's k-margin dedupes ids), which spends beam
      slots but no expansion budget. This replaced an exact packed
      visited bitmap ((Q, n_pad/32) uint32 scatter-add): the bitmap's
      take_along_axis + scatter was the single largest step cost on TPU
      (2.06 of 5.30 ms/step at Q=2048, measured scripts/dedup_probe.py;
      compares are pure elementwise VPU work, 1.5x faster end-to-end)
      and its scratch was n_pad-sized while history is max_steps-sized;
    - per-query entry points (callers pass the admissible node nearest the
      partition medoid per comb — starting inside the admissible region).
    """
    q = queries.astype(jnp.float32)
    if metric == "cosine":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    nq, d = q.shape
    multi = pids is not None
    m0 = graph.shape[-1]
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    compute_dtype = vectors.dtype
    qc = q.astype(compute_dtype)
    rows = jnp.arange(nq)

    def _rows(ids):
        safe = jnp.maximum(ids, 0)
        if row_map is None:
            return safe
        if multi:
            return row_map[pids[:, None], safe]   # (Q, C) per-query graph
        return jnp.take(row_map, safe)

    def _neighbors(node):
        safe = jnp.maximum(node, 0)
        return graph[pids, safe] if multi else jnp.take(graph, safe, axis=0)

    def dist_to(ids):
        safe = _rows(ids)
        x = jnp.take(vectors, safe, axis=0)
        nrm = jnp.take(norms, safe, axis=0)
        if metric == "l1":   # pgvector <+>: no matmul form, VPU reduce
            s = jnp.sum(jnp.abs(x.astype(jnp.float32) - q[:, None, :]),
                        axis=-1)
        else:
            dots = jnp.einsum("qd,qcd->qc", qc, x,
                              preferred_element_type=jnp.float32)
            s = (nrm - 2.0 * dots) if metric == "l2" else -dots
        return jnp.where(ids >= 0, s, INF)

    def allowed(ids):
        bits = jnp.take(role_bits, _rows(ids), axis=0)
        ok = jnp.any(jnp.bitwise_and(query_masks[:, None, :], bits) != 0, axis=-1)
        return jnp.logical_and(ok, ids >= 0)

    if packed_rows is not None:
        assert metric != "l1", "packed-row graph mode has no l1 form"
        unit = packed_rows.shape[1]
        d_pack = unit - 4 - mask8.shape[1]   # [vq | roles8 | norm f32]
        qp = q if q.shape[1] == d_pack else jnp.pad(
            q, ((0, 0), (0, d_pack - q.shape[1])))
        qcd = (jnp.zeros((nq,), jnp.float32) if q_center_dot is None
               else q_center_dot)

        def score_admit(ids):
            """One gather: (scores, admissible) for candidate ids."""
            rowsv = jnp.take(packed_rows, _rows(ids), axis=0)  # (Q,C,unit)
            v8 = rowsv[..., :d_pack].astype(jnp.float32)
            dots = (jnp.einsum("qd,qcd->qc", qp, v8,
                               preferred_element_type=jnp.float32)
                    * jnp.float32(dq_scale) + qcd[:, None])
            if metric == "l2":
                nrm = jax.lax.bitcast_convert_type(
                    rowsv[..., d_pack + mask8.shape[1]:], jnp.float32
                ).reshape(rowsv.shape[:-1])
                s = nrm - 2.0 * dots
            else:
                s = -dots
            admit = jnp.any(
                (rowsv[..., d_pack:d_pack + mask8.shape[1]]
                 & mask8[:, None, :]) != 0, axis=-1)
            valid = ids >= 0
            return jnp.where(valid, s, INF), admit & valid
    else:
        def score_admit(ids):
            return dist_to(ids), allowed(ids)

    entry_ids = entries.astype(jnp.int32).reshape(nq, 1)
    entry_d, e_ok = score_admit(entry_ids)
    # the beam holds ONLY unexpanded candidates (pgvector's candidate
    # queue): expanded nodes leave, so the frontier never starves — the
    # round-1 beam kept expanded nodes, which crowded out far unexpanded
    # candidates and capped filtered recall regardless of budget
    beam_ids = jnp.concatenate(
        [entry_ids, jnp.full((nq, ef - 1), -1, jnp.int32)], axis=1)
    beam_d = jnp.concatenate([entry_d, jnp.full((nq, ef - 1), INF)], axis=1)

    res_ids = jnp.full((nq, k), -1, jnp.int32)
    res_d = jnp.full((nq, k), INF)
    res_ids = res_ids.at[:, 0].set(jnp.where(e_ok[:, 0], entry_ids[:, 0], -1))
    res_d = res_d.at[:, 0].set(jnp.where(e_ok[:, 0], entry_d[:, 0], INF))

    # W: the ef nearest VISITED nodes, unfiltered — the classic-HNSW
    # termination window (res_d is the FILTERED top-k and must not gate
    # exploration)
    w_d = jnp.concatenate([entry_d, jnp.full((nq, ef - 1), INF)], axis=1)

    # expansion history: one slot per possible step. The entry node needs
    # no marking — it sits in the beam until popped, then lands in history.
    history = jnp.full((nq, max_steps), -1, dtype=jnp.int32)

    def _done(t, beam_d, res_d, w_d):
        fmin = jnp.min(beam_d, axis=1)
        res_full = jnp.isfinite(res_d[:, -1])
        done = ~jnp.isfinite(fmin) | ((fmin >= w_d[:, -1]) & res_full)
        if step_budget is not None:
            done = done | (t >= step_budget)
        return done

    def cond(state):
        t, beam_ids, beam_d, res_ids, res_d, w_d, history = state
        return (t < max_steps) & ~jnp.all(_done(t, beam_d, res_d, w_d))

    def body(state):
        t, beam_ids, beam_d, res_ids, res_d, w_d, history = state
        sel = jnp.argmin(beam_d, axis=1)
        fmin = beam_d[rows, sel]
        active = jnp.isfinite(fmin) & ~_done(t, beam_d, res_d, w_d)
        node = jnp.where(active, beam_ids[rows, sel], -1)
        # pop the expanded node from the queue
        beam_d = beam_d.at[rows, sel].set(INF)
        beam_ids = beam_ids.at[rows, sel].set(-1)
        history = history.at[:, t].set(node)

        nb = _neighbors(node)                                    # (Q, M0)
        nb = jnp.where((node >= 0)[:, None], nb, -1)
        seen = (jnp.any(nb[:, :, None] == beam_ids[:, None, :], axis=-1)
                | jnp.any(nb[:, :, None] == history[:, None, :], axis=-1))
        nb = jnp.where(seen, -1, nb)
        nd, nb_ok = score_admit(nb)

        # queue merge: keep the ef nearest unexpanded candidates
        all_ids = jnp.concatenate([beam_ids, nb], axis=1)
        all_d = jnp.concatenate([beam_d, nd], axis=1)
        neg_top, pos = jax.lax.top_k(-all_d, ef)
        beam_d = -neg_top
        beam_ids = jnp.take_along_axis(all_ids, pos, axis=1)

        # visited-best window merge (termination state)
        neg_w, _ = jax.lax.top_k(-jnp.concatenate([w_d, nd], axis=1), ef)
        w_d = -neg_w

        # filtered result merge (optionally harvesting the 2-hop ring)
        if harvest_2hop:
            if multi:
                nb2 = graph[pids[:, None], jnp.maximum(nb, 0)]
            else:
                nb2 = jnp.take(graph, jnp.maximum(nb, 0), axis=0)
            nb2 = jnp.where((nb >= 0)[:, :, None], nb2, -1).reshape(nq, m0 * m0)
            # 2-hop candidates enter the RESULT list only and are NOT
            # marked visited (a harvested-then-displaced node must stay
            # reachable); dedupe against the current result list and
            # against in-hop duplicates instead
            seen_res = jnp.any(nb2[:, :, None] == res_ids[:, None, :], axis=-1)
            d2_raw, ok2_raw = score_admit(nb2)
            ok2 = ok2_raw & ~seen_res
            nd2 = jnp.where(ok2, d2_raw, INF)
            nb2 = jnp.where(ok2, nb2, -1)
            negh, posh = jax.lax.top_k(-nd2, k)
            hv_d = -negh
            hv_ids = jnp.take_along_axis(nb2, posh, axis=1)
            dup = jnp.any(
                (hv_ids[:, :, None] == hv_ids[:, None, :])
                & (jax.lax.broadcasted_iota(jnp.int32, (1, k, k), 2)
                   < jax.lax.broadcasted_iota(jnp.int32, (1, k, k), 1)),
                axis=2,
            )
            hv_d = jnp.where(dup, INF, hv_d)
            hv_ids = jnp.where(dup, -1, hv_ids)
            # 1-hop arrivals may already sit in res (they could have been
            # harvested un-visited in an earlier step) — dedupe those too
            nb_in_res = jnp.any(nb[:, :, None] == res_ids[:, None, :], axis=-1)
            cand_ids = jnp.concatenate([nb, hv_ids], axis=1)
            cand_d = jnp.concatenate(
                [jnp.where(nb_ok & ~nb_in_res, nd, INF), hv_d], axis=1)
        else:
            cand_ids = nb
            cand_d = jnp.where(nb_ok, nd, INF)
        r_ids = jnp.concatenate([res_ids, cand_ids], axis=1)
        r_d = jnp.concatenate([res_d, cand_d], axis=1)
        neg_top, pos = jax.lax.top_k(-r_d, k)
        res_d = -neg_top
        res_ids = jnp.take_along_axis(r_ids, pos, axis=1)
        return (t + 1, beam_ids, beam_d, res_ids, res_d, w_d, history)

    state = (jnp.int32(0), beam_ids, beam_d, res_ids, res_d, w_d, history)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, res_ids, res_d, _, _ = state

    empty = jnp.isinf(res_d)
    if metric == "l2":
        fin = jnp.maximum(res_d + qn, 0.0)
    elif metric == "cosine":
        fin = jnp.clip(1.0 + res_d, 0.0, 2.0)
    else:
        fin = res_d
    dists = jnp.where(empty, INF, fin)
    ids = jnp.where(empty, -1, res_ids)
    return dists, ids


@functools.partial(
    jax.jit, static_argnames=("k", "ef", "max_steps", "harvest_2hop",
                              "metric", "dq_scale")
)
def graph_search_iterative_fn(queries, vectors, norms, role_bits, graph,
                              query_masks, entries, k, ef, max_steps,
                              harvest_2hop=False, row_map=None, metric="l2",
                              pids=None, step_budget=None, packed_rows=None,
                              mask8=None, dq_scale=1.0, q_center_dot=None):
    return graph_beam_search_iterative(
        queries, vectors, norms, role_bits, graph, query_masks, entries,
        k=k, ef=ef, max_steps=max_steps, harvest_2hop=harvest_2hop,
        row_map=row_map, metric=metric, pids=pids, step_budget=step_budget,
        packed_rows=packed_rows, mask8=mask8, dq_scale=dq_scale,
        q_center_dot=q_center_dot,
    )
