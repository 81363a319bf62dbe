"""QD-tree baseline ("QDTree" / HQI): workload-aware binary partition tree.

Re-implements the semantics of the reference's HQI baseline (reference
controller/baseline/HQI/qd_tree.py): documents are recursively split by
predicates — role membership (`doc readable by role r`) or vector-space
side (2-means centroid assignment of document mean vectors, reference
:161-174 Predicate, :207 run_kmeans) — choosing at each node the split
that minimizes expected query-visited volume and balance (reference
:420-505 find_best_split). Leaves become partitions (reference
:1217 persist_partitions_to_postgres); queries visit leaves that are
role-reachable, pruned along centroid predicates by the query vector's
side (reference :1347-1469 qd_tree_search_statistics_sql). Trees pickle to
disk (reference :1724 save_qd_tree / :1741 load_qd_tree).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from typing import Dict, FrozenSet, List, Optional, Sequence, Set, Tuple

import numpy as np

from ..core import Corpus, DeviceArena
from ..rbac.world import RBACWorld
from ..utils.config import FrameworkConfig
from ..utils.logger import get_logger
from .base import BuiltPartition, PartitionedSearcher, make_partition_index

logger = get_logger("qdtree")


@dataclass
class QDNode:
    # predicate: ("role", role_id) or ("centroid", left_center, right_center)
    pred: Optional[tuple] = None
    left: Optional["QDNode"] = None    # predicate true / nearer left center
    right: Optional["QDNode"] = None
    leaf_id: int = -1
    docs: Optional[FrozenSet[int]] = None  # leaves only


@dataclass
class QDTree:
    root: QDNode
    leaf_docs: List[FrozenSet[int]]
    # row-level leaves (reference parity: qd_tree_partition_<p> tables hold
    # documentblock ROWS; the centroid predicate is the k-means id of the
    # block vector, reference HQI/qd_tree.py:161-174/:207 — so one document's
    # blocks may span leaves). None for legacy doc-level trees (old pickles):
    # the searcher then derives rows from leaf_docs.
    leaf_rows: Optional[List[np.ndarray]] = None
    # estimated kNN radius (unsquared L2) of the workload against the
    # corpus, measured at build. When set, routing uses the geometric
    # hyperplane-margin rule: descend BOTH sides of a centroid predicate
    # iff the query is within `radius` of the separating hyperplane
    # (|dl-dr| <= 2*||c0-c1||*radius) — the exact branch-and-bound
    # condition for kNN correctness, replacing the legacy
    # |dl-dr| <= margin*(dl+dr) heuristic whose (dl+dr) normalization
    # admits both sides for nearly every query at coarse splits.
    route_radius: Optional[float] = None

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path: str) -> "QDTree":
        with open(path, "rb") as f:
            return pickle.load(f)

    def routing_arrays(self):
        """Vectorized-routing precomputation: the stacked centroid matrix
        and, per leaf, its path of (centroid-node index, side) decisions.

        route() walks the tree per query in Python (recursion + numpy
        scalar distances + a docs-set intersection per leaf) — ~0.3 ms per
        query, which dominated the QDTree pass at 1M (the chunk scans are
        batched device work). The same decisions vectorize: one
        (Q, 2K) distance matmul against all centroid pairs, boolean
        side-admissibility per node, AND along each leaf's path.

        Returns (centroids (2K, d) float32 — node k's left/right centers
        at columns 2k/2k+1; paths {leaf_id: [(k, side), ...]}).
        """
        cents: List[np.ndarray] = []
        paths: Dict[int, List[Tuple[int, int]]] = {}

        def walk(node: QDNode, path: Tuple[Tuple[int, int], ...]):
            if node.leaf_id >= 0:
                paths[node.leaf_id] = list(path)
                return
            if node.pred[0] == "centroid":
                k = len(cents) // 2
                _, lc, rc = node.pred
                cents.append(np.asarray(lc, dtype=np.float32))
                cents.append(np.asarray(rc, dtype=np.float32))
                walk(node.left, path + (((k, 0)),))
                walk(node.right, path + (((k, 1)),))
            else:
                # role predicates never prune by query vector (route());
                # doc-reachability is decided at the leaves
                walk(node.left, path)
                walk(node.right, path)

        walk(self.root, ())
        C = np.stack(cents) if cents else np.zeros((0, 0), np.float32)
        return C, paths

    def route(self, accessible: Set[int], qvec: Optional[np.ndarray],
              prune_by_centroid: bool = True,
              prune_margin: float = 0.25,
              radius: Optional[float] = None) -> List[int]:
        """Leaves reachable for a user with `accessible` docs, pruned along
        centroid predicates by the query vector's side.

        radius (preferred; defaults to self.route_radius): descend BOTH
        sides iff the query lies within `radius` of the separating
        hyperplane — |dl-dr| <= 2*||c0-c1||*radius, the exact
        branch-and-bound condition: a neighbor within `radius` of the
        query can only sit across the boundary if the query is that close
        to it. With radius >= the query's true kNN distance, centroid
        pruning is lossless.

        prune_margin (legacy, used when no radius is available): both
        sides iff |dl-dr| <= margin*(dl+dr) — strict nearer-side pruning
        (margin 0) measured recall@10 0.824 at 1M; margin 0.25 restored
        >=0.95 but admits both sides for nearly every query at coarse
        splits where (dl+dr) is large."""
        if radius is None:
            radius = self.route_radius
        out: List[int] = []

        def walk(node: QDNode):
            if node.leaf_id >= 0:
                if node.docs & accessible:
                    out.append(node.leaf_id)
                return
            kind = node.pred[0]
            if kind == "centroid" and prune_by_centroid and qvec is not None:
                _, lc, rc = node.pred
                dl = float(((qvec - lc) ** 2).sum())
                dr = float(((qvec - rc) ** 2).sum())
                if radius is not None:
                    cd = float(np.sqrt(((lc - rc) ** 2).sum()))
                    decisive = abs(dl - dr) > 2.0 * cd * radius
                else:
                    decisive = abs(dl - dr) > prune_margin * (dl + dr)
                if decisive:
                    walk(node.left if dl <= dr else node.right)
                    return
            walk(node.left)
            walk(node.right)

        walk(self.root)
        return out


def _entry_sides_centroid(
    qv: np.ndarray, c0: np.ndarray, c1: np.ndarray, margin: float,
    radius: Optional[float] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Which sides of a centroid predicate each query vector descends,
    mirroring QDTree.route() exactly: the geometric hyperplane-margin
    rule when a kNN radius is known (both sides iff
    |dl-dr| <= 2*||c0-c1||*radius), else the legacy
    |dl-dr| <= margin*(dl+dr) heuristic."""
    dl = ((qv - c0[None, :]) ** 2).sum(1)
    dr = ((qv - c1[None, :]) ** 2).sum(1)
    if radius is not None:
        cd = float(np.sqrt(((c0 - c1) ** 2).sum()))
        both = np.abs(dl - dr) <= 2.0 * cd * radius
    else:
        both = np.abs(dl - dr) <= margin * (dl + dr)
    return (dl <= dr) | both, (dr < dl) | both


def _split_score(
    n_left: int,
    n_right: int,
    enters_left: np.ndarray,
    enters_right: np.ndarray,
    visit_cost: float,
) -> Tuple[float, float]:
    """Expected engine cost (row units) over the surviving workload
    sample, tie-broken by balance (reference find_best_split:
    query-overlap cost then balance). `enters_*` say, per sampled query,
    whether the router would descend into that child — role predicates by
    docset overlap, centroid predicates by the query VECTOR's side (the
    credit the round-4 scorer missed: it charged every query to both
    sides of every centroid split, so vector-space splits never won and
    one ~860k-row leaf absorbed 86% of the workload). `visit_cost` (rows)
    charges the tiled engine's fixed per-leaf-visit overhead — dispatch
    slots, chunk-class padding, merge fan-out — so the tree stops
    fragmenting once a split no longer buys enough pruning to pay for the
    extra visits."""
    if enters_left.size:
        cost = float((n_left + visit_cost) * enters_left.sum()
                     + (n_right + visit_cost) * enters_right.sum())
    else:  # no surviving queries: plain volume, balance-tiebroken
        cost = float(n_left + n_right) + 2.0 * visit_cost
    balance = abs(n_left - n_right) / max(n_left + n_right, 1)
    # raw cost first (the stop rule compares it against serving the node
    # unsplit — a balance-inflated cost there vetoes every imbalanced but
    # genuinely-pruning role split), balance only as the tie-break
    return (cost, balance)


def build_qd_tree(
    corpus: Corpus,
    world: RBACWorld,
    query_docsets: Sequence[FrozenSet[int]],
    min_leaf: int = 64,
    max_depth: int = 8,
    n_candidate_roles: int = 16,
    seed: int = 0,
    query_vecs: Optional[np.ndarray] = None,
    prune_margin: float = 0.25,
    visit_rows: Optional[float] = None,
    radius_scale: float = 0.3,
) -> QDTree:
    """Row-level qd-tree (reference parity: qd_tree_partition_<p> tables
    hold documentblock ROWS and the centroid predicate is the k-means id
    of the BLOCK vector, reference HQI/qd_tree.py:161-174 Predicate /
    :207 run_kmeans — one document's blocks may land in different leaves).
    Role predicates still split at document granularity (role membership
    is a document property). Splits are scored by expected tiled-engine
    cost over the sampled workload: rows scanned + a `visit_rows` tax per
    leaf entered, with centroid entry decided by the query VECTOR's side
    under route()'s margin rule. Splitting stops when no predicate beats
    serving the node as one leaf."""
    rng = np.random.default_rng(seed)
    n_rows = corpus.n
    doc_ids = corpus.doc_ids.astype(np.int64)
    rows_per_doc = max(corpus.avg_blocks_per_doc, 1.0)
    min_rows = min_leaf * rows_per_doc
    if visit_rows is None:
        # engine constant (dispatch-slot + merge share per leaf visit;
        # chunk-class PADDING is modeled exactly by _scan_rows below),
        # scaled down for tiny corpora where a large tax would forbid any
        # split. 8192 measured best at 1M: lower taxes fragment the tree
        # into 100+ leaves whose dispatch slots serialize (6.1k QPS at
        # 114 partitions vs 19.4k at 27, results/qdtree_radius_sweep_1m)
        visit_rows = min(8192.0, max(n_rows / 16.0, 8.0))

    # sampled workload as a (Sq, num_docs) bool matrix for vectorized
    # overlap tests; query_vecs[i] (if given) is query i's vector and
    # lets centroid splits be scored by routing side
    qd_mat = np.zeros((len(query_docsets), corpus.num_docs), dtype=bool)
    for i, qd in enumerate(query_docsets):
        idx = np.fromiter(qd, dtype=np.int64, count=len(qd))
        qd_mat[i, idx[idx < corpus.num_docs]] = True
    if query_vecs is not None:
        query_vecs = np.asarray(query_vecs, dtype=np.float32)
        assert len(query_vecs) == len(query_docsets)

    # kNN-radius estimate for the geometric hyperplane-margin rule: per
    # sampled query, the EXACT distance to its radius_k-th accessible row
    # over the full corpus (chunked BLAS matmul — ~1 s at 1M x 128; a
    # subsample estimate overshoots badly because an s-selectivity user's
    # accessible rows in the query's own cluster rarely survive the
    # subsample, and an inflated radius makes every centroid split look
    # unroutable). The tree keeps the p90 across queries.
    route_radius: Optional[float] = None
    radius_k = 10
    if query_vecs is not None and n_rows > 0:
        qn = (query_vecs ** 2).sum(1)[:, None]
        kth: List[np.ndarray] = []
        cand = [np.full((len(query_vecs), 0), np.inf)]
        for s0 in range(0, n_rows, 131072):
            blk = slice(s0, min(s0 + 131072, n_rows))
            bv = corpus.vectors[blk].astype(np.float32)
            d2 = (-2.0 * (query_vecs @ bv.T)
                  + (bv ** 2).sum(1)[None, :] + qn)
            d2 = np.where(qd_mat[:, doc_ids[blk]], d2, np.inf)
            kk = min(radius_k, d2.shape[1])
            cand.append(np.partition(d2, kk - 1, axis=1)[:, :kk])
        allc = np.concatenate(cand, axis=1)
        kk = min(radius_k, allc.shape[1])
        kth_d2 = np.partition(allc, kk - 1, axis=1)[:, kk - 1]
        ok = np.isfinite(kth_d2)
        if ok.any():
            route_radius = float(np.sqrt(max(
                np.percentile(kth_d2[ok], 90), 0.0)))
            # A hyperplane cannot GUARANTEE kNN separation in high-d (the
            # per-direction data spread is ~sqrt(trace(Sigma)/d), far below
            # the kNN radius — the classic kd-tree curse), so exact
            # branch-and-bound would descend both sides everywhere.
            # Serving is IVF-style approximate multiprobe instead: the
            # effective routing radius is a tuned fraction of the true
            # kNN radius, the recall/QPS knob (measured ladder in
            # results/qdtree_radius_sweep_1m.json).
            route_radius *= radius_scale

    role_doc_mask: Dict[int, np.ndarray] = {}

    def _role_mask(r: int) -> np.ndarray:
        m = role_doc_mask.get(r)
        if m is None:
            dd = world.role_to_docs[r]
            idx = np.fromiter(dd, dtype=np.int64, count=len(dd))
            m = np.zeros(corpus.num_docs, dtype=bool)
            m[idx[idx < corpus.num_docs]] = True
            role_doc_mask[r] = m
        return m

    leaf_docs: List[FrozenSet[int]] = []
    leaf_rows: List[np.ndarray] = []

    def _leaf(rows: np.ndarray) -> QDNode:
        docs = frozenset(np.unique(doc_ids[rows]).tolist())
        leaf = QDNode(leaf_id=len(leaf_docs), docs=docs)
        leaf_docs.append(docs)
        leaf_rows.append(np.asarray(rows, dtype=np.int64))
        return leaf

    from .tiled import _SMALL_CHUNKS, chunk_class

    def _scan_rows(n: int) -> float:
        """Rows the tiled engine actually SCANS when an n-row leaf is
        visited: chunk-class padding for chunk-engine leaves (a 2-chunk
        leaf in the 8-chunk small class scans 16k rows), raw n for
        big-tier leaves (the flagship kernel pads negligibly) and for
        corpora too small for the tiled engine's chunk granularity."""
        if n_rows <= _SMALL_CHUNKS * 2048:
            return float(n)
        nc = -(-max(n, 1) // 2048)
        if nc > 48:      # TiledSearcher big_chunks
            return float(n)
        return float(chunk_class(nc, _SMALL_CHUNKS) * 2048)

    def split(rows: np.ndarray, depth: int, qidx: np.ndarray) -> QDNode:
        if len(rows) <= min_rows or depth >= max_depth:
            return _leaf(rows)

        nd = doc_ids[rows]
        doc_rows_node = np.bincount(nd, minlength=corpus.num_docs)
        present = doc_rows_node > 0
        q_over = qd_mat[qidx]              # (nq, num_docs)
        best_key = (float("inf"), float("inf"))
        best = None                        # (pred, row_sel_or_None, el, er)

        # role predicates: score EVERY role that actually splits this node
        # (sampling only above the candidate cap) — the reference's
        # find_best_split scores the full candidate list (HQI/qd_tree.py:
        # 420-505). Row counts come from the per-doc bincount (O(num_docs)
        # per role); the winner's row selector is materialized once below.
        roles = list(world.role_to_docs.keys())
        if len(roles) > 4 * n_candidate_roles:
            rng.shuffle(roles)
            roles = roles[: 4 * n_candidate_roles]
        for r in roles:
            rmask = _role_mask(r)
            lmask_docs = present & rmask
            if not lmask_docs.any() or not (present & ~rmask).any():
                continue
            n_l = int(doc_rows_node[lmask_docs].sum())
            n_r = len(rows) - n_l
            el = (q_over & lmask_docs).any(1)
            er = (q_over & (present & ~rmask)).any(1)
            key = _split_score(_scan_rows(n_l), _scan_rows(n_r), el, er,
                               visit_rows)
            if key < best_key:
                best_key, best = key, (("role", r), None, el, er)

        # centroid predicate: 2-means on BLOCK vectors (fitted on a
        # subsample, sizes estimated from it; the winning predicate is
        # materialized exactly below), scored by where the sampled query
        # VECTORS route under route()'s margin rule
        if len(rows) >= 8:
            qv = query_vecs[qidx] if query_vecs is not None else None
            fit = rows if len(rows) <= 4096 else rng.choice(
                rows, 4096, replace=False)
            pts = corpus.vectors[fit]
            for _restart in range(3):
                c = pts[rng.choice(len(pts), 2, replace=False)].copy()
                for _ in range(8):
                    d0 = ((pts - c[0]) ** 2).sum(1)
                    d1 = ((pts - c[1]) ** 2).sum(1)
                    a = d0 <= d1
                    if a.all() or (~a).all():
                        break
                    c[0] = pts[a].mean(0)
                    c[1] = pts[~a].mean(0)
                d0 = ((pts - c[0]) ** 2).sum(1)
                d1 = ((pts - c[1]) ** 2).sum(1)
                frac = float((d0 <= d1).mean())
                if not (0.0 < frac < 1.0):
                    continue
                n_l = int(round(frac * len(rows)))
                n_r = len(rows) - n_l
                if qv is not None and len(qv):
                    el, er = _entry_sides_centroid(qv, c[0], c[1],
                                                   prune_margin,
                                                   radius=route_radius)
                else:  # no vectors: both sides (the pre-fix behavior)
                    el = np.ones(len(qidx), bool)
                    er = np.ones(len(qidx), bool)
                key = _split_score(_scan_rows(n_l), _scan_rows(n_r), el, er,
                                   visit_rows)
                if key < best_key:
                    best_key, best = key, (
                        ("centroid", c[0].copy(), c[1].copy()), None, el, er)

        # stop rule: splitting must beat serving this node as ONE leaf
        # (its padded scan volume + a visit, per entering query) — without
        # it the visit tax is charged but never compared, and the tree
        # fragments into hundreds of leaves with ~90-leaf query fan-out
        # (measured at 1M: fan-out 93 over 314 leaves drowned the tiled
        # engine in dispatch slots)
        node_cost = (_scan_rows(len(rows)) + visit_rows) * max(len(qidx), 1)
        if best is None or best_key[0] >= node_cost:
            return _leaf(rows)
        pred, sel, el, er = best
        if sel is None:  # materialize the winner's exact row assignment
            if pred[0] == "role":
                sel = _role_mask(pred[1])[nd]
            else:
                _, c0, c1 = pred
                v = corpus.vectors[rows]
                sel = (((v - c0[None, :]) ** 2).sum(1)
                       <= ((v - c1[None, :]) ** 2).sum(1))
            if sel.all() or not sel.any():
                return _leaf(rows)
        node = QDNode(pred=pred)
        # thread only the surviving queries into each child: a query the
        # router would never send into a subtree must not veto (or be
        # charged for) that subtree's further splits
        node.left = split(rows[sel], depth + 1, qidx[el] if el.size else qidx)
        node.right = split(rows[~sel], depth + 1,
                           qidx[er] if er.size else qidx)
        return node

    root = split(np.arange(n_rows, dtype=np.int64), 0,
                 np.arange(len(query_docsets)))
    logger.info("qd-tree: %d leaves (route radius %s)", len(leaf_docs),
                f"{route_radius:.1f}" if route_radius else "none")
    return QDTree(root=root, leaf_docs=leaf_docs, leaf_rows=leaf_rows,
                  route_radius=route_radius)


def validate_qdtree_partitions(tree: QDTree, world: RBACWorld) -> None:
    """Leaves must partition the corpus exactly (reference
    controller/baseline/HQI/debug/validate_qdtree_partitions.py): row-level
    trees partition the ROWS (a document's blocks may span leaves, as the
    reference's block-level centroid predicate allows); legacy doc-level
    trees partition the documents."""
    if tree.leaf_rows is not None:
        allr = np.concatenate(tree.leaf_rows) if tree.leaf_rows else (
            np.zeros(0, dtype=np.int64))
        srt = np.sort(allr)
        assert len(srt) == 0 or (
            srt[0] == 0 and np.all(np.diff(srt) == 1)
        ), "leaf rows do not partition the corpus"
        covered: Set[int] = set()
        for docs in tree.leaf_docs:
            covered |= docs
        assert covered == set(range(world.num_docs)), (
            "leaves do not cover all docs")
        return
    seen: Set[int] = set()
    for docs in tree.leaf_docs:
        assert not (docs & seen), "leaf overlap"
        seen |= docs
    assert seen == set(range(world.num_docs)), "leaves do not cover all docs"


def build_qdtree_searcher(
    corpus: Corpus,
    world: RBACWorld,
    arena: DeviceArena,
    cfg: FrameworkConfig,
    workload=None,
    min_leaf: int = 64,
    max_depth: int = 16,
    prune_by_centroid: bool = True,   # HQI routes one side at centroid
                                      # predicates (reference
                                      # qd_tree_search_statistics_sql)
    prune_margin: float = 0.25,       # both-sides margin (legacy trees)
    radius_scale: float = 0.3,        # multiprobe radius as a fraction of
                                      # the measured kNN radius — the
                                      # recall/QPS knob: 0.3 measured
                                      # 19.4k QPS @ 0.9995 at 1M; 0.2
                                      # fragments and serializes (3.3k)
    visit_rows: Optional[float] = None,  # per-leaf-visit tax (rows) for
                                      # the split scorer; None = engine
                                      # default (see build_qd_tree)
    tree: Optional[QDTree] = None,
    packed: bool = True,
) -> PartitionedSearcher:
    if tree is None:
        query_vecs = None
        if workload is not None:
            # sample QUERIES (vector + issuing user's docset), not just
            # users: the vectors let build_qd_tree score centroid splits
            # by routing side
            rng = np.random.default_rng(cfg.seed)
            sel = rng.choice(len(workload.user_ids),
                             min(256, len(workload.user_ids)),
                             replace=False)
            docs_cache: Dict[int, FrozenSet[int]] = {}
            query_docsets = []
            for u in workload.user_ids[sel]:
                u = int(u)
                if u not in docs_cache:
                    docs_cache[u] = world.user_docs(u)
                query_docsets.append(docs_cache[u])
            query_vecs = np.asarray(workload.vectors[sel], dtype=np.float32)
        else:
            query_docsets = [world.comb_docs(c) for c in world.combs[:64]]
        tree = build_qd_tree(corpus, world, query_docsets,
                             min_leaf=min_leaf, max_depth=max_depth,
                             seed=cfg.seed, query_vecs=query_vecs,
                             prune_margin=prune_margin,
                             radius_scale=radius_scale,
                             visit_rows=visit_rows)
    validate_qdtree_partitions(tree, world)

    partition_rows: Dict[int, np.ndarray] = {}
    if tree.leaf_rows is not None:   # row-level tree: rows are the leaf
        for pid, rows in enumerate(tree.leaf_rows):
            if len(rows):
                partition_rows[pid] = np.asarray(rows)
    else:                            # legacy doc-level tree (old pickles)
        for pid, docs in enumerate(tree.leaf_docs):
            rows = corpus.rows_for_docs(
                np.fromiter(docs, dtype=np.int64, count=len(docs)))
            if len(rows):
                partition_rows[pid] = rows

    user_docs_cache: Dict[int, Set[int]] = {}

    def vector_router(uid: int, qvec: Optional[np.ndarray]):
        if uid not in user_docs_cache:
            user_docs_cache[uid] = set(world.user_docs(uid))
        pids = tree.route(user_docs_cache[uid], qvec, prune_by_centroid,
                          prune_margin=prune_margin)
        return tuple(p for p in pids if p in partition_rows)

    # ---- vectorized batch router (identical decisions to route()) ----
    C, leaf_paths = tree.routing_arrays()
    leaf_ids = sorted(p for p in leaf_paths if p in partition_rows)
    leaf_col = {lid: c for c, lid in enumerate(leaf_ids)}
    # doc -> leaf columns; with row-level trees a document's blocks may
    # span several leaves, so presence is a (num_docs, n_leaves) bool
    # matrix rather than a single column per doc
    doc_in_leaf = np.zeros((corpus.num_docs, len(leaf_ids)), dtype=bool)
    for lid in leaf_ids:
        docs = np.fromiter(tree.leaf_docs[lid], dtype=np.int64,
                           count=len(tree.leaf_docs[lid]))
        doc_in_leaf[docs[docs < corpus.num_docs], leaf_col[lid]] = True
    user_reach_cache: Dict[int, np.ndarray] = {}

    def _user_reach(uid: int) -> np.ndarray:
        r = user_reach_cache.get(uid)
        if r is None:
            ud = world.user_docs(uid)
            idx = np.fromiter(ud, dtype=np.int64, count=len(ud))
            r = doc_in_leaf[idx[idx < corpus.num_docs]].any(axis=0)
            user_reach_cache[uid] = r
        return r

    cent_gap = (np.sqrt(((C[0::2] - C[1::2]) ** 2).sum(1))
                if C.size else np.zeros(0, np.float32))  # ||c0-c1|| per node

    def batch_router(queries: np.ndarray, user_ids: np.ndarray):
        nq = len(queries)
        reach = np.ones((nq, len(leaf_ids)), dtype=bool)
        if C.size and prune_by_centroid:
            q = np.asarray(queries, dtype=np.float32)
            d2 = (-2.0 * (q @ C.T)
                  + np.einsum("kd,kd->k", C, C)[None, :])  # ||q||^2 cancels
            dl, dr = d2[:, 0::2], d2[:, 1::2]
            if tree.route_radius is not None:
                # geometric hyperplane-margin rule (see QDTree.route)
                both = np.abs(dl - dr) <= (
                    2.0 * tree.route_radius * cent_gap[None, :])
            else:
                both = np.abs(dl - dr) <= prune_margin * (
                    dl + dr + 2.0 * np.einsum("qd,qd->q", q, q)[:, None])
            side_ok = (both[:, :, None]
                       | np.stack([dl <= dr, dr < dl], axis=2))
            for lid in leaf_ids:
                col = leaf_col[lid]
                for k, side in leaf_paths[lid]:
                    reach[:, col] &= side_ok[:, k, side]
        for qi in range(nq):
            reach[qi] &= _user_reach(int(user_ids[qi]))
        cols = [np.nonzero(reach[qi])[0] for qi in range(nq)]
        return [tuple(leaf_ids[c] for c in cc) for cc in cols]

    if packed and cfg.index.kind in ("flat", "flat_approx"):
        if arena.quant is not None and arena.metric == "l2":
            from .tiled import TiledSearcher
            searcher = TiledSearcher(
                arena, partition_rows,
                router=lambda uid: vector_router(uid, None), name="qdtree",
                num_roles=world.num_roles,
                scan_group=cfg.search.scan_group,
            )
            searcher.vector_router = vector_router
            searcher.batch_router = batch_router
            searcher.tree = tree
            return searcher
        from .packed import PackedSearcher
        searcher = PackedSearcher(
            arena, partition_rows,
            router=lambda uid: vector_router(uid, None), name="qdtree",
            mode="exact" if cfg.index.kind == "flat" else "approx",
        )
        searcher.vector_router = vector_router
        searcher.batch_router = batch_router
        searcher.tree = tree
        return searcher

    partitions: Dict[int, BuiltPartition] = {
        pid: BuiltPartition(pid=pid, rows=rows,
                            index=make_partition_index(arena, rows, cfg),
                            label=f"qdtree_{pid}")
        for pid, rows in partition_rows.items()
    }
    searcher = PartitionedSearcher(
        arena, partitions, router=lambda uid: vector_router(uid, None),
        name="qdtree",
    )
    searcher.vector_router = vector_router
    searcher.batch_router = batch_router
    searcher.tree = tree
    return searcher
