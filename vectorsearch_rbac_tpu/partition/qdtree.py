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
              prune_margin: float = 0.25) -> List[int]:
        """Leaves reachable for a user with `accessible` docs, pruned along
        centroid predicates by the query vector's side.

        prune_margin: a query whose two centroid distances are within
        `margin * (dl + dr)` of each other descends BOTH sides — strict
        nearer-side pruning (margin 0) loses the true neighbor whenever it
        sits just across the boundary (measured recall@10 0.824 at 1M;
        margin 0.25 restores >=0.95 while still pruning far subtrees)."""
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
                if abs(dl - dr) > prune_margin * (dl + dr):
                    walk(node.left if dl <= dr else node.right)
                    return
            walk(node.left)
            walk(node.right)

        walk(self.root)
        return out


def _split_score(
    left: Set[int], right: Set[int], query_docsets: Sequence[FrozenSet[int]]
) -> float:
    """Expected visited volume over the sampled workload, tie-broken by
    balance (reference find_best_split: query-overlap cost then balance)."""
    cost = 0
    for qd in query_docsets:
        if qd & left:
            cost += len(left)
        if qd & right:
            cost += len(right)
    balance = abs(len(left) - len(right)) / max(len(left) + len(right), 1)
    return cost * (1.0 + 0.1 * balance)


def build_qd_tree(
    corpus: Corpus,
    world: RBACWorld,
    query_docsets: Sequence[FrozenSet[int]],
    min_leaf: int = 64,
    max_depth: int = 8,
    n_candidate_roles: int = 16,
    seed: int = 0,
) -> QDTree:
    rng = np.random.default_rng(seed)
    # document representative vectors: mean of the doc's blocks
    offs = corpus.doc_row_offsets
    order = corpus.doc_row_index
    doc_means = np.zeros((corpus.num_docs, corpus.dim), dtype=np.float32)
    for doc in range(corpus.num_docs):
        rowsd = order[offs[doc]:offs[doc + 1]]
        if len(rowsd):
            doc_means[doc] = corpus.vectors[rowsd].mean(axis=0)

    leaf_docs: List[FrozenSet[int]] = []

    def split(docs: Set[int], depth: int) -> QDNode:
        if len(docs) <= min_leaf or depth >= max_depth:
            return _leaf(docs)

        best: Tuple[float, Optional[tuple], Set[int], Set[int]] = (
            float("inf"), None, set(), set(),
        )
        # role predicates: score EVERY role that actually splits this node
        # (sampling only above the candidate cap) — the reference's
        # find_best_split scores the full candidate list (HQI/qd_tree.py:
        # 420-505); round-1 sampled 16 shuffled roles, which regularly
        # missed the workload-aligned split
        roles = list(world.role_to_docs.keys())
        if len(roles) > 4 * n_candidate_roles:
            rng.shuffle(roles)
            roles = roles[: 4 * n_candidate_roles]
        for r in roles:
            rdocs = world.role_to_docs[r]
            left = docs & rdocs
            if not left or left == docs:
                continue
            right = docs - left
            sc = _split_score(left, right, query_docsets)
            if sc < best[0]:
                best = (sc, ("role", r), left, right)

        # centroid predicate: 2-means on doc means, multiple restarts
        dlist = np.fromiter(docs, dtype=np.int64, count=len(docs))
        pts = doc_means[dlist]
        if len(dlist) >= 4:
            for _restart in range(3):
                c = pts[rng.choice(len(dlist), 2, replace=False)].copy()
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
                a = d0 <= d1
                if 0 < a.sum() < len(a):
                    left = set(dlist[a].tolist())
                    right = docs - left
                    sc = _split_score(left, right, query_docsets)
                    if sc < best[0]:
                        best = (sc, ("centroid", c[0].copy(), c[1].copy()),
                                left, right)

        if best[1] is None:
            return _leaf(docs)
        _, pred, left, right = best
        node = QDNode(pred=pred)
        node.left = split(left, depth + 1)
        node.right = split(right, depth + 1)
        return node

    def _leaf(docs: Set[int]) -> QDNode:
        leaf = QDNode(leaf_id=len(leaf_docs), docs=frozenset(docs))
        leaf_docs.append(frozenset(docs))
        return leaf

    root = split(set(range(corpus.num_docs)), 0)
    logger.info("qd-tree: %d leaves", len(leaf_docs))
    return QDTree(root=root, leaf_docs=leaf_docs)


def validate_qdtree_partitions(tree: QDTree, world: RBACWorld) -> None:
    """Leaves must partition the document space exactly (reference
    controller/baseline/HQI/debug/validate_qdtree_partitions.py)."""
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
    max_depth: int = 8,
    prune_by_centroid: bool = True,   # HQI routes one side at centroid
                                      # predicates (reference
                                      # qd_tree_search_statistics_sql)
    prune_margin: float = 0.25,       # both-sides margin (QDTree.route)
    tree: Optional[QDTree] = None,
    packed: bool = True,
) -> PartitionedSearcher:
    if tree is None:
        if workload is not None:
            users = np.unique(workload.user_ids)[:64]
            query_docsets = [world.user_docs(int(u)) for u in users]
        else:
            query_docsets = [world.comb_docs(c) for c in world.combs[:64]]
        tree = build_qd_tree(corpus, world, query_docsets,
                             min_leaf=min_leaf, max_depth=max_depth,
                             seed=cfg.seed)
    validate_qdtree_partitions(tree, world)

    partition_rows: Dict[int, np.ndarray] = {}
    for pid, docs in enumerate(tree.leaf_docs):
        rows = corpus.rows_for_docs(np.fromiter(docs, dtype=np.int64, count=len(docs)))
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
    # doc -> leaf column (leaves partition the doc set disjointly)
    doc_leaf = np.full(corpus.num_docs, -1, dtype=np.int32)
    for lid in leaf_ids:
        docs = np.fromiter(tree.leaf_docs[lid], dtype=np.int64,
                           count=len(tree.leaf_docs[lid]))
        doc_leaf[docs[docs < corpus.num_docs]] = leaf_col[lid]
    user_reach_cache: Dict[int, np.ndarray] = {}

    def _user_reach(uid: int) -> np.ndarray:
        r = user_reach_cache.get(uid)
        if r is None:
            ud = world.user_docs(uid)
            cols = doc_leaf[np.fromiter(ud, dtype=np.int64, count=len(ud))]
            r = np.zeros(len(leaf_ids), dtype=bool)
            r[cols[cols >= 0]] = True
            user_reach_cache[uid] = r
        return r

    def batch_router(queries: np.ndarray, user_ids: np.ndarray):
        nq = len(queries)
        reach = np.ones((nq, len(leaf_ids)), dtype=bool)
        if C.size and prune_by_centroid:
            q = np.asarray(queries, dtype=np.float32)
            d2 = (-2.0 * (q @ C.T)
                  + np.einsum("kd,kd->k", C, C)[None, :])  # ||q||^2 cancels
            dl, dr = d2[:, 0::2], d2[:, 1::2]
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
