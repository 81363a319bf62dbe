"""Dataset ingestion and synthesis.

Replaces the reference's Postgres ingestion pipeline
(services/read_dataset_function.py:516 read_and_store_dataset_parallel):
instead of batched SQL INSERTs, loading produces a `Corpus` ready for one
HBM upload. Supported sources mirror the reference:

- sift-128-euclidean HDF5 (reference read_and_store_dataset_parallel
  services/read_dataset_function.py:366) — grouped into synthetic documents
  of SIFT_DOCUMENT_VECTOR_COUNT vectors each (reference :27);
- SIFT10M .mat via h5py (reference :465);
- seeded synthetic corpora for tests and benchmarks (the wikipedia/arxiv
  text+spaCy path has no TPU analog; synthetic embedding corpora stand in).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..core import Corpus

# Reference groups 100 SIFT vectors per synthetic document
# (services/read_dataset_function.py:27 SIFT_DOCUMENT_VECTOR_COUNT).
SIFT_DOCUMENT_VECTOR_COUNT = 100


def _group_into_documents(vectors: np.ndarray, blocks_per_doc: int,
                          interleave: bool = True) -> Corpus:
    """Assign consecutive vectors to documents of `blocks_per_doc` blocks.

    interleave=True strides same-document blocks across the row space
    (row order: all block-0s, then block-1s, ...). Permissions are
    per-document, so without interleaving admissible rows form dense
    100-row runs; group-reduce scan epilogues (ops/pallas_scan_int8) then
    lose ~9 of the top-100 to same-group collisions at 4% selectivity
    (measured), versus ~0.3 with strided layout. Row identity (doc_id,
    block_id) travels with the vector, so results are unaffected.
    """
    n = vectors.shape[0]
    doc_ids = (np.arange(n) // blocks_per_doc).astype(np.int32)
    block_ids = (np.arange(n) % blocks_per_doc).astype(np.int32)
    if interleave and blocks_per_doc > 1:
        perm = np.argsort(block_ids, kind="stable")
        vectors, doc_ids, block_ids = vectors[perm], doc_ids[perm], block_ids[perm]
    return Corpus(vectors=np.ascontiguousarray(vectors, dtype=np.float32),
                  doc_ids=np.ascontiguousarray(doc_ids),
                  block_ids=np.ascontiguousarray(block_ids))


def synthetic_corpus(
    num_docs: int,
    blocks_per_doc: int = 1,
    dim: int = 128,
    seed: int = 0,
    distribution: str = "normal",
) -> Corpus:
    """Seeded synthetic corpus: `num_docs * blocks_per_doc` vectors."""
    rng = np.random.default_rng(seed)
    n = num_docs * blocks_per_doc
    if distribution == "normal":
        vecs = rng.standard_normal((n, dim), dtype=np.float32)
    elif distribution == "uniform":
        vecs = rng.random((n, dim), dtype=np.float32)
    else:
        raise ValueError(f"unknown distribution {distribution}")
    return _group_into_documents(vecs, blocks_per_doc)


def sift_like_corpus(
    num_vectors: int = 1_000_000,
    dim: int = 128,
    blocks_per_doc: int = SIFT_DOCUMENT_VECTOR_COUNT,
    seed: int = 0,
) -> Tuple[Corpus, np.ndarray]:
    """SIFT-shaped synthetic data: non-negative int-valued features in
    [0, 255] drawn from a clustered mixture, mimicking real SIFT's low
    intrinsic dimensionality (~12-16). Returns (corpus, query_pool) where
    query_pool is 10k held-out vectors.

    Clustered structure matters: iid synthetic vectors suffer distance
    concentration that makes ANY graph/IVF index look bad (measured:
    recall@10 0.74 on iid gaussian vs 1.00 on clustered data with the same
    HNSW build). Ground truth is always recomputed exactly, so recall
    numbers stay meaningful either way.
    """
    rng = np.random.default_rng(seed)
    total = num_vectors + 10_000
    n_centers = max(64, min(4096, total // 500))
    centers = rng.gamma(shape=1.2, scale=40.0, size=(n_centers, dim)).astype(np.float32)
    assign = rng.integers(0, n_centers, size=total)
    noise = rng.standard_normal((total, dim)).astype(np.float32) * 18.0
    vecs = np.clip(np.floor(centers[assign] + noise), 0, 255).astype(np.float32)
    corpus = _group_into_documents(vecs[:num_vectors], blocks_per_doc)
    return corpus, vecs[num_vectors:]


def load_sift_hdf5(
    path: str,
    blocks_per_doc: int = SIFT_DOCUMENT_VECTOR_COUNT,
    max_vectors: Optional[int] = None,
) -> Tuple[Corpus, np.ndarray]:
    """Load an ann-benchmarks style HDF5 file (sift-128-euclidean.hdf5):
    datasets 'train' (base vectors) and 'test' (queries). Returns
    (corpus, query_pool)."""
    import h5py  # gated: present in most images; callers fall back to synthetic

    with h5py.File(path, "r") as f:
        train = np.asarray(f["train"], dtype=np.float32)
        test = np.asarray(f["test"], dtype=np.float32)
    if max_vectors is not None:
        train = train[:max_vectors]
    return _group_into_documents(train, blocks_per_doc), test


def load_sift10m(
    path: str,
    blocks_per_doc: int = SIFT_DOCUMENT_VECTOR_COUNT,
    max_vectors: Optional[int] = None,
) -> Tuple[Corpus, np.ndarray]:
    """Load SIFT10M 'fea' matrix from a v7.3 .mat file via h5py (reference
    services/read_dataset_function.py:465 read_and_store_sift10m_dataset).
    Holds out the last 10k rows as the query pool."""
    import h5py

    with h5py.File(path, "r") as f:
        fea = np.asarray(f["fea"], dtype=np.float32)
    if fea.shape[0] < fea.shape[1]:  # MATLAB column-major storage
        fea = fea.T
    if max_vectors is not None:
        fea = fea[: max_vectors + 10_000]
    base, queries = fea[:-10_000], fea[-10_000:]
    return _group_into_documents(base, blocks_per_doc), queries


def cohere_like_corpus(
    num_vectors: int = 1_000_000,
    dim: int = 768,
    blocks_per_doc: int = SIFT_DOCUMENT_VECTOR_COUNT,
    seed: int = 0,
) -> Tuple[Corpus, np.ndarray]:
    """Cohere wikipedia-22-12-shaped synthetic data: unit-normalized dense
    embeddings (768-d), standing in for the reference's wikipedia dataset
    (services/read_dataset_function.py wikipedia path) under zero egress."""
    rng = np.random.default_rng(seed)
    total = num_vectors + 10_000
    vecs = rng.standard_normal((total, dim), dtype=np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    corpus = _group_into_documents(vecs[:num_vectors], blocks_per_doc)
    return corpus, vecs[num_vectors:]


def load_embedding_dump(
    path: str,
    blocks_per_doc: int = SIFT_DOCUMENT_VECTOR_COUNT,
    max_vectors: Optional[int] = None,
    query_holdout: int = 10_000,
) -> Tuple[Corpus, np.ndarray]:
    """Load a real embedding-dump corpus (cohere / wikipedia-22-12 shapes)
    from .npy, .npz, .parquet, or .hdf5 — the analog of the reference's
    wikipedia ingestion (services/read_dataset_function.py:516
    read_and_store_wikipedia_dataset, which streams the Cohere/wikipedia
    embedding column). Queries come from `<stem>_queries.npy` when present,
    else the last `query_holdout` rows are held out."""
    stem, ext = os.path.splitext(path)
    ext = ext.lower()
    if ext == ".npy":
        vecs = np.load(path, mmap_mode="r")
        vecs = np.asarray(vecs, dtype=np.float32)
    elif ext == ".npz":
        with np.load(path) as z:
            key = "embeddings" if "embeddings" in z.files else z.files[0]
            vecs = np.asarray(z[key], dtype=np.float32)
    elif ext == ".parquet":
        import pandas as pd  # gated: parquet needs pandas+pyarrow

        df = pd.read_parquet(path)
        col = next(c for c in ("emb", "embedding", "embeddings", "vector")
                   if c in df.columns)
        vecs = np.asarray(np.stack(df[col].to_numpy()), dtype=np.float32)
    elif ext in (".hdf5", ".h5"):
        return load_sift_hdf5(path, blocks_per_doc=blocks_per_doc,
                              max_vectors=max_vectors)
    else:
        raise ValueError(f"unsupported embedding dump format: {path}")

    qpath = stem + "_queries.npy"
    if os.path.isfile(qpath):
        queries = np.asarray(np.load(qpath), dtype=np.float32)
        base = vecs
    else:
        holdout = min(query_holdout, max(len(vecs) // 10, 1))
        base, queries = vecs[:-holdout], vecs[-holdout:]
    if max_vectors is not None:
        base = base[:max_vectors]
    return _group_into_documents(np.ascontiguousarray(base),
                                 blocks_per_doc), queries


def load_arxiv_categories(path: str,
                          max_docs: Optional[int] = None) -> np.ndarray:
    """arXiv metadata (JSON-lines, kaggle arxiv-metadata-oai-snapshot.json)
    -> (num_docs,) int category ids from each paper's PRIMARY category —
    the real-file feed for ArxivBusinessRBACGenerator (the reference
    builds its business hierarchy from the same file,
    services/rbac_generator/arxiv_generator_business.py:20)."""
    import json as _json

    cats: list = []
    cat_ids: dict = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = _json.loads(line)
            primary = str(rec.get("categories", "unknown")).split()[0]
            cats.append(cat_ids.setdefault(primary, len(cat_ids)))
            if max_docs is not None and len(cats) >= max_docs:
                break
    return np.asarray(cats, dtype=np.int64)


def resolve_dataset(
    name: str,
    dataset_path: str = "",
    num_vectors: int = 1_000_000,
    seed: int = 0,
) -> Tuple[Corpus, np.ndarray]:
    """Load a named dataset, falling back to a synthetic twin when the file
    is absent (zero-egress environments)."""
    if name in ("sift", "sift1m"):
        for cand in (
            os.path.join(dataset_path, "sift-128-euclidean.hdf5"),
            dataset_path,
        ):
            if cand and os.path.isfile(cand):
                return load_sift_hdf5(cand, max_vectors=num_vectors)
        return sift_like_corpus(num_vectors=num_vectors, seed=seed)
    if name == "sift10m":
        cand = os.path.join(dataset_path, "SIFT10Mfeatures.mat")
        if os.path.isfile(cand):
            return load_sift10m(cand, max_vectors=num_vectors)
        return sift_like_corpus(num_vectors=num_vectors, seed=seed)
    if name in ("cohere", "wikipedia"):
        candidates = [dataset_path] if os.path.isfile(dataset_path) else [
            os.path.join(dataset_path, f"{name}{ext}")
            for ext in (".npy", ".npz", ".parquet", ".hdf5")
        ] + [os.path.join(dataset_path, "wikipedia-22-12-en-embeddings.parquet")]
        for cand in candidates:
            if cand and os.path.isfile(cand):
                return load_embedding_dump(cand, max_vectors=num_vectors)
        return cohere_like_corpus(num_vectors=num_vectors, seed=seed)
    if name == "synthetic":
        corpus = synthetic_corpus(num_docs=num_vectors // SIFT_DOCUMENT_VECTOR_COUNT,
                                  blocks_per_doc=SIFT_DOCUMENT_VECTOR_COUNT, seed=seed)
        rng = np.random.default_rng(seed + 1)
        return corpus, rng.standard_normal((10_000, corpus.dim)).astype(np.float32)
    raise ValueError(f"unknown dataset {name}")
