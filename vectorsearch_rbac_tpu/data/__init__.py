from .datasets import (
    synthetic_corpus,
    sift_like_corpus,
    load_sift_hdf5,
    load_sift10m,
    load_embedding_dump,
    load_arxiv_categories,
    cohere_like_corpus,
    resolve_dataset,
)
from .embedding import (
    Embedder,
    HashingEmbedder,
    TransformersEmbedder,
    ingest_text_corpus,
)

__all__ = [
    "synthetic_corpus",
    "sift_like_corpus",
    "load_sift_hdf5",
    "load_sift10m",
    "load_embedding_dump",
    "load_arxiv_categories",
    "cohere_like_corpus",
    "resolve_dataset",
    "Embedder",
    "HashingEmbedder",
    "TransformersEmbedder",
    "ingest_text_corpus",
]
