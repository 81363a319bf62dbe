from .datasets import (
    synthetic_corpus,
    sift_like_corpus,
    load_sift_hdf5,
    load_sift10m,
    resolve_dataset,
)

__all__ = [
    "synthetic_corpus",
    "sift_like_corpus",
    "load_sift_hdf5",
    "load_sift10m",
    "resolve_dataset",
]
