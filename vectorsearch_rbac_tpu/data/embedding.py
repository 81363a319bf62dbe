"""Text -> vector embedding service + text-corpus ingestion.

Replaces the reference's embedding service and text-dataset ingestion
(reference services/embedding_service.py:5 generate_embedding — spaCy
en_core_web_md 300-d; services/read_dataset_function.py:516
read_and_store_dataset_parallel — wikipedia/arxiv text to documentblocks).

Two providers behind one protocol:

- `HashingEmbedder` — deterministic feature-hashing embeddings (token
  n-gram hashing with signed buckets, L2-normalized). Zero external
  weights, fully reproducible, so the whole text path is testable under
  zero egress. Semantically weak by construction, but exercises the real
  pipeline: tokenize -> embed -> chunk into blocks -> Corpus.
- `TransformersEmbedder` — mean-pooled hidden states from any local
  HuggingFace checkpoint (transformers is baked into the image; weights
  must already be on disk — nothing is downloaded).

Ingestion mirrors the reference's shape: each document's text is split
into fixed-size word chunks ("blocks"), one vector per block, grouped
per document (reference SIFT_DOCUMENT_VECTOR_COUNT grouping inverted:
here blocks are real chunks of one text).
"""

from __future__ import annotations

import hashlib
import re
from typing import List, Optional, Protocol, Sequence, Tuple

import numpy as np

from ..core import Corpus
from ..utils.logger import get_logger

logger = get_logger("data.embedding")

_TOKEN_RE = re.compile(r"[a-z0-9]+")


class Embedder(Protocol):
    """The embedding-service contract (reference embedding_service.py:5)."""

    dim: int

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        """(len(texts), dim) float32, L2-normalized rows."""
        ...


class HashingEmbedder:
    """Signed feature hashing of word uni+bigrams into `dim` buckets."""

    def __init__(self, dim: int = 300, seed: int = 0):
        self.dim = dim
        self.seed = seed

    def _bucket(self, token: str) -> Tuple[int, float]:
        h = hashlib.blake2b(f"{self.seed}:{token}".encode(),
                            digest_size=8).digest()
        v = int.from_bytes(h, "little")
        return v % self.dim, 1.0 if (v >> 63) & 1 else -1.0

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            toks = _TOKEN_RE.findall(t.lower())
            for j, tok in enumerate(toks):
                b, s = self._bucket(tok)
                out[i, b] += s
                if j + 1 < len(toks):
                    b2, s2 = self._bucket(tok + "_" + toks[j + 1])
                    out[i, b2] += 0.5 * s2
        n = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(n, 1e-12)


class TransformersEmbedder:
    """Mean-pooled last-hidden-state embeddings from a LOCAL HF checkpoint.

    No downloads: `local_files_only=True`. The reference's spaCy service is
    a fixed 300-d model; this accepts any cached encoder."""

    def __init__(self, model_path: str, batch_size: int = 32,
                 max_length: int = 256):
        from transformers import AutoModel, AutoTokenizer  # lazy

        self.tokenizer = AutoTokenizer.from_pretrained(
            model_path, local_files_only=True)
        self.model = AutoModel.from_pretrained(
            model_path, local_files_only=True)
        self.model.eval()
        self.dim = int(self.model.config.hidden_size)
        self.batch_size = batch_size
        self.max_length = max_length

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        import torch

        outs: List[np.ndarray] = []
        with torch.no_grad():
            for s in range(0, len(texts), self.batch_size):
                batch = list(texts[s:s + self.batch_size])
                enc = self.tokenizer(batch, padding=True, truncation=True,
                                     max_length=self.max_length,
                                     return_tensors="pt")
                hidden = self.model(**enc).last_hidden_state
                mask = enc["attention_mask"].unsqueeze(-1).float()
                pooled = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1)
                outs.append(pooled.cpu().numpy().astype(np.float32))
        vecs = np.concatenate(outs, axis=0)
        n = np.linalg.norm(vecs, axis=1, keepdims=True)
        return vecs / np.maximum(n, 1e-12)


def _chunk_words(text: str, words_per_block: int) -> List[str]:
    words = text.split()
    if not words:
        return [""]
    return [" ".join(words[i:i + words_per_block])
            for i in range(0, len(words), words_per_block)]


def ingest_text_corpus(
    documents: Sequence[str],
    embedder: Optional[Embedder] = None,
    words_per_block: int = 64,
    max_blocks_per_doc: int = 100,
) -> Corpus:
    """Text documents -> Corpus: chunk each document into word blocks,
    embed every block, keep the doc->rows grouping (reference
    read_and_store_dataset_parallel + store_document_block_duplication_bulk,
    read_dataset_function.py:516,:75 — documentblocks rows become arena
    rows; the SQL bulk INSERT becomes array concatenation)."""
    embedder = embedder or HashingEmbedder()
    blocks: List[str] = []
    doc_ids: List[int] = []
    block_ids: List[int] = []
    for di, text in enumerate(documents):
        ch = _chunk_words(text, words_per_block)[:max_blocks_per_doc]
        blocks.extend(ch)
        doc_ids.extend([di] * len(ch))
        block_ids.extend(range(len(ch)))
    vecs = embedder.embed(blocks)
    logger.info("ingested %d docs -> %d blocks (%d-d)",
                len(documents), len(blocks), embedder.dim)
    return Corpus(
        vectors=np.ascontiguousarray(vecs, dtype=np.float32),
        doc_ids=np.asarray(doc_ids, dtype=np.int32),
        block_ids=np.asarray(block_ids, dtype=np.int32),
    )
