"""Document embedding stage (SURVEY A6 interface).

The reference's ELMo embedder (``ehr.py:486-497`` ``set_elmo_embedder``;
weights unshippable, so the heavy backend stays an import-gated registry
slot) is generalized to an ``embedder`` registry kind: any callable class
mapping a batch of texts to fixed-dim vectors can back this stage.

The shipped default is FEATURE HASHING (the "hashing trick"): token t
contributes ``sign(t)`` to dimension ``h(t) mod D``, accumulated as
INTEGER counts — order-independent by construction, so the result is
identical at any block structure/parallelism — then L2-normalized in
float64. Deterministic, vocabulary-free, and a legitimate cheap text
embedding (same family as Vowpal Wabbit / sklearn HashingVectorizer).

Scale shape: zero-shuffle ``map_batches`` with the embedder constructed
once per actor; per-batch cost is one md5 per DISTINCT token (per-process
cache) + one integer scatter per token.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pyarrow as pa

import ray.data


_EMBEDDER_CACHE: dict = {}


class HashEmbedder:
    """Feature-hashing document embedder (callable class for actor pools)."""

    def __init__(self, dim: int = 64, lowercase: bool = True):
        self.dim = dim
        self.lowercase = lowercase
        self._cache: dict = {}

    def _slot(self, tok: str):
        s = self._cache.get(tok)
        if s is None:
            h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)
            s = (h % self.dim, 1 if (h >> 8) & 1 else -1)
            if len(self._cache) >= 1_000_000:  # bound per-process memory at
                self._cache.clear()  # web-scale vocabularies (review finding)
            self._cache[tok] = s
        return s

    def counts(self, text: str) -> np.ndarray:
        """Integer hashed-count vector (order-independent exact sums)."""
        c = np.zeros(self.dim, dtype=np.int64)
        if text:
            if self.lowercase:
                text = text.lower()
            for tok in text.split():
                i, sgn = self._slot(tok)
                c[i] += sgn
        return c

    def __call__(self, texts: List[str]) -> np.ndarray:
        if not texts:  # empty block from an upstream filter
            return np.zeros((0, self.dim), dtype=np.float64)
        m = np.stack([self.counts(t or "") for t in texts]).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n


def embed_documents(
    docs: "ray.data.Dataset",
    embedder_name: str = "hash",
    text_col: str = "text",
    id_col: str = "doc_id",
    **embedder_kwargs,
) -> "ray.data.Dataset":
    """Attach an ``embedding`` (list<double>) column — zero-shuffle."""
    from .. import registry

    cls = registry.get("embedder", embedder_name)
    key = (embedder_name, tuple(sorted(embedder_kwargs.items())))

    # task pool, not an actor pool: HashEmbedder setup is trivial, and an
    # autoscaling actor pool pays its spawn latency on EVERY dataset
    # execution (measured ~5s/query at sf0.01). The embedder instance is
    # still constructed once per worker PROCESS via this cache — an
    # expensive backend (ELMo) should flip to map_batches(cls,
    # concurrency=N) instead, which is a one-line change at the call site.
    def stage(t: pa.Table) -> pa.Table:
        emb = _EMBEDDER_CACHE.get(key)
        if emb is None:
            emb = cls(**dict(embedder_kwargs))
            _EMBEDDER_CACHE[key] = emb
        vecs = emb(t[text_col].to_pylist())
        return pa.table(
            {
                id_col: t[id_col],
                "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )

    return docs.map_batches(stage, batch_format="pyarrow")
