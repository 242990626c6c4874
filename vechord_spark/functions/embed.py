"""Embedder interface + the deterministic local embedder.

The reference ships five dense embedders (Spacy local, Gemini, Jina,
Voyage, OpenAI — vechord/embedding.py:79-410) that share one critical
API property: documents and queries embed DIFFERENTLY (task types
``RETRIEVAL_DOCUMENT`` vs ``RETRIEVAL_QUERY``, embedding.py:146,158).
The Spark interface preserves that asymmetry: ``embed_documents``
(DataFrame column -> vector column, Arrow-batched) and ``embed_query``
(one string -> one vector, driver-side).

Network models are not available in this environment; the default
implementation is the deterministic HashEmbedder (sha256 -> seeded
PRNG -> unit vector), which makes every pipeline output hash-stable —
exactly what the correctness gate needs (FIXTURES.md requires a
deterministic seeded embedder). External providers live in
providers.py as clearly-marked stubs with the same interface.
"""

from __future__ import annotations

import hashlib
from typing import Protocol, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import types as T


class Embedder(Protocol):
    """The engine-wide embedding interface (doc/query asymmetric)."""

    dim: int

    def embed_documents(self, text: Column) -> Column: ...

    def embed_query(self, text: str) -> list[float]: ...


def _hash_vector(text: str, dim: int, task: str) -> list[float]:
    """sha256(task || text) seeds a PRNG -> unit-norm float vector.
    Deterministic across processes, executors, and sessions."""
    digest = hashlib.sha256(f"{task}:{text}".encode()).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    v = rng.standard_normal(dim)
    n = float(np.linalg.norm(v))
    return [float(x) for x in (v / n if n else v)]


class HashEmbedder:
    """Deterministic local embedder (the test-path D9 implementation)."""

    def __init__(self, dim: int = 64) -> None:
        self.dim = dim

    def embed_documents(self, text: Column) -> Column:
        from pyspark.sql.functions import pandas_udf

        dim = self.dim

        @pandas_udf(T.ArrayType(T.FloatType(), containsNull=False))
        def _embed(texts: pd.Series) -> pd.Series:
            return texts.map(lambda t: _hash_vector(t or "", dim, "doc"))

        return _embed(text)

    def embed_query(self, text: str) -> list[float]:
        return _hash_vector(text, self.dim, "query")

    def embed_multivector(self, text: Column) -> Column:
        """Late-interaction shape: one vector per whitespace token
        (mirrors the reference's multi-vector fixtures,
        tests/test_table.py:51-55)."""
        from pyspark.sql.functions import pandas_udf

        dim = self.dim

        @pandas_udf(T.ArrayType(T.ArrayType(T.FloatType(), containsNull=False)))
        def _embed(texts: pd.Series) -> pd.Series:
            return texts.map(
                lambda t: [_hash_vector(tok, dim, "doc") for tok in (t or "").split()]
                or [_hash_vector("", dim, "doc")]
            )

        return _embed(text)
