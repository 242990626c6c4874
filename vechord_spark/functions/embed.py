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


# ---------------------------------------------------------------------------
# sparse embeddings (D10 — reference SparseEmbedding, the Splade++ shape)
# ---------------------------------------------------------------------------

# Splade++ vocabulary size (reference vechord/embedding.py:413-441,
# model/internal.py:43-46 SparseEmbedding{dim, indices, values})
SPARSE_DIM = 30522


def _term_index(tok, dim: int):
    """Deterministic term -> dimension index: first 7 md5 hex chars mod
    ``dim`` (cross-engine parity like every other engine hash)."""
    from pyspark.sql import functions as F

    return (
        F.conv(F.substring(F.md5(tok), 1, 7), 16, 10).cast("bigint") % dim
    ).cast("int")


def sparse_embedding(text, dim: int = SPARSE_DIM):
    """Text column -> ``struct(indices array<int>, values array<float>)``.

    A real Splade++ model scores vocabulary terms with a transformer;
    this engine-native stand-in hashes tokens to dimensions and weights
    them ln(1+tf) — the classic sparse lexical weighting — entirely in
    whole-stage codegen. The stored shape matches the reference's
    SparseEmbedding struct (never persisted there; first-class column
    here).
    """
    from pyspark.sql import functions as F

    from vechord_spark.functions.text import tokenize

    toks = tokenize(text)
    uniq = F.array_sort(F.array_distinct(toks))
    entries = F.transform(
        uniq,
        lambda t: F.struct(
            _term_index(t, dim).alias("idx"),
            F.log(F.lit(1.0) + F.size(F.filter(toks, lambda x: x == t)))
            .cast("float")
            .alias("val"),
        ),
    )
    # sort by dimension index so the representation is canonical
    entries = F.array_sort(entries)
    # canonical form: one entry per dimension — tokens hashing to the
    # same index SUM their weights, matching the search path's
    # per-(doc, idx) SUM semantics (operators/sparse.py). Colliding
    # entries are adjacent after the sort; the merge branch (O(u²) in
    # unique tokens) only evaluates for rows that actually collide.
    idxs = F.transform(entries, lambda e: e["idx"])
    has_dup = F.size(idxs) != F.size(F.array_distinct(idxs))
    merged_idxs = F.array_distinct(idxs)
    merged = F.transform(
        merged_idxs,
        lambda i: F.struct(
            i.alias("idx"),
            F.aggregate(
                F.filter(entries, lambda e: e["idx"] == i),
                F.lit(0.0),
                lambda acc, e: acc + e["val"],
            )
            .cast("float")
            .alias("val"),
        ),
    )
    entries = F.when(has_dup, merged).otherwise(entries)
    return F.struct(
        F.transform(entries, lambda e: e["idx"]).alias("indices"),
        F.transform(entries, lambda e: e["val"]).alias("values"),
    )


def sparse_query_vector(query: str, dim: int = SPARSE_DIM) -> dict[int, float]:
    """Driver-side sparse embedding of one query string (same hash +
    ln(1+tf) weighting as the column form)."""
    import hashlib
    import math
    import re
    from collections import Counter

    toks = [t for t in re.split("[^a-z0-9]+", query.lower()) if t]
    tf = Counter(toks)
    out: dict[int, float] = {}
    for t, n in tf.items():
        idx = int(hashlib.md5(t.encode()).hexdigest()[:7], 16) % dim
        out[idx] = out.get(idx, 0.0) + math.log1p(n)
    return out
