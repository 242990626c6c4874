"""Embedder interface (D9): determinism + doc/query asymmetry."""

import math

import pyspark.sql.functions as F
import pytest

from vechord_spark.functions.embed import HashEmbedder, _hash_vector


def test_hash_vector_deterministic_unit_norm():
    a = _hash_vector("hello world", 32, "doc")
    b = _hash_vector("hello world", 32, "doc")
    assert a == b
    assert abs(sum(x * x for x in a) - 1.0) < 1e-5


def test_doc_query_asymmetry():
    # reference task types RETRIEVAL_DOCUMENT vs RETRIEVAL_QUERY
    # (vechord/embedding.py:146,158) -> different vectors for same text
    assert _hash_vector("x", 8, "doc") != _hash_vector("x", 8, "query")


def test_embed_documents_column(docs):
    e = HashEmbedder(dim=16)
    out = docs.limit(5).select(
        "doc_id", e.embed_documents(F.col("text")).alias("vec")
    ).collect()
    assert all(len(r.vec) == 16 for r in out)
    again = docs.limit(5).select(e.embed_documents(F.col("text")).alias("vec")).collect()
    assert [r.vec for r in again] == [r.vec for r in out]


def test_embed_query_matches_query_task():
    e = HashEmbedder(dim=8)
    q = e.embed_query("spark")
    assert q == _hash_vector("spark", 8, "query")
    assert abs(math.fsum(x * x for x in q) - 1.0) < 1e-5


def test_multivector_shape(spark):
    e = HashEmbedder(dim=8)
    df = spark.createDataFrame([("one two three",), ("",)], "text string")
    rows = df.select(e.embed_multivector(F.col("text")).alias("mv")).collect()
    assert len(rows[0].mv) == 3 and all(len(v) == 8 for v in rows[0].mv)
    assert len(rows[1].mv) == 1  # empty text -> one fallback vector


def test_sparse_embedding_sums_colliding_indices(spark):
    """Tokens hashing to the same dimension must SUM their weights in
    the stored struct — identical to the search path's per-(doc, idx)
    SUM (ADVICE r1). Verified with a tiny dim to force collisions."""
    import math

    from pyspark.sql import functions as F

    from vechord_spark.functions.embed import sparse_embedding

    df = spark.createDataFrame(
        [("alpha beta gamma delta alpha",)], "body string"
    ).select(sparse_embedding(F.col("body"), dim=2).alias("sv"))
    row = df.first().sv
    # indices strictly increasing -> one entry per dimension
    assert list(row.indices) == sorted(set(row.indices))
    # total mass equals sum over tokens of ln(1+tf)
    expect = math.log1p(2) + 3 * math.log1p(1)  # alpha x2, 3 singles
    assert sum(row.values) == pytest.approx(expect, abs=1e-5)
