"""Sparse embedding + inverted-index retrieval (D10)."""

import math

import pyspark.sql.functions as F

from vechord_spark.functions.embed import (
    SPARSE_DIM,
    sparse_embedding,
    sparse_query_vector,
)
from vechord_spark.operators.sparse import sparse_topk


def test_sparse_embedding_struct_shape(spark):
    df = spark.createDataFrame([("spark spark sql",)], "text string")
    row = df.select(sparse_embedding(F.col("text")).alias("s")).collect()[0].s
    assert len(row.indices) == len(row.values) == 2  # {spark, sql}
    assert list(row.indices) == sorted(row.indices)  # canonical order
    assert all(0 <= i < SPARSE_DIM for i in row.indices)
    # tf weighting: 'spark' appears twice -> ln(3); 'sql' once -> ln(2)
    assert sorted(round(v, 5) for v in row.values) == [
        round(math.log(2), 5),
        round(math.log(3), 5),
    ]


def test_query_vector_matches_column_weights():
    qv = sparse_query_vector("spark spark sql")
    assert len(qv) == 2
    assert sorted(round(v, 10) for v in qv.values()) == [
        round(math.log(2), 10),
        round(math.log(3), 10),
    ]


def test_sparse_topk_ranks_matching_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "spark engine spark engine"),
            (2, "spark engine"),
            (3, "completely unrelated words"),
        ],
        "doc_id long, text string",
    )
    hits = sparse_topk(df, "doc_id", "text", "spark engine", k=3).collect()
    got = [r.doc_id for r in hits]
    assert got[0] == 1  # higher tf wins
    assert 3 not in got  # no shared dimensions -> no score
    assert [r.rank for r in hits] == list(range(1, len(hits) + 1))


def test_sparse_topk_empty_query(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert sparse_topk(df, "doc_id", "text", "!!!").count() == 0


def test_sparse_empty_query_schema_stable(spark):
    from vechord_spark.operators.sparse import sparse_topk

    df = spark.createDataFrame(
        [("u1", "alpha beta"), ("u2", "gamma")], "uid string, body string"
    )
    full = sparse_topk(df, "uid", "body", "alpha", k=5)
    empty = sparse_topk(df, "uid", "body", "???", k=5)
    assert empty.schema == full.schema
    assert empty.count() == 0
