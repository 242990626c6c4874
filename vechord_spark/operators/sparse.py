"""Sparse-vector retrieval (D10) — inverted-index dot product.

The reference produces Splade++ sparse embeddings
(vechord/embedding.py:413-441) into a ``SparseEmbedding{dim, indices,
values}`` struct (vechord/model/internal.py:43-46) but never stores or
searches them — no sparse column type exists there (SURVEY §1.2). This
engine makes them first-class: storage as a struct column
(functions/embed.sparse_embedding) and search as the classic inverted
postings plan:

    token -> dim index (md5 mod dim) -> per-(doc, term) ln(1+tf)
          -> sum per (doc, index)      [collision semantics: SUM]
          -> prune to the query's indices BEFORE any shuffle
          -> join broadcast(query weights) -> per-doc dot -> top-k

The prune-first shape is what survives 100 TB: only postings for the
query's ~handful of dimensions ever reach an exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vechord_spark.functions.embed import SPARSE_DIM, _term_index, sparse_query_vector
from vechord_spark.functions.text import tokenize


def build_sparse_postings(
    df: DataFrame,
    doc_id: str,
    text_col: str,
    dim: int = SPARSE_DIM,
) -> DataFrame:
    """The PERSISTED inverted-postings layout ``(idx, doc_id, v)`` —
    build-once CREATE INDEX work (the bm25 postings twin for sparse
    vectors): per (doc, term) ``ln(1 + tf)``, summed per (doc, dim)
    across hash collisions. Query-time cost then never re-tokenizes
    the corpus; write the frame range-clustered on ``idx`` (e.g.
    ``repartitionByRange(n, 'idx').sortWithinPartitions('idx')``) so a
    query's handful of dimensions skip whole files on parquet footer
    min/max alone."""
    tokens = df.select(
        F.col(doc_id).alias("doc_id"), F.explode(tokenize(text_col)).alias("tok")
    ).withColumn("idx", _term_index(F.col("tok"), dim))
    return (
        tokens.groupBy("doc_id", "tok", "idx")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("v", F.log(F.lit(1.0) + F.col("tf")))
        .groupBy("idx", "doc_id")
        .agg(F.sum("v").alias("v"))
    )


def sparse_topk_postings(
    postings: DataFrame,
    query: str,
    dim: int = SPARSE_DIM,
    k: int = 10,
) -> DataFrame:
    """Top-k ``(doc_id, score, rank)`` against a PERSISTED postings
    layout (:func:`build_sparse_postings`): prune to the query's
    dimensions (an ``idx IN (...)`` the parquet scan pushes down —
    with a range-clustered layout that is file/row-group SKIPPING, not
    just filtering), broadcast the query weights, one per-doc sum.
    Steady-state query cost is O(matched postings), independent of
    corpus text size."""
    from vechord_spark.operators.topk import ranked_topk

    spark = postings.sparkSession
    qv = sparse_query_vector(query, dim)
    if not qv:
        return (
            postings.select("doc_id")
            .limit(0)
            .withColumn("score", F.lit(None).cast("double"))
            .withColumn("rank", F.lit(0))
        )
    qdf = spark.createDataFrame(
        [(i, w) for i, w in qv.items()], "idx int, qw double"
    )
    scored = (
        postings.filter(F.col("idx").isin([int(i) for i in qv]))
        .join(F.broadcast(qdf), "idx")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("v") * F.col("qw")), 6).alias("score"))
    )
    return ranked_topk(scored, [F.col("score").desc(), F.col("doc_id").asc()], k)


def sparse_topk_postings_batch(
    postings: DataFrame,
    queries,
    dim: int = SPARSE_DIM,
    k: int = 10,
) -> DataFrame:
    """Batched sparse retrieval: top-k for EVERY query string from ONE
    scan of the persisted postings — the sparse member of the batch
    family (IvfIndex.search_batch / Bm25Index.topk_batch). The union
    of all queries' dimensions drives the pushed ``idx IN`` filter
    (the range-clustered layout skips files on footer stats), a
    broadcast ``(query_id, idx, qw)`` table fans each matched posting
    to exactly the queries weighting its dimension, one per-query
    window takes top-k below the exchange. N ``sparse_topk_postings``
    calls would re-open the postings N times; the batch pays the scan
    once. Per-query results identical to the single path (same
    rounding, same score-desc / doc-asc tie order); queries with no
    dimensions contribute no rows. Returns
    ``(query_id, doc_id, score, rank)`` ordered by (query_id, rank)."""
    from pyspark.sql import Window

    spark = postings.sparkSession
    pairs = [
        (qi, int(i), float(w))
        for qi, q in enumerate(queries)
        for i, w in sparse_query_vector(q, dim).items()
    ]
    if not pairs:
        return (
            postings.select("doc_id")
            .limit(0)
            .withColumn("query_id", F.lit(0))
            .withColumn("score", F.lit(None).cast("double"))
            .withColumn("rank", F.lit(0))
            .select("query_id", "doc_id", "score", "rank")
        )
    qdf = spark.createDataFrame(pairs, "query_id int, idx int, qw double")
    scored = (
        postings.filter(F.col("idx").isin(sorted({i for _, i, _ in pairs})))
        .join(F.broadcast(qdf), "idx")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(F.col("v") * F.col("qw")), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(F.col("query_id").asc(), F.col("rank").asc())
    )


def sparse_topk(
    df: DataFrame,
    doc_id: str,
    text_col: str,
    query: str,
    dim: int = SPARSE_DIM,
    k: int = 10,
) -> DataFrame:
    """Top-k ``(doc_id, score, rank)`` by sparse dot product."""
    from vechord_spark.operators.topk import ranked_topk

    spark = df.sparkSession
    qv = sparse_query_vector(query, dim)
    if not qv:
        # schema-stable empty result: actual id type, same score/rank cols
        return (
            df.select(F.col(doc_id).alias("doc_id"))
            .limit(0)
            .withColumn("score", F.lit(None).cast("double"))
            .withColumn("rank", F.lit(0))
        )
    qdf = spark.createDataFrame(
        [(i, w) for i, w in qv.items()], "idx int, qw double"
    )
    tokens = df.select(
        F.col(doc_id).alias("doc_id"), F.explode(tokenize(text_col)).alias("tok")
    ).withColumn("idx", _term_index(F.col("tok"), dim))
    # prune to query dimensions before the tf aggregation shuffles
    pruned = tokens.filter(F.col("idx").isin([int(i) for i in qv]))
    doc_vals = (
        pruned.groupBy("doc_id", "tok", "idx")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("v", F.log(F.lit(1.0) + F.col("tf")))
        .groupBy("doc_id", "idx")
        .agg(F.sum("v").alias("v"))
    )
    scored = (
        doc_vals.join(F.broadcast(qdf), "idx")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("v") * F.col("qw")), 6).alias("score"))
    )
    return ranked_topk(scored, [F.col("score").desc(), F.col("doc_id").asc()], k)
