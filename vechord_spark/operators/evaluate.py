"""Retrieval evaluation metrics as DataFrame aggregations.

Reference: vechord/evaluate.py — pytrec_eval NDCG/MAP/recall
(evaluate.py:21-66), AP (68-79), MRR (81-86), plus the UMBRELA LLM
judge (159-231, an external-API stage out of scope here). The reference
computes metrics per query in Python dicts; here every metric is a
window/agg program over two DataFrames:

    retrieved(query_id, doc_id, rank)   — 1-based rank
    truth(query_id, doc_id)             — binary relevance

Per-query metrics come out of one groupBy; corpus-level numbers are the
mean over queries. Everything is a narrow shuffle on query_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _joined(retrieved: DataFrame, truth: DataFrame, k: int | None) -> DataFrame:
    r = retrieved
    if k is not None:
        r = r.filter(F.col("rank") <= k)
    t = truth.withColumn("__rel", F.lit(1))
    return r.join(t, ["query_id", "doc_id"], "left").withColumn(
        "rel", F.coalesce(F.col("__rel"), F.lit(0))
    )


def recall_at_k(retrieved: DataFrame, truth: DataFrame, k: int = 10) -> DataFrame:
    """Per-query recall@k: |retrieved@k ∩ truth| / |truth|."""
    hits = (
        _joined(retrieved, truth, k)
        .groupBy("query_id")
        .agg(F.sum("rel").alias("n_hits"))
    )
    totals = truth.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_truth"))
    return hits.join(totals, "query_id").select(
        "query_id",
        F.round(F.col("n_hits") / F.col("n_truth"), 6).alias("recall"),
    )


def precision_at_k(retrieved: DataFrame, truth: DataFrame, k: int = 10) -> DataFrame:
    return (
        _joined(retrieved, truth, k)
        .groupBy("query_id")
        .agg(F.round(F.sum("rel") / F.lit(float(k)), 6).alias("precision"))
    )


def mrr(retrieved: DataFrame, truth: DataFrame, k: int | None = None) -> DataFrame:
    """Mean reciprocal rank of the first relevant hit per query
    (reference vechord/evaluate.py:81-86); queries with no hit score 0."""
    first_hit = (
        _joined(retrieved, truth, k)
        .filter(F.col("rel") == 1)
        .groupBy("query_id")
        .agg(F.min("rank").alias("first_rank"))
    )
    all_q = retrieved.select("query_id").distinct()
    return all_q.join(first_hit, "query_id", "left").select(
        "query_id",
        F.round(
            F.coalesce(F.lit(1.0) / F.col("first_rank"), F.lit(0.0)), 6
        ).alias("rr"),
    )


def average_precision(retrieved: DataFrame, truth: DataFrame, k: int | None = None) -> DataFrame:
    """AP per query (reference vechord/evaluate.py:68-79):
    mean over relevant positions i of precision@i."""
    from pyspark.sql import Window

    j = _joined(retrieved, truth, k)
    w = (
        Window.partitionBy("query_id")
        .orderBy(F.col("rank").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prec = j.withColumn("cum_rel", F.sum("rel").over(w)).withColumn(
        "prec_at_i", F.col("cum_rel") / F.col("rank")
    )
    totals = truth.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_truth"))
    return (
        prec.filter(F.col("rel") == 1)
        .groupBy("query_id")
        .agg(F.sum("prec_at_i").alias("ap_sum"))
        .join(totals, "query_id")
        .select(
            "query_id",
            F.round(F.col("ap_sum") / F.col("n_truth"), 6).alias("ap"),
        )
    )


def ndcg_at_k(retrieved: DataFrame, truth: DataFrame, k: int = 10) -> DataFrame:
    """Binary-relevance NDCG@k (reference uses pytrec_eval,
    vechord/evaluate.py:21-66; same formula):

        DCG  = sum over hits of 1/log2(rank+1)
        IDCG = sum_{i=1..min(|truth|,k)} 1/log2(i+1)
    """
    j = _joined(retrieved, truth, k)
    dcg = (
        j.filter(F.col("rel") == 1)
        .groupBy("query_id")
        .agg(F.sum(F.lit(1.0) / F.log2(F.col("rank") + 1)).alias("dcg"))
    )
    totals = truth.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_truth"))
    ideal = totals.withColumn(
        "idcg",
        F.aggregate(
            F.sequence(F.lit(1), F.least(F.col("n_truth"), F.lit(k))),
            F.lit(0.0),
            lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 1),
        ),
    )
    all_q = retrieved.select("query_id").distinct()
    return (
        all_q.join(dcg, "query_id", "left")
        .join(ideal, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0.0))
                / F.coalesce(F.col("idcg"), F.lit(1.0)),
                6,
            ).alias("ndcg"),
        )
    )


def evaluate_run(
    retrieved: DataFrame, truth: DataFrame, k: int = 10
) -> DataFrame:
    """Corpus-level summary: mean ndcg/recall/mrr/map over queries —
    the shape of the reference's estimate() printouts
    (vechord/evaluate.py:44-66)."""
    n = ndcg_at_k(retrieved, truth, k).agg(F.avg("ndcg").alias("ndcg"))
    r = recall_at_k(retrieved, truth, k).agg(F.avg("recall").alias("recall"))
    m = mrr(retrieved, truth, k).agg(F.avg("rr").alias("mrr"))
    a = average_precision(retrieved, truth, k).agg(F.avg("ap").alias("map"))
    return (
        n.crossJoin(r)
        .crossJoin(m)
        .crossJoin(a)
        .select(
            F.round("ndcg", 6).alias("ndcg"),
            F.round("recall", 6).alias("recall"),
            F.round("mrr", 6).alias("mrr"),
            F.round("map", 6).alias("map"),
        )
    )
