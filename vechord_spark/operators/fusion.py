"""Rank fusion, order-preserving dedup, reorder — post-retrieval ops.

Reference:
- Reciprocal Rank Fusion: score(doc) = sum over lists of 1/(k + rank),
  k=60, sorted descending (vechord/rerank.py:95-113).
- Order-preserving dedup: first occurrence wins
  (vechord/pipeline.py:490-493, vechord/model/web.py:87-93).
- Reorder by external indices (vechord/model/web.py:95-96).
- Hybrid search: vector ∪ keyword -> dedup -> RRF/rerank
  (vechord/examples/hybrid.py:48-57).

All pure DataFrame ops: rank via row_number windows, fusion via
union + groupBy sum — map-side combinable, no driver loops.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

RRF_K = 60  # reference default, vechord/rerank.py:98


def ranked(df: DataFrame, order_col: str, id_col: str, ascending: bool = True) -> DataFrame:
    """Attach a dense 1-based ``rank`` by ``order_col`` (ties broken by
    id for determinism)."""
    direction = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.orderBy(direction, F.col(id_col).asc())
    return df.withColumn("rank", F.row_number().over(w))


def rrf(
    ranked_lists: Sequence[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k: int = RRF_K,
) -> DataFrame:
    """Reciprocal Rank Fusion of N ranked lists.

    Each input must carry ``id_col`` and a 1-based ``rank_col``.
    Returns ``(id_col, rrf_score)`` with score rounded to 6 decimals
    for cross-engine rank stability, descending = best.

    The reference scores with the 0-based position
    (``get_score(i)`` over ``enumerate``, vechord/rerank.py:101-109),
    so the top hit contributes 1/k; ranks here are 1-based, hence
    the ``rank - 1``.
    """
    slim = [d.select(F.col(id_col), F.col(rank_col).alias("rank")) for d in ranked_lists]
    unioned = slim[0]
    for d in slim[1:]:
        unioned = unioned.unionByName(d)
    return (
        unioned.withColumn("contrib", F.lit(1.0) / (F.lit(k) + F.col("rank") - 1))
        .groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("rrf_score"))
    )


def rrf_topk(
    ranked_lists: Sequence[DataFrame],
    id_col: str,
    topk: int | None = None,
    k: int = RRF_K,
) -> DataFrame:
    """RRF + final ranking: ``(id_col, rrf_score, rank)``.

    With ``topk`` set, the cut uses TakeOrderedAndProject (scale-safe);
    without it the full fused list is ranked (fine — inputs are already
    top-k lists, so the union is small by construction)."""
    from vechord_spark.operators.topk import ranked_topk

    fused = rrf(ranked_lists, id_col, k=k)
    order = [F.col("rrf_score").desc(), F.col(id_col).asc()]
    if topk is not None:
        return ranked_topk(fused, order, topk)
    w = Window.orderBy(*order)
    return fused.withColumn("rank", F.row_number().over(w))


def dedup_first(df: DataFrame, id_col: str, seq_col: str) -> DataFrame:
    """Order-preserving dedup: keep the first occurrence of each id by
    ``seq_col`` (reference deduplicate_uid, vechord/pipeline.py:490-493)."""
    w = Window.partitionBy(id_col).orderBy(F.col(seq_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def reorder_by(df: DataFrame, id_col: str, order: Sequence) -> DataFrame:
    """Permute rows to an externally supplied id order (reranker output,
    reference vechord/model/web.py:95-96). Broadcast the tiny order map."""
    spark = df.sparkSession
    order_df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(order)], f"{id_col} string, __new_rank int"
    ).withColumn(id_col, F.col(id_col).cast(df.schema[id_col].dataType))
    return (
        df.join(F.broadcast(order_df), id_col, "inner")
        .orderBy("__new_rank")
        .drop("__new_rank")
    )


def hybrid_rrf(
    vector_hits: DataFrame,
    keyword_hits: DataFrame,
    id_col: str,
    topk: int = 10,
    k: int = RRF_K,
) -> DataFrame:
    """Hybrid search fusion: vector list ∪ keyword list -> RRF top-k
    (reference vechord/examples/hybrid.py:48-57). Inputs carry ``rank``."""
    return rrf_topk([vector_hits, keyword_hits], id_col, topk=topk, k=k)


def lexical_rerank(
    candidates: DataFrame,
    text_col: str,
    query: str,
    id_col: str,
    topk: int = 10,
) -> DataFrame:
    """Deterministic lexical reranker: re-score a candidate set by query
    term coverage — |terms(doc) ∩ terms(query)| / |terms(query)|.

    The in-container executable member of the reranker family (R4's
    Cohere/Jina rerankers are HTTP providers, exercised on fixtures):
    same contract — candidates in, re-ordered top-k out — with an exact
    SQL oracle. First-stage ranks break coverage ties (the standard
    cascade behavior: the reranker reorders, the retriever's order is
    the tiebreak), then id. A pure Column program over the candidate
    set only — the corpus is never touched again, so rerank cost is
    O(candidates), independent of corpus size.

    Input needs ``id_col``, ``text_col`` and a first-stage ``rank``
    column; returns (id, coverage, rank).
    """
    import re

    from vechord_spark.functions.text import tokenize

    terms = sorted({t for t in re.split(r"[^a-z0-9]+", query.lower()) if t})
    if not terms:
        raise ValueError("lexical_rerank needs a non-empty query")
    coverage = (
        F.size(
            F.array_intersect(
                F.array_distinct(tokenize(text_col)),
                F.lit([str(t) for t in terms]),
            )
        )
        / F.lit(float(len(terms)))
    )
    scored = candidates.withColumn("coverage", F.round(coverage, 6))
    out = (
        scored.orderBy(
            F.col("coverage").desc(), F.col("rank").asc(), F.col(id_col).asc()
        )
        .limit(topk)
        .select(
            id_col,
            "coverage",
            F.row_number()
            .over(
                Window.orderBy(
                    F.col("coverage").desc(),
                    F.col("rank").asc(),
                    F.col(id_col).asc(),
                )
            )
            .alias("rank"),
        )
    )
    return out
