"""Vector k-NN top-k — the engine's flagship search operator.

Reference behavior: ``ORDER BY vec <op> %s LIMIT k`` against a vchordrq
index (vechord/client.py:294-321, vechord/registry.py:190-225). The
Spark rendition scores every row with a codegen'd distance expression
and takes the top-k; Catalyst compiles ``orderBy(...).limit(k)`` into
``TakeOrderedAndProject`` — a per-partition bounded heap with a driver
merge, i.e. no global sort and no shuffle of the full table. This is
the exact-search path; :mod:`vechord_spark.operators.ivf` adds the
probe-pruned approximate path for cluster scale.

Determinism: the reference's near-tie ordering follows index heap order
(nondeterministic). We always add a secondary sort on a tie-break
column (the primary key) so results are stable and oracle-checkable —
an intentional, stricter-than-reference semantic (SURVEY §4).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from vechord_spark.functions.vector import vector_distance


def with_distance(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    distance: str = "cos",
    alias: str = "distance",
) -> DataFrame:
    """Attach a distance column (ascending = most similar)."""
    return df.withColumn(alias, vector_distance(distance, vec_col, query))


def knn(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    distance: str = "cos",
    select: Sequence[str] | None = None,
    tie_break: str | None = None,
    score_alias: str = "distance",
) -> DataFrame:
    """Exact top-k nearest neighbours of ``query``.

    ``select`` defaults to all non-vector columns upstream (see
    registry.search_by_vector); the vector column itself is dropped from
    the result so the scan after this operator prunes the wide array
    column out of any downstream exchange.
    """
    from vechord_spark.parallel import spread

    # the distance expression is the expensive part — don't let a
    # single-split scan serialize it (parallel.spread is a no-op on
    # inputs that already arrive wide)
    scored = with_distance(spread(df), vec_col, query, distance, score_alias)
    order: list[Column] = [F.col(score_alias).asc()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    out = scored.orderBy(*order).limit(k)
    if select is not None:
        out = out.select(*select, score_alias)
    else:
        out = out.drop(vec_col)
    return out


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    query_vec_col: str,
    corpus_vec_col: str,
    query_id: str,
    corpus_id: str,
    k: int = 10,
    distance: str = "cos",
) -> DataFrame:
    """Batch k-NN: top-k corpus rows for EVERY query row.

    Used by evaluation harnesses and embedding-based near-dup search.
    Plan shape: broadcast the (small) query set against the corpus scan,
    score JVM-side, then a per-query window top-k. The corpus never
    shuffles by itself, and the scored |Q| x |corpus| pair space never
    reaches the exchange either: the ``rank <= k`` filter compiles to a
    PARTIAL ``WindowGroupLimit`` below the exchange (Spark's
    InferWindowGroupLimit rewrite), so each input partition forwards at
    most k rows per query — the per-partition top-k pre-reduction,
    supplied by the optimizer rather than hand-rolled. The plan shape is
    pinned by tests/test_knn.py::test_knn_join_partial_limit_before_exchange;
    a manual (partition_id, query) pre-window would instead ADD a
    full-volume exchange on its own keys.

    Returns columns: ``query_id, corpus_id, distance, rank``.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id).alias("__qid"), F.col(query_vec_col).alias("__qvec")
    )
    c = corpus.select(
        F.col(corpus_id).alias("__cid"), F.col(corpus_vec_col).alias("__cvec")
    )
    from vechord_spark.parallel import spread

    pairs = spread(c).crossJoin(F.broadcast(q))
    scored = pairs.withColumn(
        "distance", vector_distance(distance, "__cvec", F.col("__qvec"))
    )
    w = Window.partitionBy("__qid").orderBy(F.col("distance").asc(), F.col("__cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "distance",
            "rank",
        )
    )
