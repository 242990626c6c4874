"""Multi-vector MaxSim top-k (late-interaction / ColBERT scoring).

Reference: the ``@#`` maxsim operator with ``maxsim_refine``
(vechord/client.py:323-354, vechord/registry.py:227-267):

    MaxSim(Q, D) = sum over q in Q of max over d in D of sim(q, d)

where sim here is the (positive) dot product, and the operator value is
its negation so ascending order = most similar, matching pgvector's
distance convention.

Spark strategy: the query multivector is tiny (1-32 vectors) and the
document multivectors are row-local, so MaxSim is a per-row expression,
not a join. Two implementations:

- ``maxsim_expr``: nested ``transform``/``aggregate`` SQL expression —
  stays in whole-stage codegen, zero Python. Best when |Q| is small.
- ``maxsim_pandas``: Arrow-batched numpy einsum for very wide Q×D —
  the slow-path escape hatch.

The expression form is the default: at 100 TB it runs inside the scan
stage with no serialization.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def _dot(d: Column, qlits: list[Column]) -> None: ...


def maxsim_score(
    doc_col: str | Column, query_vectors: Sequence[Sequence[float]]
) -> Column:
    """Positive MaxSim score as a pure SQL expression.

    For each query vector q: max over the row's doc vectors d of
    dot(q, d); summed over q. All arithmetic in DOUBLE.
    """
    doc = F.col(doc_col) if isinstance(doc_col, str) else doc_col
    per_query: list[Column] = []
    for q in query_vectors:
        qlit = F.lit([float(x) for x in q])
        dots = F.transform(
            doc,
            lambda d: F.aggregate(
                F.zip_with(d, qlit, lambda x, y: x.cast("double") * y.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        per_query.append(F.array_max(dots))
    total = per_query[0]
    for p in per_query[1:]:
        total = total + p
    return total


def maxsim_topk(
    df: DataFrame,
    doc_col: str,
    query_vectors: Sequence[Sequence[float]],
    k: int = 10,
    select: Sequence[str] | None = None,
    tie_break: str | None = None,
    score_alias: str = "maxsim_distance",
) -> DataFrame:
    """Top-k rows by MaxSim. Emits the *negated* score (distance
    convention, ascending = best) to match the reference operator.

    Default topk=10 (vechord/registry.py:231); ``maxsim_refine`` has no
    meaning in the exact path — the IVF variant reintroduces it as a
    refine budget (operators/ivf.py).
    """
    from vechord_spark.parallel import spread

    scored = spread(df).withColumn(score_alias, -maxsim_score(doc_col, query_vectors))
    order = [F.col(score_alias).asc()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    out = scored.orderBy(*order).limit(k)
    if select is not None:
        out = out.select(*select, score_alias)
    else:
        out = out.drop(doc_col)
    return out


def maxsim_topk_batch(
    df: DataFrame,
    doc_col: str,
    queries: Sequence[Sequence[Sequence[float]]],
    k: int = 10,
    select: Sequence[str] | None = None,
    tie_break: str | None = None,
    score_alias: str = "maxsim_distance",
) -> DataFrame:
    """Batched exact MaxSim: N late-interaction queries against the
    corpus in ONE pass — each row's token matrix is stacked once per
    Arrow batch and scored against every query with one matmul each,
    then a single window takes per-query top-k (the partial
    WindowGroupLimit keeps the |Q| x |corpus| pair space below the
    exchange). N separate maxsim_topk calls would re-scan and re-stack
    the corpus N times. Returns ``query_id`` (position in
    ``queries``) + the ``select`` columns + the negated-score
    distance, top-k per query."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from vechord_spark.parallel import spread

    qlist = [
        np.asarray([list(v) for v in q], dtype=np.float64) for q in queries
    ]
    if not qlist:
        raise ValueError("queries must be a non-empty list of multivectors")

    @pandas_udf(
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("qid", T.IntegerType()),
                    T.StructField("d", T.DoubleType()),
                ]
            )
        )
    )
    def _score(docs: pd.Series) -> pd.Series:
        out = []
        for dv in docs:
            dm = np.asarray([np.asarray(t, dtype=np.float64) for t in dv])
            hits = []
            for qi, qm in enumerate(qlist):
                sims = qm @ dm.T
                hits.append({"qid": qi, "d": float(-sims.max(axis=1).sum())})
            out.append(hits)
        return pd.Series(out)

    keep = (
        list(select)
        if select is not None
        else [c for c in df.columns if c != doc_col]
    )
    scored = (
        spread(df)
        .withColumn("__hits", _score(F.col(doc_col)))
        .select(*keep, F.explode("__hits").alias("__h"))
        .select(
            F.col("__h.qid").alias("query_id"),
            *keep,
            F.col("__h.d").alias(score_alias),
        )
    )
    order = [F.col(score_alias).asc()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def maxsim_pandas_scorer(query_vectors: Sequence[Sequence[float]]):
    """Arrow-batched numpy MaxSim for wide query sets (slow path).

    Returns a pandas UDF mapping a multivector series to scores; use
    when |Q|·|D| per row is large enough that the expression form's
    per-query columns get unwieldy (|Q| > ~32).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    qm = np.asarray(query_vectors, dtype=np.float64)  # (nq, dim)

    @pandas_udf("double")
    def _score(docs: pd.Series) -> pd.Series:
        out = np.empty(len(docs), dtype=np.float64)
        for i, dv in enumerate(docs):
            dm = np.asarray(list(dv), dtype=np.float64)  # (nd, dim)
            sims = qm @ dm.T  # (nq, nd)
            out[i] = sims.max(axis=1).sum()
        return pd.Series(out)

    return _score


def mean_vector(doc_col: str | Column) -> Column:
    """Per-row mean of a multivector column (array<array<float>>), in
    DOUBLE — the coarse single-vector summary used by the refine
    estimate and the multivector IVF index (operators/ivf.py)."""
    doc = F.col(doc_col) if isinstance(doc_col, str) else doc_col
    dim_template = F.element_at(doc, 1)
    zero = F.transform(dim_template, lambda x: F.lit(0.0))
    summed = F.aggregate(
        doc, zero, lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b.cast("double"))
    )
    return F.transform(summed, lambda s: s / F.size(doc))


def centroid_interaction_estimate(
    centroid_ids_col: str | Column,
    centroids,
    query_vectors: Sequence[Sequence[float]],
) -> Column:
    """Centroid-interaction MaxSim estimate (the PLAID/ColBERTv2
    candidate-scoring idea, public literature): score ≈ sum over query
    vectors of max dot(centroid, q) over the DOC'S OWN token-centroid
    set. The |Q| x |lists| dot table is precomputed driver-side and
    inlined as array literals, so per row the cost is |Q| array-max
    lookups over a handful of ids — pure JVM, no Python, and a far
    tighter estimate than the doc-mean dot on spread-out token sets
    (a mean of opposing tokens is ~0; the per-centroid max keeps each
    facet's contribution)."""
    import numpy as np

    ids = F.col(centroid_ids_col) if isinstance(centroid_ids_col, str) else centroid_ids_col
    c = np.asarray(centroids, dtype=np.float64)
    est: Column | None = None
    for q in query_vectors:
        dots = c @ np.asarray(list(q), dtype=np.float64)
        table = F.lit([float(d) for d in dots])
        term = F.array_max(F.transform(ids, lambda i: F.element_at(table, i + 1)))
        est = term if est is None else est + term
    return est


def maxsim_topk_refined(
    df: DataFrame,
    doc_col: str,
    query_vectors: Sequence[Sequence[float]],
    k: int = 10,
    refine: int = 1000,
    select: Sequence[str] | None = None,
    tie_break: str | None = None,
    score_alias: str = "maxsim_distance",
    centroids=None,
    centroid_ids_col: str | None = None,
) -> DataFrame:
    """Two-phase MaxSim: the ``maxsim_refine`` budget analog (reference
    GUC, default 1000 — vechord/registry.py:233, client.py:337-343).

    Phase 1 scores each row cheaply and keeps the best ``refine``;
    phase 2 computes exact MaxSim on the survivors. With ``refine`` >=
    the row count this equals ``maxsim_topk``.

    Two phase-1 estimators: the default doc-MEAN dot (one dot per
    query vector), or — when ``centroids`` + ``centroid_ids_col`` are
    given (the multivector IVF index stores per-doc token-centroid
    sets at build time) — the centroid-interaction estimate, which
    recalls far better on token sets whose facets cancel in the mean.
    """
    from vechord_spark.functions.vector import dot_product

    if centroids is not None and centroid_ids_col is not None:
        est = centroid_interaction_estimate(
            centroid_ids_col, centroids, query_vectors
        )
    else:
        mean = mean_vector(doc_col)
        est = None
        for q in query_vectors:
            term = dot_product(mean, list(q))
            est = term if est is None else est + term
    candidates = df.withColumn("__mean_est", -est)
    order = [F.col("__mean_est").asc()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    survivors = candidates.orderBy(*order).limit(refine).drop("__mean_est")
    if centroid_ids_col is not None and centroid_ids_col in survivors.columns:
        survivors = survivors.drop(centroid_ids_col)
    return maxsim_topk(
        survivors,
        doc_col,
        query_vectors,
        k=k,
        select=select,
        tie_break=tie_break,
        score_alias=score_alias,
    )
