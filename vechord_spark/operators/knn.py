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


def binary_knn(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    dim: int,
    topk: int = 10,
    refine: int = 50,
    distance: str = "cos",
) -> DataFrame:
    """Binary-quantized estimate -> exact-refine k-NN: the 32x-smaller
    scan path for embedding search at corpus scale (the same
    estimate->refine shape as the PQ path, operators/pq.py, with sign
    bits instead of codebooks — pgvector's ``bit`` + ``<~>`` rerank
    recipe).

    Stage 1 scans ONLY the packed sign words: Hamming distance to the
    query signature, ``orderBy(hamming, id).limit(refine)`` compiles to
    TakeOrderedAndProject (per-partition bounded heap, no shuffle — at
    100 TB this stage reads the 32x-compressed column and moves
    ``refine`` rows total). Stage 2 broadcast-semi-joins the survivor
    ids back to fetch full vectors and exact-scores them. Ties break on
    the id at both stages, so the result is deterministic and
    oracle-checkable end to end.
    """
    from vechord_spark.functions.vector import binary_signature, signature_of

    qsig = signature_of(list(query))
    sig = binary_signature(vec_col, dim)
    qsig_col = F.lit([int(w) for w in qsig])  # array<bigint> literal
    ham = F.aggregate(
        F.zip_with(sig, qsig_col, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    cands = (
        df.select(F.col(id_col), ham.alias("hamming"))
        .orderBy("hamming", id_col)
        .limit(refine)
    )
    exact = df.join(F.broadcast(cands), id_col).withColumn(
        "distance", vector_distance(distance, vec_col, query)
    )
    return (
        exact.select(id_col, "hamming", F.round("distance", 6).alias("distance"))
        .orderBy("distance", id_col)
        .limit(topk)
    )


def matryoshka_knn(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    prefix_dim: int,
    topk: int = 10,
    refine: int = 100,
    distance: str = "cos",
) -> DataFrame:
    """Matryoshka prefix-dimension estimate -> exact-refine k-NN.

    MRL-trained embeddings (Kusupati et al. 2022; the layout OpenAI/
    Gemini embedding APIs expose via ``dimensions=``) pack the most
    informative components first, so distance on the FIRST
    ``prefix_dim`` components is a cheap estimate whose top-``refine``
    candidates almost surely contain the true top-k. Same two-stage
    shape as :func:`binary_knn` / the PQ path: stage 1 scans only
    ``prefix_dim/dim`` of the vector bytes and compiles to
    TakeOrderedAndProject (per-partition bounded heap — ``refine`` rows
    move, never the corpus); stage 2 broadcast-joins the survivor ids
    back for the exact full-dimension rerank. Ties break on id at both
    stages: deterministic, oracle-checkable end to end.

    (On non-MRL embeddings the prefix estimate is unbiased-but-noisier
    — recall degrades gracefully with ``refine``, which is the
    benchmarkable knob either way.)
    """
    if not 0 < prefix_dim <= len(query):
        raise ValueError(
            f"prefix_dim must be in (0, {len(query)}], got {prefix_dim}"
        )
    est = vector_distance(
        distance,
        F.slice(F.col(vec_col), 1, prefix_dim),
        list(query)[:prefix_dim],
    )
    cands = (
        df.select(F.col(id_col), F.round(est, 6).alias("est"))
        .orderBy("est", id_col)
        .limit(refine)
    )
    exact = df.join(F.broadcast(cands), id_col).withColumn(
        "distance", vector_distance(distance, vec_col, query)
    )
    return (
        exact.select(id_col, "est", F.round("distance", 6).alias("distance"))
        .orderBy("distance", id_col)
        .limit(topk)
    )
