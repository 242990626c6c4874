"""Ground-truth generation + evaluation (D17).

Reference ``GroundTruth`` (vechord/groundtruth.py:28-127): run retrieval
per query, score each (query, chunk) pair with an UMBRELA LLM judge
(0-3 relevance, vechord/evaluate.py:159-231), persist chunks scoring
above a threshold as the query's ``truth`` uid list, and later evaluate
any retrieve function against those lists.

Spark rendition: all set-at-a-time —

- retrieval for EVERY query at once (``knn_join`` batch k-NN);
- scoring is a pluggable DataFrame transform (the real UMBRELA judge is
  a rate-limited mapInPandas stage over an LLM API — see
  providers.external_stage; ``umbrela_stub_scores`` is the
  deterministic stand-in this environment can run);
- truth persistence is one groupBy; evaluation reuses the D16 metric
  operators.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# UMBRELA scale: 0 irrelevant .. 3 perfectly relevant
# (vechord/evaluate.py:159-231); reference keeps score >= 2 as truth.
DEFAULT_MIN_SCORE = 2


def umbrela_stub_scores(
    pairs: DataFrame, query_text: str = "query_text", doc_text: str = "doc_text"
) -> DataFrame:
    """Deterministic STUB for the UMBRELA LLM judge: md5 of the
    (query, doc) pair -> pseudo-relevance 0-3. Keeps every downstream
    path (threshold, truth lists, metrics) runnable and hash-stable;
    swap in a providers.external_stage LLM call for real judging."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", F.col(query_text), F.col(doc_text))), 1, 7),
        16,
        10,
    ).cast("bigint")
    return pairs.withColumn("score", (h % 4).cast("int"))


def umbrela_stage(
    judge_factory: Callable[[], object],
    query_text: str = "query_text",
    doc_text: str = "doc_text",
) -> Callable[[DataFrame], DataFrame]:
    """Build a scorer transform backed by the REAL UMBRELA judge
    (providers_http.UmbrelaJudge over Gemini structured output,
    reference vechord/evaluate.py:159-231).

    ``judge_factory`` is a zero-arg callable constructed PER EXECUTOR
    WORKER inside the Arrow batch iterator (HTTP clients don't pickle);
    rate limiting lives in the client's transport
    (providers_http.UrllibTransport rps), so Spark-side parallelism
    multiplies by executor count — size the transport rps for the fleet,
    exactly like every other provider stage. Returns a transform:
    pairs -> pairs + ``score`` (int 0-3), pluggable as
    ``generate_ground_truth(pairs, scorer=umbrela_stage(...))``.
    """

    def _stage(pairs: DataFrame) -> DataFrame:
        out_schema = T.StructType(
            list(pairs.schema.fields) + [T.StructField("score", T.IntegerType())]
        )

        def _gen(batches):
            judge = judge_factory()
            for pdf in batches:
                pdf = pdf.copy()
                pdf["score"] = [
                    judge.estimate(q, d)
                    for q, d in zip(pdf[query_text], pdf[doc_text])
                ]
                yield pdf

        return pairs.mapInPandas(_gen, out_schema)

    return _stage


def generate_ground_truth(
    scored: DataFrame,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    min_score: int = DEFAULT_MIN_SCORE,
    scorer: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Scored retrieval -> one truth row per query.

    ``scored``: (query_id, doc_id, score) — retrieval output joined
    with judge scores. Returns ``(query_id, truth)`` with ``truth`` the
    sorted doc-id list scoring >= ``min_score`` (reference persists the
    same shape: Query.truth list[str], vechord/groundtruth.py:13-16).
    Queries whose every candidate fails the threshold keep an empty
    list (left join), matching the reference's "no relevant chunk"
    case.

    ``scorer``: optional transform applied first — pass UNSCORED
    retrieval pairs plus ``scorer=umbrela_stage(...)`` for real LLM
    judging, or ``scorer=umbrela_stub_scores`` for the deterministic
    default used by tests and oracle queries.
    """
    if scorer is not None:
        scored = scorer(scored)
    kept = (
        scored.filter(F.col("score") >= min_score)
        .groupBy(query_id)
        .agg(F.sort_array(F.collect_list(doc_id)).alias("truth"))
    )
    all_q = scored.select(query_id).distinct()
    return all_q.join(kept, query_id, "left").select(
        query_id,
        F.coalesce(F.col("truth"), F.array().cast("array<long>")).alias("truth"),
    )


def evaluate_against_truth(
    retrieved: DataFrame,
    truth_lists: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
) -> DataFrame:
    """Evaluate a retrieval run against persisted truth lists.

    ``retrieved``: (query_id, doc_id, rank); ``truth_lists``:
    (query_id, truth array). Returns the corpus-level metric summary
    (reference GroundTruth.evaluate -> pytrec_eval averages,
    vechord/groundtruth.py:90-127).
    """
    from vechord_spark.operators.evaluate import evaluate_run

    truth = truth_lists.select(
        query_id, F.explode("truth").alias(doc_id)
    )
    return evaluate_run(
        retrieved.select(query_id, doc_id, "rank"), truth, k=k
    )
