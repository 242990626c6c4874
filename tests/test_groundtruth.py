"""GroundTruth generate/evaluate (D17)."""

import pyspark.sql.functions as F

from vechord_spark.operators.groundtruth import (
    evaluate_against_truth,
    generate_ground_truth,
    umbrela_stub_scores,
)


def test_stub_scores_deterministic_0_3(spark):
    pairs = spark.createDataFrame(
        [("q1", "apple pie"), ("q1", "spark sql"), ("q2", "apple pie")],
        "query_text string, doc_text string",
    )
    s1 = umbrela_stub_scores(pairs).collect()
    s2 = umbrela_stub_scores(pairs).collect()
    assert [r.score for r in s1] == [r.score for r in s2]
    assert all(0 <= r.score <= 3 for r in s1)


def test_generate_truth_threshold_and_empty(spark):
    scored = spark.createDataFrame(
        [(1, 10, 3), (1, 11, 2), (1, 12, 1), (2, 10, 0), (2, 13, 1)],
        "query_id long, doc_id long, score int",
    )
    truth = {r.query_id: r.truth for r in generate_ground_truth(scored).collect()}
    assert truth[1] == [10, 11]
    assert truth[2] == []  # below threshold everywhere -> empty, not missing


def test_perfect_retriever_scores_one(spark):
    # reference test_groundtruth.py:23-57 asserts NDCG == 1.0 for a
    # retriever that returns exactly the truth
    truth_lists = spark.createDataFrame(
        [(1, [10, 11]), (2, [20])], "query_id long, truth array<long>"
    )
    retrieved = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1)],
        "query_id long, doc_id long, rank int",
    )
    m = evaluate_against_truth(retrieved, truth_lists, k=10).collect()[0]
    assert m.ndcg == 1.0 and m.recall == 1.0 and m.mrr == 1.0 and m.map == 1.0


def test_umbrela_live_stage_parity_with_stub_contract(spark):
    """The LIVE judge path (umbrela_stage over GeminiGenerateClient
    structured output) must produce the same (query_id, doc_id, score)
    shape the stub does, so generate_ground_truth is interchangeable.
    EchoTransport scores 3 iff the passage mentions 'relevant'."""
    from vechord_spark.providers_http import (
        EchoTransport,
        GeminiGenerateClient,
        UmbrelaJudge,
        umbrela_stage,
    )

    pairs = spark.createDataFrame(
        [
            (1, 10, "q one", "a very relevant passage"),
            (1, 11, "q one", "noise with nothing useful"),
            (2, 10, "q two", "also relevant text"),
        ],
        "query_id long, doc_id long, query_text string, doc_text string",
    )
    stage = umbrela_stage(
        lambda: UmbrelaJudge(GeminiGenerateClient(transport=EchoTransport())),
        rps=None,
    )
    scored = stage(pairs)
    # same column contract the stub emits (plus the error quarantine)
    assert {"query_id", "doc_id", "score"} <= set(scored.columns)
    rows = {(r.query_id, r.doc_id): (r.score, r._error) for r in scored.collect()}
    assert rows[(1, 10)][0] == 3 and rows[(2, 10)][0] == 3
    assert rows[(1, 11)][0] == 0
    assert all(err is None for _, err in rows.values())

    truth = {
        r.query_id: r.truth
        for r in generate_ground_truth(scored.select("query_id", "doc_id", "score")).collect()
    }
    assert truth == {1: [10], 2: [10]}


def test_generate_ground_truth_with_real_umbrela_stage(spark):
    """r4 VERDICT item 10: the REAL UmbrelaJudge client is reachable
    from generate_ground_truth via scorer=umbrela_stage(...), exercised
    end-to-end over the offline EchoTransport (scores 3 iff the prompt
    mentions 'relevant')."""
    from vechord_spark.operators.groundtruth import (
        generate_ground_truth,
        umbrela_stage,
    )

    def judge_factory():
        from vechord_spark.providers_http import (
            EchoTransport,
            GeminiGenerateClient,
            UmbrelaJudge,
        )

        return UmbrelaJudge(
            GeminiGenerateClient(api_key="offline", transport=EchoTransport())
        )

    pairs = spark.createDataFrame(
        [
            (1, 10, "what is spark", "relevant info about spark"),
            (1, 11, "what is spark", "cooking pasta"),
            (2, 20, "vector search", "relevant vector search passage"),
            (2, 21, "vector search", "unrelated"),
        ],
        "query_id long, doc_id long, query_text string, doc_text string",
    )
    truth = generate_ground_truth(pairs, scorer=umbrela_stage(judge_factory))
    got = {r.query_id: list(r.truth) for r in truth.collect()}
    assert got == {1: [10], 2: [20]}
