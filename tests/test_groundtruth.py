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
