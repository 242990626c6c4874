"""Metric ops vs hand-computed values; perfect retriever scores 1.0
(mirrors reference tests/test_groundtruth.py:23-57)."""

import pytest

from vechord_spark.operators.evaluate import (
    average_precision,
    evaluate_run,
    mrr,
    ndcg_at_k,
    recall_at_k,
)


@pytest.fixture()
def run(spark):
    # q1: truth {a, b}; retrieved a@1, x@2, b@3
    # q2: truth {c};    retrieved y@1, z@2 (miss)
    retrieved = spark.createDataFrame(
        [
            ("q1", "a", 1),
            ("q1", "x", 2),
            ("q1", "b", 3),
            ("q2", "y", 1),
            ("q2", "z", 2),
        ],
        "query_id string, doc_id string, rank int",
    )
    truth = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q2", "c")], "query_id string, doc_id string"
    )
    return retrieved, truth


def test_recall(run):
    retrieved, truth = run
    got = {r.query_id: r.recall for r in recall_at_k(retrieved, truth, k=10).collect()}
    assert got == {"q1": 1.0, "q2": 0.0}
    got2 = {r.query_id: r.recall for r in recall_at_k(retrieved, truth, k=2).collect()}
    assert got2 == {"q1": 0.5, "q2": 0.0}


def test_mrr(run):
    retrieved, truth = run
    got = {r.query_id: r.rr for r in mrr(retrieved, truth).collect()}
    assert got == {"q1": 1.0, "q2": 0.0}


def test_average_precision(run):
    retrieved, truth = run
    got = {r.query_id: r.ap for r in average_precision(retrieved, truth).collect()}
    # q1: (1/1 + 2/3) / 2
    assert got["q1"] == pytest.approx(round((1.0 + 2 / 3) / 2, 6))
    assert "q2" not in got  # no relevant retrieved


def test_ndcg(run):
    import math

    retrieved, truth = run
    got = {r.query_id: r.ndcg for r in ndcg_at_k(retrieved, truth, k=10).collect()}
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert got["q1"] == pytest.approx(round(dcg / idcg, 6))
    assert got["q2"] == 0.0


def test_perfect_retriever_scores_one(spark):
    retrieved = spark.createDataFrame(
        [("q", "a", 1), ("q", "b", 2)], "query_id string, doc_id string, rank int"
    )
    truth = spark.createDataFrame([("q", "a"), ("q", "b")], "query_id string, doc_id string")
    row = evaluate_run(retrieved, truth, k=10).collect()[0]
    assert row.ndcg == 1.0 and row.recall == 1.0 and row.mrr == 1.0 and row.map == 1.0
