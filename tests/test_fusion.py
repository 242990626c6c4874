"""RRF / dedup / reorder vs hand-computed values (SURVEY §5 plan)."""

import pytest
from pyspark.sql import functions as F

from vechord_spark.operators.fusion import (
    RRF_K,
    dedup_first,
    hybrid_rrf,
    ranked,
    reorder_by,
    rrf_topk,
)


def test_rrf_hand_computed(spark):
    # list A ranks: x=1, y=2 ; list B ranks: y=1, z=2
    a = spark.createDataFrame([("x", 1), ("y", 2)], "uid string, rank int")
    b = spark.createDataFrame([("y", 1), ("z", 2)], "uid string, rank int")
    got = {r.uid: r.rrf_score for r in rrf_topk([a, b], "uid").collect()}
    k = RRF_K
    # reference scores the 0-based position (vechord/rerank.py:101-109):
    # rank 1 contributes 1/k, rank 2 contributes 1/(k+1)
    assert got["y"] == pytest.approx(round(1 / (k + 1) + 1 / k, 6))
    assert got["x"] == pytest.approx(round(1 / k, 6))
    assert got["z"] == pytest.approx(round(1 / (k + 1), 6))
    # y fused first (appears in both lists)
    top = rrf_topk([a, b], "uid", topk=1).collect()
    assert top[0].uid == "y" and top[0].rank == 1


def test_ranked_assigns_deterministic_ranks(spark):
    df = spark.createDataFrame(
        [("a", 0.3), ("b", 0.1), ("c", 0.1)], "uid string, score double"
    )
    got = {r.uid: r.rank for r in ranked(df, "score", "uid").collect()}
    assert got == {"b": 1, "c": 2, "a": 3}  # tie b/c broken by uid


def test_dedup_first_keeps_earliest(spark):
    df = spark.createDataFrame(
        [("a", 1, "first"), ("a", 3, "later"), ("b", 2, "only")],
        "uid string, seq int, tag string",
    )
    got = {r.uid: r.tag for r in dedup_first(df, "uid", "seq").collect()}
    assert got == {"a": "first", "b": "only"}


def test_reorder_by(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "uid string, v int")
    out = reorder_by(df, "uid", ["c", "a"]).collect()
    assert [r.uid for r in out] == ["c", "a"]


def test_hybrid_rrf(spark):
    vec = spark.createDataFrame([("d1", 1), ("d2", 2)], "uid string, rank int")
    kw = spark.createDataFrame([("d2", 1), ("d3", 2)], "uid string, rank int")
    out = hybrid_rrf(vec, kw, "uid", topk=2).collect()
    assert [r.uid for r in out] == ["d2", "d1"]


def test_lexical_rerank_orders_by_coverage_then_stage1(spark):
    from vechord_spark.operators.fusion import lexical_rerank

    cands = spark.createDataFrame(
        [
            (1, "alpha beta gamma", 1),
            (2, "alpha only here", 2),
            (3, "alpha beta gamma delta", 3),
            (4, "nothing relevant", 4),
        ],
        "doc_id long, text string, rank int",
    )
    out = lexical_rerank(cands, "text", "alpha beta GAMMA", "doc_id", topk=3)
    rows = out.collect()
    # docs 1 and 3 both cover 3/3 -> stage1 rank breaks the tie
    assert [r.doc_id for r in rows] == [1, 3, 2]
    assert rows[0].coverage == 1.0 and rows[2].coverage == pytest.approx(1 / 3)
    assert [r.rank for r in rows] == [1, 2, 3]


def test_lexical_rerank_rejects_empty_query(spark):
    from vechord_spark.operators.fusion import lexical_rerank

    cands = spark.createDataFrame([(1, "x", 1)], "doc_id long, text string, rank int")
    with pytest.raises(ValueError):
        lexical_rerank(cands, "text", "!!!", "doc_id")
