"""Binned point-in-interval join (operators/interval.py) — correctness
against a brute-force crossJoin reference, boundary semantics, and
bucket-spanning cases."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vechord_spark.operators.interval import point_in_interval_join


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture()
def frames(spark):
    iv = spark.createDataFrame(
        [
            (1, _ts(0), _ts(5)),
            (2, _ts(3), _ts(10)),   # overlaps interval 1
            (3, _ts(30), _ts(31)),  # empty window
        ],
        "iv_id int, w_start timestamp, w_end timestamp",
    )
    pts = spark.createDataFrame(
        [
            (10, _ts(0)),          # == start of 1 (inclusive)
            (11, _ts(4, 59)),      # inside 1 and 2
            (12, _ts(5)),          # == end of 1 (exclusive), inside 2
            (13, _ts(9, 59)),      # inside 2 only
            (14, _ts(45)),         # matches nothing
        ],
        "pt_id int, p_ts timestamp",
    )
    return iv, pts


def _pairs(df):
    return sorted((r.iv_id, r.pt_id) for r in df.collect())


def test_matches_bruteforce(spark, frames):
    iv, pts = frames
    got = _pairs(point_in_interval_join(iv, pts, "w_start", "w_end", "p_ts"))
    brute = _pairs(
        iv.crossJoin(pts).where(
            (F.col("p_ts") >= F.col("w_start")) & (F.col("p_ts") < F.col("w_end"))
        )
    )
    assert got == brute == [(1, 10), (1, 11), (2, 11), (2, 12), (2, 13)]


def test_end_inclusive(spark, frames):
    iv, pts = frames
    got = _pairs(
        point_in_interval_join(iv, pts, "w_start", "w_end", "p_ts", end_inclusive=True)
    )
    assert (1, 12) in got  # p_ts == w_end now matches


def test_small_bucket_spans_many_and_no_duplicates(spark, frames):
    """A bucket much smaller than the interval explodes each interval
    over many buckets; a point still matches each interval exactly once
    (its single bucket)."""
    iv, pts = frames
    got = _pairs(
        point_in_interval_join(iv, pts, "w_start", "w_end", "p_ts", bucket_seconds=7)
    )
    assert got == [(1, 10), (1, 11), (2, 11), (2, 12), (2, 13)]


def test_randomized_vs_bruteforce(spark):
    import random

    rng = random.Random(7)
    base = dt.datetime(2024, 3, 1)
    iv_rows = []
    for i in range(60):
        s = base + dt.timedelta(seconds=rng.randrange(0, 3600))
        e = s + dt.timedelta(seconds=rng.randrange(1, 900))
        iv_rows.append((i, s, e))
    pt_rows = [
        (i, base + dt.timedelta(seconds=rng.randrange(0, 4000), milliseconds=rng.randrange(1000)))
        for i in range(200)
    ]
    iv = spark.createDataFrame(iv_rows, "iv_id int, w_start timestamp, w_end timestamp")
    pts = spark.createDataFrame(pt_rows, "pt_id int, p_ts timestamp")
    got = _pairs(point_in_interval_join(iv, pts, "w_start", "w_end", "p_ts"))
    brute = _pairs(
        iv.crossJoin(pts).where(
            (F.col("p_ts") >= F.col("w_start")) & (F.col("p_ts") < F.col("w_end"))
        )
    )
    assert got == brute and len(got) > 0


def test_plan_is_equi_join_not_nested_loop(spark, frames):
    iv, pts = frames
    plan = point_in_interval_join(
        iv, pts, "w_start", "w_end", "p_ts"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
