"""As-of join (point-in-time) semantics."""

from datetime import datetime

import pytest

from vechord_spark.operators.asof import asof_join


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0, 0), "u1"),
            (2, datetime(2024, 1, 1, 12, 0, 0), "u1"),
            (3, datetime(2024, 1, 1, 9, 0, 0), "u2"),
            (4, datetime(2024, 1, 1, 11, 0, 0), "u3"),  # no right rows
        ],
        "id long, ts timestamp, user string",
    )
    right = spark.createDataFrame(
        [
            (101, datetime(2024, 1, 1, 9, 30, 0), "u1"),
            (102, datetime(2024, 1, 1, 11, 0, 0), "u1"),
            (103, datetime(2024, 1, 1, 9, 0, 0), "u2"),  # equal ts -> match
        ],
        "rid long, ts timestamp, user string",
    )
    return left, right


def test_backward_inclusive_matching(frames):
    left, right = frames
    out = {r.id: r.asof_rid for r in asof_join(left, right, by="user").collect()}
    assert out == {1: 101, 2: 102, 3: 103, 4: None}


def test_no_match_keeps_left_row_with_nulls(frames):
    left, right = frames
    rows = {r.id: r for r in asof_join(left, right, by="user").collect()}
    assert rows[4].asof_rid is None and rows[4].asof_ts is None
    assert len(rows) == 4  # left-join semantics


def test_tolerance_nulls_stale_matches(frames):
    left, right = frames
    out = {
        r.id: r.asof_rid
        for r in asof_join(
            left, right, by="user", tolerance_seconds=1800
        ).collect()
    }
    # id=1 matched 101 at 30min gap (kept); id=2 matched 102 at 60min (nulled)
    assert out == {1: 101, 2: None, 3: 103, 4: None}


def test_one_shuffle_plan(spark, frames):
    # the scale contract: exactly one hashpartitioning exchange (on the
    # by-key), never a range-join pair explosion
    left, right = frames
    plan = asof_join(left, right, by="user")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
