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


def test_asof_randomized_parity_with_duckdb(spark):
    """Fuzz harness (advice: keep asof honest now that it is
    correctness-gated): random event sets with ties, dense collisions,
    and match-free keys, checked row-for-row against DuckDB's native
    ASOF LEFT JOIN, plus the tolerance variant."""
    import random
    from datetime import timedelta

    import duckdb
    import pandas as pd

    rng = random.Random(20260813)
    base = datetime(2024, 1, 1)
    for _ in range(3):
        keys = [f"u{i}" for i in range(6)]
        left_rows = [
            (i, rng.choice(keys), base + timedelta(seconds=rng.randrange(0, 600)))
            for i in range(120)
        ]
        seen: set[tuple[str, int]] = set()
        right_rows = []
        for j in range(80):
            k, s = rng.choice(keys[:4]), rng.randrange(0, 600)  # keys 4,5 never match
            if (k, s) in seen:
                continue  # unique (key, ts) keeps the asof pick deterministic
            seen.add((k, s))
            right_rows.append((1000 + j, k, base + timedelta(seconds=s)))

        left = spark.createDataFrame(left_rows, "lid long, k string, ts timestamp")
        right = spark.createDataFrame(right_rows, "rid long, k string, ts timestamp")
        got = {
            r.lid: r.asof_rid for r in asof_join(left, right, by="k").collect()
        }

        con = duckdb.connect()
        con.register("l", pd.DataFrame(left_rows, columns=["lid", "k", "ts"]))
        con.register("r", pd.DataFrame(right_rows, columns=["rid", "k", "ts"]))
        want_rows = con.execute(
            "SELECT l.lid, r.rid, r.ts FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
        want = {lid: rid for lid, rid, _ in want_rows}
        assert got == want

        # tolerance: matches older than 60 s are nulled (merge_asof-style)
        got_tol = {
            r.lid: r.asof_rid
            for r in asof_join(left, right, by="k", tolerance_seconds=60).collect()
        }
        lts = {lid: ts for lid, _, ts in left_rows}
        want_tol = {
            lid: (rid if rid is not None and (lts[lid] - rts).total_seconds() <= 60 else None)
            for lid, rid, rts in want_rows
        }
        assert got_tol == want_tol
        con.close()
