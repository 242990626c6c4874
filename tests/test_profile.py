"""Table profiling (operators/profile.py)."""

import pytest
from pyspark.sql import functions as F

from vechord_spark.operators.profile import profile_columns


@pytest.fixture()
def table(spark):
    rows = [
        (1, "a", None, 1.5),
        (2, "bb", "x", 2.5),
        (3, None, "x", None),
        (4, "bb", "y", 4.0),
    ]
    return spark.createDataFrame(rows, "id long, s string, t string, v double")


def test_profile_stats(table):
    got = {r["column"]: r for r in profile_columns(table, exact_distinct=True).collect()}
    assert set(got) == {"id", "s", "t", "v"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert got["s"]["n_nulls"] == 1 and got["s"]["null_frac"] == 0.25
    assert got["s"]["n_distinct"] == 2  # 'a', 'bb' (nulls excluded)
    assert got["s"]["min_str"] == "a" and got["s"]["max_str"] == "bb"
    assert abs(got["s"]["avg_len"] - 5 / 3) < 1e-6
    assert got["id"]["n_distinct"] == 4 and got["id"]["min_str"] == "1"
    assert got["v"]["n_nulls"] == 1 and got["v"]["avg_len"] is None
    assert got["t"]["n_distinct"] == 2


def test_profile_single_scan(table):
    plan = profile_columns(table)._jdf.queryExecution().executedPlan().toString()
    # approx mode: one aggregate pass, no expand/exchange storm — the
    # table is read once (single scan node)
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") == 1


def test_profile_column_subset_and_errors(table):
    assert profile_columns(table, ["id"]).count() == 1
    with pytest.raises(ValueError):
        profile_columns(table, ["nope"])


def test_profile_empty_table(spark):
    df = spark.createDataFrame([], "id long, s string")
    got = {r["column"]: r for r in profile_columns(df).collect()}
    assert got["id"]["n_rows"] == 0 and got["id"]["null_frac"] == 0.0
