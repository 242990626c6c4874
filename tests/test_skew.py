"""Skew utilities: salted join correctness + skew profiling."""

import pyspark.sql.functions as F

from vechord_spark.operators.skew import key_skew_profile, salted_join


def test_salted_join_matches_plain_join(spark):
    # 90% of rows share one hot key
    large = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}") for i in range(1000)],
        "row_id long, k string",
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("k10", 2.0), ("k20", 3.0)], "k string, w double"
    )
    plain = {(r.row_id, r.w) for r in large.join(small, "k").collect()}
    salted = {(r.row_id, r.w) for r in salted_join(large, small, "k", n_salts=4).collect()}
    assert salted == plain
    assert len(salted) > 0


def test_salted_left_join(spark):
    large = spark.createDataFrame([(1, "a"), (2, "b")], "row_id long, k string")
    small = spark.createDataFrame([("a", 9.0)], "k string, w double")
    rows = {(r.row_id, r.w) for r in salted_join(large, small, "k", n_salts=3, how="left").collect()}
    assert rows == {(1, 9.0), (2, None)}


def test_key_skew_profile(spark):
    df = spark.createDataFrame(
        [(i, "hot" if i < 80 else f"k{i}") for i in range(100)], "i long, k string"
    )
    prof = key_skew_profile(df, "k", top_n=3).collect()
    assert prof[0].k == "hot"
    assert prof[0].n_rows == 80
    assert abs(prof[0].share - 0.8) < 1e-9
