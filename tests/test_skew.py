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


def test_auto_salting_picks_factor_and_matches_unsalted(spark):
    """r4 VERDICT item 7: a pathologically skewed build side must make
    choose_salt_factor pick salt > 1, and the auto-salted join must
    return exactly the plain join's rows."""
    from vechord_spark.operators.skew import choose_salt_factor, salted_join

    # one user holds ~90% of events
    rows = [(1, f"e{i}") for i in range(900)] + [
        (2 + i % 50, f"x{i}") for i in range(100)
    ]
    large = spark.createDataFrame(rows, "user_id long, payload string")
    small = spark.createDataFrame(
        [(u, f"name{u}") for u in range(1, 60)], "user_id long, name string"
    )

    factor = choose_salt_factor(large, "user_id", sample_fraction=1.0)
    assert factor > 1

    auto = salted_join(large, small, "user_id", how="inner", auto=True)
    plain = large.join(small, "user_id", "inner")
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, plain.collect()))


def test_auto_salting_degrades_to_plain_join_on_uniform_keys(spark):
    from vechord_spark.operators.skew import choose_salt_factor, salted_join

    large = spark.createDataFrame(
        [(i % 1000, f"e{i}") for i in range(4000)], "user_id long, payload string"
    )
    small = spark.createDataFrame(
        [(u, f"n{u}") for u in range(1000)], "user_id long, name string"
    )
    assert choose_salt_factor(large, "user_id", sample_fraction=1.0) == 1
    out = salted_join(large, small, "user_id", auto=True)
    assert "__salt" not in out.columns
    assert out.count() == 4000
