"""Bucketed layout: the co-located join must have NO Exchange."""

import pytest

from vechord_spark.plans.bucketing import (
    co_located_join,
    explain_string,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    write_bucketed(
        orders, "b_orders", str(tmp_path / "b_orders"), "o_custkey", num_buckets=8
    )
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        str(tmp_path / "b_customer"),
        "o_custkey",
        num_buckets=8,
        sort_cols="o_custkey",
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_co_located_join_has_no_exchange(spark, bucketed_pair):
    # force the sort-merge path so a broadcast can't hide a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = co_located_join(spark, "b_orders", "b_customer", "o_custkey")
        plan = explain_string(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
        # and it computes the right thing
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        expected = orders.join(
            cust, orders["o_custkey"] == cust["c_custkey"]
        ).count()
        assert j.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_shuffles_as_baseline(spark, sf_dir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        assert "Exchange" in explain_string(j)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_suite_bucketed_query_plan_and_values(spark):
    """The registered bucketed_customer_revenue query: with broadcast
    disabled, the co-located join AND the per-customer aggregate run
    with zero Exchange (the aggregate's required distribution is
    satisfied by the bucketed scan's partitioning)."""
    from vechord_spark.suite import QUERIES

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["bucketed_customer_revenue"](spark, "/root/testdata/sf0.001")
        plan = explain_string(df)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
        rows = df.collect()
        assert 0 < len(rows) <= 20
        # revenue sorted descending, custkey tiebreak ascending
        revs = [r.revenue for r in rows]
        assert revs == sorted(revs, reverse=True)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
