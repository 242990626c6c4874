"""parallel.spread: widen narrow inputs, leave wide/streaming inputs alone."""

from vechord_spark.parallel import spread


def test_spread_widens_single_partition(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "id long").coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = spread(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 100


def test_spread_leaves_wide_input_untouched(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(100).repartition(target + 2)
    out = spread(df)
    assert out.rdd.getNumPartitions() == target + 2  # no extra shuffle


def test_spread_passes_streams_through(spark, tmp_path):
    spark.range(10).write.parquet(str(tmp_path / "src"))
    stream = spark.readStream.schema("id long").parquet(str(tmp_path / "src"))
    assert spread(stream) is stream


def test_spread_skips_planning_for_wide_file_scans(spark, tmp_path):
    """r4 ADVICE: a scan that already arrives as >= target file splits
    must pass through IDENTICALLY (same object — no .rdd plan
    conversion, no mid-plan repartition), gated on the cheap
    inputFiles() check alone."""
    target = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "wide")
    spark.range(1000).repartition(target + 1).write.parquet(path)
    df = spark.read.parquet(path)
    assert len(df.inputFiles()) >= target
    assert spread(df) is df
    # composed plan over the wide scan: still a passthrough
    composed = df.filter("id > 10").selectExpr("id * 2 AS x")
    assert spread(composed) is composed
