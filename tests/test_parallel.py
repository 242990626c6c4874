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
