"""Storage-side rollup: coarser group-bys re-aggregate losslessly."""

import pytest
from pyspark.sql import functions as F

from vechord_spark.plans.rollup import rollup_query, write_rollup
from vechord_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rolled(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rollup") / "events_daily")
    events = load_table(spark, SF, "events").withColumn(
        "day", F.to_date("ts")
    )
    write_rollup(
        events,
        dims=["day", "event_type"],
        aggs={"*": ["count"], "value": ["sum", "min", "max"]},
        path=path,
    )
    return path, events


def _norm(rows):
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in rows
    )


def test_rollup_matches_raw_at_build_grain(spark, rolled):
    path, events = rolled
    got = rollup_query(
        spark, path, ["day", "event_type"], {"*": ["count"], "value": ["sum"]}
    ).select("day", "event_type", "count_rows", "sum_value")
    want = events.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("count_rows"),
        F.sum("value").alias("sum_value"),
    )
    assert _norm(got.collect()) == _norm(want.collect())


def test_rollup_answers_coarser_grain(spark, rolled):
    path, events = rolled
    got = rollup_query(
        spark, path, ["event_type"], {"*": ["count"], "value": ["min", "max"]}
    ).select("event_type", "count_rows", "min_value", "max_value")
    want = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("count_rows"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    assert _norm(got.collect()) == _norm(want.collect())


def test_rollup_grand_total(spark, rolled):
    path, events = rolled
    got = rollup_query(spark, path, [], {"*": ["count"]}).collect()
    assert got[0].count_rows == events.count()


def test_rollup_scan_is_tiny(spark, rolled):
    path, events = rolled
    n_rolled = spark.read.parquet(path).count()
    assert n_rolled < events.count() / 5


def test_rollup_rejects_non_mergeable_and_missing(spark, rolled):
    path, events = rolled
    with pytest.raises(ValueError, match="not mergeable"):
        write_rollup(events, ["event_type"], {"value": ["avg"]}, path + "_x")
    with pytest.raises(ValueError, match="does not store"):
        rollup_query(spark, path, ["event_type"], {"value": ["count"]})
    with pytest.raises(ValueError, match="at least one dimension"):
        write_rollup(events, [], {"*": ["count"]}, path + "_y")


def test_merge_rollup_equals_full_rebuild(spark, tmp_path):
    from vechord_spark.plans.rollup import merge_rollup

    events = load_table(spark, SF, "events").withColumn("day", F.to_date("ts"))
    day1 = events.filter(F.col("event_id") % 5 != 0)
    day2 = events.filter(F.col("event_id") % 5 == 0)
    dims = ["day", "event_type"]
    aggs = {"*": ["count"], "value": ["sum", "min", "max"]}

    inc_path = str(tmp_path / "inc")
    write_rollup(day1, dims, aggs, inc_path)
    merge_rollup(spark, inc_path, day2, dims, aggs)

    full_path = str(tmp_path / "full")
    write_rollup(events, dims, aggs, full_path)

    cols = sorted(spark.read.parquet(full_path).columns)
    got = _norm(spark.read.parquet(inc_path).select(*cols).collect())
    want = _norm(spark.read.parquet(full_path).select(*cols).collect())
    assert got == want


def test_merge_rollup_validates_shape(spark, tmp_path):
    from vechord_spark.plans.rollup import merge_rollup

    events = load_table(spark, SF, "events").withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "r")
    write_rollup(events, ["event_type"], {"*": ["count"]}, path)
    with pytest.raises(ValueError, match="does not store"):
        merge_rollup(spark, path, events, ["event_type"], {"value": ["sum"]})
    with pytest.raises(ValueError, match="cover the stored"):
        merge_rollup(spark, path, events, [], {"*": ["count"]})


def test_stream_to_rollup_matches_batch(spark, tmp_path):
    """Micro-batch rollup maintenance: streaming the events in two
    file-batches yields the same summary as one batch build."""
    from vechord_spark.streaming.ingest import stream_to_rollup

    events = load_table(spark, SF, "events").withColumn("day", F.to_date("ts"))
    src = str(tmp_path / "src")
    events.filter(F.col("event_id") % 2 == 0).write.parquet(src + "/b0")
    events.filter(F.col("event_id") % 2 == 1).write.parquet(src + "/b1")
    dims = ["day", "event_type"]
    aggs = {"*": ["count"], "value": ["sum", "min", "max"]}
    roll_path = str(tmp_path / "roll")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = stream_to_rollup(
        stream, roll_path, dims, aggs, checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    try:
        assert q.awaitTermination(300) or not q.isActive
    finally:
        q.stop()

    full_path = str(tmp_path / "full")
    write_rollup(events, dims, aggs, full_path)
    cols = sorted(spark.read.parquet(full_path).columns)
    got = _norm(spark.read.parquet(roll_path).select(*cols).collect())
    want = _norm(spark.read.parquet(full_path).select(*cols).collect())
    assert got == want


def test_stream_to_rollup_survives_checkpoint_reset(spark, tmp_path):
    """Epoch ids restart at 0 under a new checkpoint; the batchmeta
    guard is scoped to the checkpoint so a restarted run's batches are
    merged, not silently skipped."""
    from vechord_spark.streaming.ingest import stream_to_rollup

    events = load_table(spark, SF, "events").withColumn("day", F.to_date("ts"))
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    src0, src1 = str(tmp_path / "s0"), str(tmp_path / "s1")
    b0.write.parquet(src0 + "/b")
    b1.write.parquet(src1 + "/b")
    dims = ["day", "event_type"]
    aggs = {"*": ["count"], "value": ["sum"]}
    roll_path = str(tmp_path / "roll")

    def run(src, ckpt):
        stream = spark.readStream.schema(events.schema).parquet(src + "/*")
        q = stream_to_rollup(
            stream, roll_path, dims, aggs, checkpoint=ckpt, available_now=True
        )
        try:
            assert q.awaitTermination(300) or not q.isActive
        finally:
            q.stop()

    run(src0, str(tmp_path / "ckpt_a"))  # run 1: epochs 0.. under ckpt A
    run(src1, str(tmp_path / "ckpt_b"))  # run 2: fresh checkpoint, epoch 0 again

    full_path = str(tmp_path / "full")
    write_rollup(events, dims, aggs, full_path)
    cols = sorted(spark.read.parquet(full_path).columns)
    got = _norm(spark.read.parquet(roll_path).select(*cols).collect())
    want = _norm(spark.read.parquet(full_path).select(*cols).collect())
    assert got == want


def test_stream_to_rollup_legacy_batchmeta_keeps_skip_guard(spark, tmp_path):
    """A pre-upgrade .batchmeta (no checkpoint field) must keep its
    legacy UNSCOPED skip semantics: treating it as a foreign run would
    bypass the re-delivery guard once and double-merge an epoch."""
    import json

    from vechord_spark.streaming.ingest import stream_to_rollup

    events = load_table(spark, SF, "events").withColumn("day", F.to_date("ts"))
    src = str(tmp_path / "src")
    events.write.parquet(src + "/b0")
    roll = str(tmp_path / "roll")
    meta = tmp_path / "roll.batchmeta"
    # legacy record claiming this epoch range was already merged
    meta.write_text(json.dumps({"last_epoch": 10_000}))

    stream = spark.readStream.schema(events.schema).parquet(src + "/*")
    q = stream_to_rollup(
        stream, roll, ["day", "event_type"], {"*": ["count"]},
        checkpoint=str(tmp_path / "ck"), available_now=True,
    )
    try:
        assert q.awaitTermination(300) or not q.isActive
    finally:
        q.stop()
    # every epoch id <= the legacy last_epoch -> all batches skipped,
    # exactly the legacy behavior (no double merge on upgrade)
    import os

    assert not os.path.exists(roll)
