"""Structured Streaming ingestion tests (engine extension; the
reference has no streaming — SURVEY §2.7)."""

import time

import pytest
from pyspark.sql import functions as F

from vechord_spark.streaming.ingest import sessionize, windowed_event_counts


from vechord_spark.sources.testdata import load_table


@pytest.fixture()
def events(spark):
    return load_table(spark, "/root/testdata/sf0.001", "events")


def test_windowed_counts_batch(events):
    out = windowed_event_counts(events, window="1 day")
    rows = out.collect()
    assert sum(r.n_events for r in rows) == events.count()
    assert all(r.window_start is not None for r in rows)


def test_sessionize_batch(events):
    out = sessionize(events, gap="1 hour").collect()
    assert sum(r.n_events for r in out) == events.count()
    users = events.select("user_id").distinct().count()
    assert len({r.user_id for r in out}) == users


def test_streaming_windowed_counts(spark, events, tmp_path):
    """Same aggregation through a real stream: file source -> memory sink."""
    src = str(tmp_path / "stream_src")
    events.limit(200).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream, window="1 day", watermark="2 days")
    q = (
        agg.writeStream.format("memory")
        .queryName("evt_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select sum(n_events) s from evt_counts").collect()[0].s
    assert got == 200
