"""Streaming ingestion, end to end: file-arrival source -> watermarked
windowed counts -> first-seen dedup -> registry table sink.

The Structured Streaming face of the engine (SURVEY §2.7 — the
reference has no streaming semantics; this is the scale extension a
continuously-crawled corpus needs). The same DataFrame transforms run
in batch (the oracle-checked path) and streaming; this script drives
the streaming path with a real FileStreamSource and a memory sink.

    python examples/streaming_ingest.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from vechord_spark.session import get_spark
from vechord_spark.sources.testdata import load_table
from vechord_spark.streaming.ingest import (
    stream_dedup_first,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("streaming-example", master="local[4]", shuffle_partitions=4)
    work = Path(tempfile.mkdtemp())
    src = work / "arrivals"
    src.mkdir()

    # simulate file arrival: two micro-batches of events
    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_id") < 1000)
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(str(src / "batch0"))
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(str(src / "batch1"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )

    # 1. watermarked tumbling-window counts
    counts = windowed_event_counts(stream, window="1 day", watermark="2 days")
    q1 = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(180)
    got = spark.sql("SELECT count(*) AS n FROM win_counts").first().n
    print(f"windowed (day, type) rows: {got}")
    q1.stop()

    # 2. stateful first-seen content dedup across micro-batches
    #    (applyInPandasWithState keyed on the md5 content fingerprint)
    # state_ttl_ms=0 (NoTimeout): an availableNow drain never
    # terminates while a processing-time timeout is pending
    deduped = stream_dedup_first(stream, text_col="props", state_ttl_ms=0)
    q2 = (
        deduped.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    n_kept = spark.sql("SELECT count(*) AS n FROM first_seen").first().n
    n_distinct = ev.select("props").distinct().count()
    print(f"first-seen rows: {n_kept} (distinct props payloads: {n_distinct})")
    q2.stop()

    spark.stop()


if __name__ == "__main__":
    main()
