"""Structured Streaming ingestion (engine extension).

The reference has NO streaming semantics (verified, SURVEY §2.7) — its
ingestion is request-driven batch. This module is the Spark-native
extension a continuously-fed corpus needs: a streaming source feeding
the same chunk/embed/analyze stages, with event-time windowing and
late-data handling for the ``events`` table shape.

Everything here composes the *same* expression library as batch —
tokenize/quality/fingerprint are pure Column expressions, so a
streaming DataFrame flows through them unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_documents(spark, path: str, schema) -> DataFrame:
    """File-arrival streaming source over a documents directory:
    new parquet files are discovered and processed incrementally."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window event counts with late-data watermarking.

    Works on both a static events DataFrame and a streaming one (the
    watermark is ignored in batch) — the batch path is what the oracle
    checks; the streaming path is exercised in tests with a memory sink.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(
        F.window("ts", window).alias("w"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
) -> DataFrame:
    """Session windows per user (streaming-native session_window;
    batch-compatible)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", gap)
    return src.groupBy(
        F.session_window("ts", gap).alias("s"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("n_events")).select(
        F.col("s.start").alias("session_start"),
        F.col("s.end").alias("session_end"),
        "user_id",
        "n_events",
    )


def run_stream_to_table(stream_df: DataFrame, path: str, checkpoint: str):
    """Append a streaming DataFrame to a parquet table with exactly-once
    file-sink semantics (checkpointed)."""
    return (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
