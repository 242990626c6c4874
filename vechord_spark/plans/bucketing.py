"""Bucketed table layout: co-located joins without a shuffle.

At 100 TB the dominant cost of a repeated fact-fact or fact-dim join is
re-shuffling both sides on the key for every query. Spark's native
bucketing fixes the partitioning INTO THE STORAGE LAYOUT: each side is
hash-bucketed on the join key at write time, so a later equi-join on
that key reads matching buckets pairwise — `SortMergeJoin` with ZERO
Exchange on either side (verified in tests via the physical plan).

The reference engine gets the same effect from Postgres-side btree
indexes (vechord/spec.py DDL); on Spark the equivalent contract is the
bucketed parquet table. Use for: chunk<->embedding id-joins re-run per
query wave, incremental-dedup anti-joins against a persisted seen-set,
events sessionization re-keyed by user.

Bucket-count sizing: buckets are the unit of read parallelism for the
co-located join (one task per bucket), so pick
``total_size / bucket_count`` near the executor-comfortable 128-512 MB
— e.g. 100 TB / 65536 buckets ~ 1.6 GB cold, or bucket the hot
projection only. Both sides MUST use the same count for a zero-shuffle
join; a mismatched pair falls back to shuffling the smaller side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str] | str,
    num_buckets: int = 32,
    sort_cols: Sequence[str] | str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` as a bucketed EXTERNAL parquet table at ``path``
    and return the catalog-backed DataFrame.

    ``sort_cols`` additionally sorts within each bucket file, which
    lets the co-located SortMergeJoin skip its per-task sort (and makes
    min/max pruning effective for range predicates on the sort key).
    Bucketing requires the table catalog (``saveAsTable``) — a plain
    ``parquet(path)`` write cannot record bucket metadata.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
    return df.sparkSession.table(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    When both tables were written with ``write_bucketed`` on ``on``
    with equal bucket counts, the physical plan has no Exchange — each
    task joins one bucket pair. (This helper only expresses the join;
    the zero-shuffle property comes from the layout.)
    """
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on, how)


def explain_string(df: DataFrame) -> str:
    """The formatted physical plan as a string (what ``explain`` prints),
    for plan-shape assertions in tests and tooling."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()
