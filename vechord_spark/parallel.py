"""Partition-width helpers for CPU-heavy projections.

A Spark stage inherits its parallelism from the upstream scan: a small
parquet file arrives as ONE split, so an expensive projection (md5
shingling, regex tokenization, a pandas UDF, a distance expression)
serializes onto a single task while the rest of the cluster idles. At
100 TB inputs arrive as thousands of splits and none of this matters —
these helpers are deliberately no-ops there — but every corpus has
small tables (dimension joins, per-source shards, test fixtures) where
the fix is a cheap round-robin repartition of the *un-computed* rows
before the heavy work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism when
    it currently has fewer partitions; pass through untouched otherwise
    (measured 5-10x on md5-heavy single-split scans at sf0.1; zero
    effect on inputs that already arrive wide)."""
    if df.isStreaming:
        # no RDD introspection on streams; micro-batch parallelism is
        # the source's concern (maxFilesPerTrigger etc.)
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    # Cheap gate before the precise check: ``df.rdd`` forces full
    # physical planning outside AQE, which on deeply composed plans is
    # pure overhead when the input already arrives wide. ``inputFiles``
    # needs only analysis + the file index; a scan over >= target files
    # is at least that many splits (and every shuffle downstream of it
    # is already shuffle.partitions wide), so skip without planning.
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:  # pragma: no cover - exotic sources without file lists
        pass
    # Few/no input files: small scans or local relations — plans here
    # are shallow, so the precise partition count is cheap to compute.
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
