"""Point-in-interval (range) join via time-bucket binning.

Spark has no native range-join optimization: ``points JOIN intervals ON
ts BETWEEN start AND end`` plans as BroadcastNestedLoopJoin — O(n·m)
comparisons, a non-starter at scale. The standard fix (used by
Databricks' range-join hint and by every time-series engine) is
*binning*: quantize time into fixed buckets, explode each interval over
the buckets it overlaps, give each point its single containing bucket,
then equi-join on the bucket id and re-apply the exact range predicate.

Correctness: a point has exactly ONE bucket, and whenever
``start <= ts <= end`` then ``floor(start/B) <= floor(ts/B) <=
floor(end/B)``, so the point's bucket is always among the interval's
exploded buckets — no pair is missed, and no pair can match twice (the
point side contributes one bucket row), so no dedup pass is needed.

Scale: with ``bucket`` ≈ the max interval length, each interval explodes
into ≤ 2 rows, and the join is an ordinary shuffled equi-join on the
bucket id — shuffle volume O(n + 2m) instead of a nested-loop broadcast.
Hot buckets (event storms) are ordinary join skew, handled by AQE's
skew-join split.

The reference has no range join; this generalizes its as-of pattern
(operators/asof.py) to overlap semantics — the other half of the
time-series join story a 100 TB events pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def point_in_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start: str = "start",
    end: str = "end",
    ts: str = "ts",
    bucket_seconds: int | None = None,
    end_inclusive: bool = False,
) -> DataFrame:
    """Join each point to every interval containing it.

    ``intervals`` columns: ``start``/``end`` (timestamp) + payload;
    ``points``: ``ts`` (timestamp) + payload. Returns the inner join of
    all (interval, point) pairs with ``start <= ts < end`` (or ``<=``
    when ``end_inclusive``). Overlapping column names must be
    disambiguated by the caller beforehand.

    ``bucket_seconds`` defaults to the max interval length (one cheap
    scan of the intervals side) so each interval spans at most two
    buckets.
    """
    s, e, t = F.col(start), F.col(end), F.col(ts)
    if bucket_seconds is None:
        row = intervals.agg(
            F.max(F.unix_timestamp(e) - F.unix_timestamp(s)).alias("m")
        ).first()
        bucket_seconds = max(int(row["m"] or 1), 1)
    b = F.lit(int(bucket_seconds))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(s) / b),
                F.floor(F.unix_timestamp(e) / b),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.floor(F.unix_timestamp(t) / b))
    pred = (t >= s) & ((t <= e) if end_inclusive else (t < e))
    return iv.join(pt, on=["__bucket"], how="inner").where(pred).drop("__bucket")
