"""Distributed as-of (point-in-time) join.

Spark has no native ASOF JOIN; the naive rendition — a range join
``l.ts >= r.ts`` plus a per-row max — explodes to O(|L|·|R|) pairs per
key before pruning, which dies at scale. This operator uses the
scalable union-tag shape instead:

1. tag both sides and UNION them (right rows sort before left rows at
   equal timestamps, so backward matches are inclusive);
2. one window per key, ordered by (time, side), carries the LAST seen
   right-side row forward (``last(..., ignorenulls)`` over an
   unbounded-preceding frame — Spark evaluates this in a single pass
   per partition);
3. keep the left rows; the carried struct is the as-of match.

Cost: ONE shuffle on the key columns, linear scan per partition —
the plan that survives 100 TB of events. Rows with no prior match
keep NULL matches (left-join semantics). ``tolerance`` nulls out
matches older than the given seconds, like pandas ``merge_asof``.

Oracle: DuckDB's native ``ASOF LEFT JOIN`` (suite
``events_asof_join``) — the semantics cross-check.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] | str = (),
    right_prefix: str = "asof_",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For every left row, the most recent right row with
    ``right.on <= left.on`` within the same ``by`` group.

    Returns all left columns plus each non-key right column as
    ``{right_prefix}{name}`` (NULL when no match). Matching is
    backward-inclusive (a right row at the exact same time matches).
    """
    by = [by] if isinstance(by, str) else list(by)
    rcols = [c for c in right.columns if c != on and c not in by]

    match_struct = F.struct(
        F.col(on).alias("__t"), *[F.col(c).alias(c) for c in rcols]
    )
    r2 = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("__side"),
        match_struct.alias("__match"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != on and c not in by],
    )
    l2 = left.select(
        *by,
        F.col(on).alias(on),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r2.schema["__match"].dataType).alias("__match"),
        *[F.col(c) for c in left.columns if c != on and c not in by],
    )
    unioned = r2.select(*l2.columns).unionByName(l2)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__asof", F.last("__match", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    if tolerance_seconds is not None:
        within = (
            F.col(on).cast("double") - F.col("__asof.__t").cast("double")
            <= F.lit(float(tolerance_seconds))
        )
        carried = carried.withColumn(
            "__asof", F.when(within, F.col("__asof"))
        )

    out_cols = (
        [F.col(c) for c in by]
        + [F.col(on)]
        + [F.col(c) for c in left.columns if c != on and c not in by]
        + [F.col(f"__asof.{c}").alias(f"{right_prefix}{c}") for c in rcols]
        + [F.col("__asof.__t").alias(f"{right_prefix}{on}")]
    )
    return carried.select(*out_cols)
