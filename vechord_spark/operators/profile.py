"""Table profiling — the corpus-card / data-health report.

Every 100 TB pipeline wave starts and ends with a profile: per-column
null fractions, distinct counts, extremes, and average widths, read by
humans (corpus cards, Dolma-style datasheet tables) and by gates (a
null-fraction jump on `text` fails the wave before training sees it).

Scale shape: ONE full-table aggregation computing every column's
statistics in the same pass — Spark evaluates N_cols x N_stats
aggregate expressions in a single map-side-combined HashAggregate, so
the corpus is scanned exactly once regardless of column count, and the
result is |columns| rows after a driver-side unpivot of the 1-row
aggregate (bounded by the schema, never the data).

``exact_distinct=True`` (the oracle-checked default here) uses
count(DISTINCT col), which Spark executes as one expand + two-phase
aggregate — exact but one extra exchange; at 100 TB flip to the
default approx_count_distinct (HLL++, rsd 5%) which stays single-pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-column profile: ``(column, n_rows, n_nulls, null_frac,
    n_distinct, min_str, max_str, avg_len)``.

    - ``n_distinct``: exact via count(DISTINCT) when
      ``exact_distinct`` (oracle-parity mode), else HLL++
      approx_count_distinct — the 100 TB default.
    - ``min_str`` / ``max_str``: min/max cast to string (numeric,
      string, and timestamp columns; NULL for arrays/binary, whose
      ordering is engine-specific).
    - ``avg_len``: string columns only — average character length over
      non-null values (the quick tokens-per-doc proxy).

    One aggregation row computed in a single scan, then unpivoted to
    |columns| rows with a literal stack() — no second job.
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else list(schema)
    unknown = [c for c in cols if c not in schema]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = schema[c]
        col = F.col(c)
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{c}"))
        distinct = (
            F.count_distinct(col) if exact_distinct else F.approx_count_distinct(col)
        )
        aggs.append(distinct.alias(f"__nd_{c}"))
        orderable = isinstance(dt, _NUMERIC + (T.StringType, T.TimestampType, T.DateType, T.BooleanType))
        if orderable:
            aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
            aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__min_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{c}"))
        if isinstance(dt, T.StringType):
            aggs.append(F.avg(F.length(col)).alias(f"__al_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__al_{c}"))

    one = df.agg(*aggs)
    # unpivot the 1-row aggregate into |columns| rows — stack() over
    # literal column references, evaluated on the single aggregate row
    stack_args = []
    for c in cols:
        stack_args.extend(
            [
                F.lit(c),
                F.col(f"__nn_{c}"),
                F.col(f"__nd_{c}"),
                F.col(f"__min_{c}"),
                F.col(f"__max_{c}"),
                F.col(f"__al_{c}"),
            ]
        )
    stacked = one.select(
        F.col("__n").alias("n_rows"),
        F.stack(
            F.lit(len(cols)),
            *stack_args,
        ).alias("column", "n_nulls", "n_distinct", "min_str", "max_str", "avg_len_raw"),
    )
    return stacked.select(
        "column",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.round(
            F.when(F.col("n_rows") > 0, F.col("n_nulls") / F.col("n_rows"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("null_frac"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_str",
        "max_str",
        F.round("avg_len_raw", 6).alias("avg_len"),
    )
