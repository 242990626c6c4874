"""Ordered-funnel analysis in one shuffle.

The textbook funnel (stage N+1 must happen strictly after the user's
first qualifying stage-N event) is usually written as chained
aggregate-join stages — N shuffles plus joins. The scale shape is ONE
exchange: group events by user, sort each user's (ts, type) list, and
fold it left-to-right with a higher-order ``aggregate`` whose
accumulator is (stage reached, timestamp of the stage's first
qualifying event). State per user is one struct; work per user is
linear in their events; everything stays in JVM expressions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Per-user funnel depth: ``(user, stage_reached)`` where
    ``stage_reached`` = k means the user's first qualifying event for
    every stage <= k exists, each strictly after the previous stage's.
    Users with zero stage-1 events return stage_reached = 0.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    # Only stage-relevant events matter to the fold; filtering first
    # pushes the IN-predicate to the file scan and shrinks the single
    # user_id exchange. Per-user state after the shuffle is one sorted
    # list of that user's qualifying events — bounded by the user's
    # own activity, never the corpus.
    df = df.filter(F.col(type_col).isin(list(stages)))
    events = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")))
    )

    def step(acc: Column, ev: Column) -> Column:
        conds = None
        # advance at most one stage per event: if at stage i-1 and this
        # event is stages[i] strictly after acc.t, move to stage i
        for i, stage_name in enumerate(stages):
            hit = (acc["stage"] == i) & (ev["et"] == stage_name)
            if i > 0:
                hit = hit & (ev["ts"] > acc["t"])
            advanced = F.struct(
                F.lit(i + 1).alias("stage"), ev["ts"].alias("t")
            )
            conds = F.when(hit, advanced) if conds is None else conds.when(hit, advanced)
        return conds.otherwise(acc)

    zero = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("t")
    )
    folded = F.aggregate(events, zero, step)
    return (
        df.groupBy(F.col(user_col).alias("user_id"))
        .agg(folded["stage"].alias("stage_reached"))
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """One-row stage counts: users reaching stage >= k for each k."""
    depth = funnel_stages(df, user_col, ts_col, type_col, stages)
    aggs = [
        F.sum((F.col("stage_reached") >= i + 1).cast("long")).alias(f"n_{name}")
        for i, name in enumerate(stages)
    ]
    return depth.agg(*aggs)


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity day,
    counted per (cohort_day, day_offset) of later activity.

    Scale shape: dedup to (user, active_day) (one keyed exchange —
    map-side combine first, so the shuffle carries at most one row per
    user-day), derive each user's cohort with a user-keyed min (reuses
    the same partitioning), join activity to cohorts user-keyed, and
    aggregate to the matrix. Row counts only ever shrink; nothing is
    pairwise.
    """
    days = (
        df.select(
            F.col(user_col).alias("user_id"), F.to_date(F.col(ts_col)).alias("day")
        )
        .distinct()
    )
    cohorts = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(cohorts, "user_id")
        .groupBy(
            "cohort_day", F.datediff("day", "cohort_day").alias("day_offset")
        )
        # rows are distinct (user, day): count(*) IS distinct users
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
