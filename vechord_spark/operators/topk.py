"""Scale-safe top-k + rank.

A bare ``row_number() OVER (ORDER BY ...)`` is a single-partition
window: every row shuffles to one task — the pattern that dies first at
cluster scale. For top-k results the right plan is

    orderBy(...).limit(k)      ->  TakeOrderedAndProject
                                   (bounded per-partition heap + driver
                                   merge, no global sort, no shuffle)

and only THEN a rank window over the k survivors (k rows, trivially
cheap). ``ranked_topk`` packages that pattern; every ranked query in
the engine goes through it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def ranked_topk(
    df: DataFrame,
    order: Sequence[Column],
    k: int,
    rank_alias: str = "rank",
) -> DataFrame:
    """Top-k rows by ``order`` (must be a total order for determinism —
    include an id tie-break) with a 1-based ``rank`` column."""
    top = df.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn(rank_alias, F.row_number().over(w))
