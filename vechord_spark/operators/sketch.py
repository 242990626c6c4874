"""Sketch-based approximate analytics with exact-verified gates.

At 100 TB, exact DISTINCT / quantile / top-k answers force either a
giant shuffle keyed on the value space or executor-memory buffering; the
production answers are mergeable sketches (HLL, KLL/GK, space-saving)
whose partial states combine associatively so the whole computation is
one map-side pass + a tiny merge. The reference engine has no sketch
surface at all (it delegates aggregation to Postgres); this module adds
the three workhorse shapes a corpus pipeline needs, each paired with an
exact gate so the driver's DuckDB oracle can still hash-verify a
deterministic output (the same exact-gates-approximate pattern as
``ivf_recall`` for ANN):

- :func:`approx_distinct_gate` — HyperLogLog++ cardinality
  (``approx_count_distinct``) checked against exact per-group counts.
- :func:`heavy_hitters` — two-pass top-k: bounded-memory per-partition
  space-saving candidates, then an EXACT recount of only the candidate
  union. The output is exact (and thus oracle-matchable) whenever every
  true heavy hitter survives pass 1, which the space-saving guarantee
  gives for any item with global frequency > N/capacity.
- :func:`quantile_rank_gate` — ``percentile_approx`` (mergeable GK
  sketch) verified by its actual contract: RANK error ≤ 1/accuracy,
  measured against the data, alongside the exact interpolated quantile.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def approx_distinct_gate(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rsd: float = 0.01,
    tolerance: float = 0.05,
) -> DataFrame:
    """Per-group distinct cardinality: exact count + HLL++ estimate +
    a ``within_tol`` flag (relative error ≤ ``tolerance``).

    The HLL state is a fixed-size register array that merges across
    partitions — at 100 TB the estimate costs one map-side pass, while
    the exact ``countDistinct`` forces a shuffle on (group, value).
    Emitting BOTH here is the correctness gate; a production rollup
    keeps only the estimate. ``rsd=0.01`` against ``tolerance=0.05``
    leaves a 5x margin, so the flag is deterministically true and the
    whole row hash-verifies against an exact SQL oracle.
    """
    g = F.col(group_col)
    return (
        df.groupBy(g)
        .agg(
            F.countDistinct(value_col).alias("n_exact"),
            F.approx_count_distinct(value_col, rsd).alias("__est"),
        )
        .select(
            g,
            F.col("n_exact"),
            (
                F.abs(F.col("__est") - F.col("n_exact"))
                <= F.lit(tolerance) * F.col("n_exact")
            ).alias("within_tol"),
        )
    )


def _space_saving_partition(capacity: int, col: str):
    """mapInPandas stage: per-partition heavy-hitter summary.

    Misra-Gries-style MERGEABLE summary (Agarwal et al., "Mergeable
    Summaries"), vectorized per Arrow batch (guide §4.2): each batch
    contributes its exact ``value_counts`` (C speed), merged into the
    running summary by index-aligned add; whenever the summary exceeds
    4x ``capacity`` distinct keys it is compacted by subtracting the
    (capacity+1)-th largest count from every entry and dropping
    non-positive residuals — the classic MG decrement, vectorized.
    Every item with partition-local frequency > n_p/(capacity+1) ends
    with a positive residual (total decrement applied to any single
    item is at most n_p/(capacity+1)), so the retention guarantee is
    STRICTLY stronger than the space-saving variant this replaces
    (> n_p/capacity) and the two-pass result is identical wherever the
    exactness condition holds. The replaced row-at-a-time loop ran an
    O(capacity) min-scan eviction per arrival — 115 s at sf1 where the
    key space (15 k users) exceeds capacity and every arrival evicts;
    the eviction path never fired at sf0.1 (1.5 k keys < capacity).
    """

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        def _compact(s: "pd.Series") -> "pd.Series":
            # subtract the (capacity+1)-th largest count; <=capacity
            # survive with positive residuals
            thresh = s.nlargest(capacity + 1).iloc[-1]
            s = s - thresh
            return s[s > 0]

        summary = None
        dtype = None
        for pdf in batches:
            vals = pdf[col].dropna()
            dtype = vals.dtype
            if vals.empty:
                continue
            vc = vals.value_counts()
            summary = vc if summary is None else summary.add(vc, fill_value=0)
            if len(summary) > 4 * capacity:
                summary = _compact(summary)
        if summary is None:
            yield pd.DataFrame({col: pd.Series([], dtype=dtype or "object")})
            return
        if len(summary) > capacity:
            summary = _compact(summary)
        yield pd.DataFrame({col: summary.index.to_series(name=col).reset_index(drop=True)})

    return gen


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    capacity: int = 4096,
    tie_break: bool = True,
) -> DataFrame:
    """Exact top-``k`` most frequent values via sketch-then-verify.

    Pass 1 runs a bounded-memory space-saving summary PER PARTITION
    (``capacity`` tracked items — no shuffle, no full vocabulary in
    memory) and unions the tracked keys: by the space-saving guarantee
    plus pigeonhole across partitions, any value with GLOBAL frequency
    > N/capacity is in the union. Pass 2 exactly recounts only the
    candidate set (broadcast semi-filter, one small shuffle) and takes
    the top-k — so the result is exact whenever the true k-th count
    exceeds N/capacity, which makes it oracle-verifiable while the
    memory/shuffle profile stays sketch-shaped. Compare
    ``quality.top_tokens``: same answer, but its exchange carries the
    FULL vocabulary's partial counts; this one carries only
    ~partitions x capacity candidates.
    """
    values = df.select(F.col(value_col).alias("v"))
    candidates = values.mapInPandas(
        _space_saving_partition(capacity, "v"),
        "v " + df.schema[value_col].dataType.simpleString(),
    )
    # candidate union is ~partitions x capacity rows — broadcast it;
    # nothing ever collects to the driver
    counted = (
        values.join(F.broadcast(candidates.distinct()), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    order = [F.desc("n_occurrences")] + ([F.asc("v")] if tie_break else [])
    return (
        counted.orderBy(*order)
        .limit(k)
        .select(F.col("v").alias(value_col), "n_occurrences")
    )


def quantile_rank_gate(
    df: DataFrame,
    value: Column | str,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Ungrouped quantiles: exact interpolated value + the
    ``percentile_approx`` sketch verified by its RANK-error contract.

    The GK-style sketch guarantees the returned value's rank is within
    ``n/accuracy`` of the target rank — that (not value distance) is
    the right gate, so it is measured directly: the fraction of rows ≤
    the approximate value must sit within ``q ± 1/accuracy`` (half-open
    vs closed rank conventions add one more 1/n slack). One row per
    quantile: ``(quantile, p_exact, rank_ok)``; the exact column is the
    gate's cost, dropped at 100 TB where the sketch's one map-side pass
    is the whole job.
    """
    v = F.col(value) if isinstance(value, str) else value
    vals = df.select(v.cast("double").alias("__v")).filter(F.col("__v").isNotNull())
    qs = [float(q) for q in quantiles]
    agg = vals.agg(
        F.percentile(F.col("__v"), F.lit(qs)).alias("__ex"),
        F.percentile_approx(
            F.col("__v"), F.lit(qs), F.lit(accuracy)
        ).alias("__ap"),
        F.count(F.lit(1)).alias("__n"),
    )
    per_q = agg.select(
        F.posexplode(F.arrays_zip("__ex", "__ap")).alias("__i", "__z"),
        "__n",
    ).select(
        F.element_at(F.lit(qs), F.col("__i") + 1).alias(
            "quantile"
        ),
        F.round(F.col("__z.__ex"), 6).alias("p_exact"),
        F.col("__z.__ap").alias("__approx"),
        "__n",
    )
    ranked = per_q.join(
        vals.crossJoin(F.broadcast(per_q.select("quantile", "__approx")))
        .groupBy("quantile")
        .agg(
            (F.sum((F.col("__v") <= F.col("__approx")).cast("long")) / F.count(F.lit(1))).alias(
                "__frac"
            )
        ),
        "quantile",
    )
    slack = 1.0 / accuracy
    return ranked.select(
        "quantile",
        "p_exact",
        (
            (F.col("__frac") >= F.col("quantile") - F.lit(slack) - 1.0 / F.col("__n"))
            & (F.col("__frac") <= F.col("quantile") + F.lit(slack) + 1.0 / F.col("__n"))
        ).alias("rank_ok"),
    ).orderBy("quantile")
