"""Skew mitigation utilities.

AQE's skew-join splitting (enabled by session.get_spark) handles most
runtime skew; explicit salting remains the tool when one join key
dominates so heavily that even split partitions overwhelm an executor
(the classic hot-document / hot-term case in postings joins at 100 TB).

``salted_join`` implements replicate-and-salt: the skewed (large) side
gets a random salt in [0, n); the small side is replicated n times, one
copy per salt value; joining on (key, salt) spreads each hot key over n
partitions. Correctness is unchanged — every (large, small) pair meets
exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` with ``small`` on column ``on`` with an ``n_salts``-way
    salt spreading each hot key across partitions.

    ``small`` is replicated ``n_salts`` x — use when it's broadcast-sized
    per-key but the join key distribution is too skewed for a plain
    shuffle join. Output columns = the plain join's.
    """
    salted_large = large.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_small = small.select("*", salts)
    return (
        salted_large.join(salted_small, [on, "__salt"], how)
        .drop("__salt")
    )


def key_skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Per-key row counts for the heaviest keys plus their share of the
    table — the diagnostic that decides between AQE (mild skew) and
    salting (pathological skew)."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), F.col(key).asc())
        .limit(top_n)
        .withColumn("share", F.round(F.col("n_rows") / F.lit(float(total)), 6))
    )
