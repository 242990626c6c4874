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


def choose_salt_factor(
    large: DataFrame,
    on: str,
    sample_fraction: float = 0.05,
    max_salts: int = 64,
    seed: int = 42,
) -> int:
    """Pick a salt factor from the key distribution of ``large``.

    Profiles a SAMPLE (one aggregate over ~``sample_fraction`` of the
    rows — at 100 TB you never profile the full table to decide a plan
    knob) and asks: if the hottest key holds share ``s`` of the rows,
    how many of the session's shuffle partitions would its rows fill?
    ``ceil(s * shuffle_partitions)`` is the number of ways it must be
    split for the hot partition to shrink to the average — that is the
    salt factor, clamped to [1, max_salts]. Returns 1 (no salting
    needed; AQE's skew-join splitting handles mild skew) when the
    hottest key fits inside roughly one partition's fair share.
    """
    import math

    sampled = (
        large.sample(fraction=sample_fraction, seed=seed)
        if 0 < sample_fraction < 1.0
        else large
    )
    row = (
        sampled.groupBy(on)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n").alias("mx"), F.sum("__n").alias("tot"))
        .first()
    )
    if not row or not row["tot"]:
        return 1
    share = row["mx"] / row["tot"]
    parts = int(large.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    n = math.ceil(share * parts)
    return 1 if n <= 1 else min(n, max_salts)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    auto: bool = False,
) -> DataFrame:
    """Join ``large`` with ``small`` on column ``on`` with an ``n_salts``-way
    salt spreading each hot key across partitions.

    ``small`` is replicated ``n_salts`` x — use when it's broadcast-sized
    per-key but the join key distribution is too skewed for a plain
    shuffle join. Output columns = the plain join's.

    ``auto=True`` ignores ``n_salts`` and derives the factor from a
    sampled profile of ``large`` (``choose_salt_factor``); a factor of 1
    degrades to the plain join — zero replication cost on well-behaved
    keys, so the hook is safe to leave on for the 100 TB events-by-user
    case where only SOME days have a hot key.
    """
    if auto:
        n_salts = choose_salt_factor(large, on)
    if n_salts <= 1:
        return large.join(small, on, how)
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
