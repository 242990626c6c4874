"""Deterministic sampling for training-data pipelines.

``df.sample()`` draws from a seeded RNG whose stream depends on
partitioning — re-running after a repartition (or on another engine)
yields a DIFFERENT subset, which breaks reproducible training mixes and
A/B data ablations. Hash-based sampling keys the keep/drop decision on
``md5(salt || id)`` alone: the same row is in or out regardless of
partition layout, cluster size, or engine, membership is stable across
incremental runs (new rows don't reshuffle old decisions — the property
web-scale corpus pipelines rely on for incremental crawls), and the
DuckDB oracle can verify the exact row set.

Scale shape: a single narrow ``Filter`` over the scan — no shuffle, no
state; Catalyst pushes the projection down and the md5 stays in
whole-stage codegen. Changing ``salt`` draws an independent sample;
nested samples (rate 0.5 then 0.1 with the same salt) are subsets of
each other, which gives consistent train/dev splits at any ratio.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, functions as F

# 8 hex chars of md5 -> uniform integer in [0, 2^32); md5 is the one
# hash bit-identical across Spark and the DuckDB oracle.
HASH_SPACE = 1 << 32


def hash_fraction(id_col: str, salt: str = "") -> Column:
    """Uniform pseudo-random long in [0, 2^32) keyed only on the row id.

    DuckDB-oracle equivalent:
    ``CAST(('0x' || substr(md5(<salt> || CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)``.
    """
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(round(rate * HASH_SPACE))


def deterministic_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, decided by ``md5(salt || id)`` — stable
    under repartitioning, engine changes, and incremental appends."""
    return df.filter(hash_fraction(id_col, salt) < F.lit(_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum sampling rates (the training-mix primitive: e.g.
    keep 50% of wiki, 5% of crawl). Strata not in ``rates`` get
    ``default_rate``. Same single-filter scale shape — the stratum
    threshold is a CASE expression, not a join."""
    case: Column | None = None
    for value, rate in rates.items():
        t = F.lit(_threshold(rate))
        case = (
            F.when(F.col(strata_col) == value, t)
            if case is None
            else case.when(F.col(strata_col) == value, t)
        )
    threshold = (
        case.otherwise(F.lit(_threshold(default_rate)))
        if case is not None
        else F.lit(_threshold(default_rate))
    )
    return df.filter(hash_fraction(id_col, salt) < threshold)
