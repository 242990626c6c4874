"""Z-order (Morton) clustering for multi-column file pruning.

Parquet scans prune files/row-groups with min-max statistics, but a
layout sorted by ONE column only helps predicates on that column — a
filter on the second column still touches every file. Interleaving the
bits of both columns (the Morton curve) gives a single sort key whose
contiguous ranges are small RECTANGLES in (a, b) space, so every file's
min-max envelope is tight in BOTH dimensions and predicates on either
column (or both) prune — the layout trick behind Delta/Iceberg
``OPTIMIZE ZORDER BY``.

Everything is Column arithmetic: values are min-max normalized into
``bits``-bit grid cells (one tiny agg for the bounds), bits interleave
with shift/or chains in whole-stage codegen, and the write is
``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` — one range
shuffle, the same cost as a plain sorted write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave two ``bits``-bit non-negative ints: result bit
    ``2i`` is bit ``i`` of ``a``, bit ``2i+1`` is bit ``i`` of ``b``.
    A shift/or expression chain — 2*bits terms, all codegen."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    one = F.lit(1).cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(one), 2 * i + 1)
        )
    return out


def zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16
) -> tuple[DataFrame, dict]:
    """Append a ``__z`` Morton key over two numeric columns.

    Bounds come from one min/max aggregation (a tiny job); each value
    is normalized into a ``2^bits`` grid cell. Returns (df + __z,
    bounds) — bounds are reusable for incremental writes so old and new
    files share the same grid.
    """
    r = df.agg(
        F.min(col_a).alias("a_min"), F.max(col_a).alias("a_max"),
        F.min(col_b).alias("b_min"), F.max(col_b).alias("b_max"),
    ).first()
    bounds = {k: float(r[k] if r[k] is not None else 0.0) for k in
              ("a_min", "a_max", "b_min", "b_max")}
    return with_zorder_key(df, col_a, col_b, bounds, bits), bounds


def with_zorder_key(
    df: DataFrame, col_a: str, col_b: str, bounds: dict, bits: int = 16
) -> DataFrame:
    cells = float((1 << bits) - 1)

    def cell(col: str, lo: float, hi: float) -> Column:
        span = hi - lo
        if span <= 0:
            return F.lit(0).cast("long")
        return F.least(
            F.lit(int(cells)).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(span) * cells),
            ),
        )
    a = cell(col_a, bounds["a_min"], bounds["a_max"])
    b = cell(col_b, bounds["b_min"], bounds["b_max"])
    return df.withColumn("__z", interleave_bits(a, b, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 16,
) -> dict:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Morton curve of (col_a, col_b): range-partition + local sort on the
    z key, key dropped from storage. Returns the grid bounds for
    incremental rewrites."""
    keyed, bounds = zorder_key(df, col_a, col_b, bits)
    (
        keyed.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return bounds
