"""Hyperplane (sign-random-projection) LSH for cosine similarity.

The LSH-bucketed companion to IVF (operators/ivf.py): rows whose
vectors fall on the same side of ``n_planes`` seeded random hyperplanes
share an integer bucket key. Cosine-similar vectors collide with
probability (1 - theta/pi)^n_planes, so

- near-duplicate search restricts pair scoring to same-bucket pairs
  (feed ``bucket_assignments`` to dedup.embedding_near_duplicates), and
- ANN search scans only the query's bucket (+ optional multi-probe
  neighbors at Hamming distance 1).

Everything is a pure SQL expression over the broadcast plane matrix —
one scan, no shuffle, no Python in the scoring path.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from pyspark.sql import DataFrame, functions as F


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _bucket_expr(vec_col: str, planes: np.ndarray):
    from vechord_spark.functions.vector import dot_product

    bits = [
        F.when(dot_product(vec_col, [float(x) for x in p]) >= 0, F.lit(1 << i))
        .otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total.cast("int")


def bucket_assignments(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """``(id_col, bucket)`` — the blocking table for near-dup scoring
    (dedup.embedding_near_duplicates ``bucketer``)."""
    planes = _planes(dim, n_planes, seed)
    return df.select(
        F.col(id_col), _bucket_expr(vec_col, planes).alias("bucket")
    )


class HyperplaneLsh:
    """Seeded hyperplane family + bucket-pruned search."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 42) -> None:
        self.dim = dim
        self.n_planes = n_planes
        self.planes = _planes(dim, n_planes, seed)

    def with_buckets(self, df: DataFrame, vec_col: str) -> DataFrame:
        return df.withColumn("bucket", _bucket_expr(vec_col, self.planes))

    def query_bucket(self, query: Sequence[float]) -> int:
        q = np.asarray(query, dtype=np.float64)
        bits = (self.planes @ q >= 0).astype(int)
        return int(sum(b << i for i, b in enumerate(bits)))

    def probe_buckets(self, query: Sequence[float], multi_probe: int = 0) -> list[int]:
        """The query's bucket plus all buckets at Hamming distance <=
        ``multi_probe`` (flip the least-confident planes first is the
        classic refinement; exhaustive flips are fine at small
        n_planes)."""
        base = self.query_bucket(query)
        buckets = {base}
        if multi_probe >= 1:
            for i in range(self.n_planes):
                buckets.add(base ^ (1 << i))
        if multi_probe >= 2:
            for i in range(self.n_planes):
                for j in range(i + 1, self.n_planes):
                    buckets.add(base ^ (1 << i) ^ (1 << j))
        return sorted(buckets)

    def search(
        self,
        df: DataFrame,
        vec_col: str,
        query: Sequence[float],
        k: int = 10,
        multi_probe: int = 1,
        distance: str = "cos",
        select: Sequence[str] | None = None,
        tie_break: str | None = None,
    ) -> DataFrame:
        """Bucket-pruned approximate k-NN: filter to the probe buckets,
        exact-score the survivors. With the table written
        ``partitionBy("bucket")`` the filter is partition pruning."""
        from vechord_spark.operators.knn import knn

        probes = self.probe_buckets(query, multi_probe)
        pruned = self.with_buckets(df, vec_col).filter(F.col("bucket").isin(probes))
        return knn(
            pruned,
            vec_col,
            list(query),
            k=k,
            distance=distance,
            select=select,
            tie_break=tie_break,
        )
