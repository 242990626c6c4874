"""Z-order layout (plans/zorder.py): interleave math + the pruning
property — per-file envelopes tight in BOTH dimensions."""

import glob

import pytest
from pyspark.sql import functions as F

from vechord_spark.plans.zorder import interleave_bits, write_zordered, zorder_key


def test_interleave_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "a long, b long"
    )
    got = [
        r.z
        for r in df.select(
            interleave_bits(F.col("a"), F.col("b"), bits=4).alias("z")
        ).collect()
    ]
    # morton(a,b): a bits at even positions, b bits at odd
    def morton(a, b):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == [morton(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)]]
    assert got[4] == morton(3, 5) == 0b100111


def test_zorder_locality_beats_linear_sort(spark, tmp_path):
    """The point of the curve: with a LINEAR sort on a, per-file b
    ranges span ~everything; z-ordered files are tight in both
    dimensions, so min-max stats prune on either predicate."""
    n = 20_000
    df = spark.range(n).select(
        (F.col("id") % 141).alias("a"),
        ((F.col("id") * 2654435761) % 139).alias("b"),
    )

    zpath = str(tmp_path / "zord")
    write_zordered(df, zpath, "a", "b", n_files=16, bits=8)
    lpath = str(tmp_path / "linear")
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(lpath)

    def mean_span(path, col):
        spans = []
        for f in glob.glob(path + "/part-*.parquet"):
            r = (
                spark.read.parquet(f)
                .agg((F.max(col) - F.min(col)).alias("s"))
                .first()
            )
            spans.append(r["s"])
        return sum(spans) / len(spans)

    # linear layout: tight in a, full-range in b
    assert mean_span(lpath, "a") < 30
    assert mean_span(lpath, "b") > 120
    # z-order: meaningfully tight in BOTH (a rectangle, not a stripe)
    za, zb = mean_span(zpath, "a"), mean_span(zpath, "b")
    assert za < 100 and zb < 100, (za, zb)
    assert za + zb < 30 + 125  # strictly better total envelope


def test_bounds_reusable_for_incremental(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("a"), (999 - F.col("id")).alias("b")
    )
    keyed, bounds = zorder_key(df, "a", "b", bits=8)
    from vechord_spark.plans.zorder import with_zorder_key

    again = with_zorder_key(df, "a", "b", bounds, bits=8)
    assert [r["__z"] for r in keyed.orderBy("a").collect()] == [
        r["__z"] for r in again.orderBy("a").collect()
    ]


def test_interleave_validates():
    with pytest.raises(ValueError):
        interleave_bits(F.lit(1), F.lit(1), bits=0)


def test_registry_optimize_zorder(spark, tmp_path):
    from pyspark.sql import functions as F2

    from vechord_spark.registry import VechordRegistry
    from vechord_spark.spec import Column as C, TableSpec

    reg = VechordRegistry("zz", str(tmp_path), spark)
    reg.register(
        TableSpec("ev", [C("a", "long", primary_key=True), C("b", "long")])
    )
    df = spark.range(5000).select(
        F2.col("id").alias("a"), ((F2.col("id") * 2654435761) % 997).alias("b")
    )
    reg.append("ev", df)
    stats = reg.optimize_zorder("ev", "a", "b", n_files=8, bits=8)
    assert stats["rows"] == 5000 and stats["files_after"] >= 1
    back = reg.load("ev")
    assert back.count() == 5000
    assert sorted(r.a for r in back.collect()) == list(range(5000))


def test_registry_optimize_zorder_validates(spark, tmp_path):
    import pytest as _pytest

    from vechord_spark.errors import SchemaError
    from vechord_spark.registry import VechordRegistry
    from vechord_spark.spec import Column as C, TableSpec

    reg = VechordRegistry("zv", str(tmp_path), spark)
    reg.register(TableSpec("t", [C("a", "long", primary_key=True)]))
    with _pytest.raises(SchemaError):
        reg.optimize_zorder("t", "a", "nope")
