"""Loaders for the driver-provided synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under a scale-factor dir.

``events.parquet`` has shipped with two physical types for ``ts``
across driver revisions: INT64 TIMESTAMP(NANOS) (which Spark's parquet
reader rejects natively) and plain ``timestamp[us]`` (which it reads
fine).  We read natively first and only fall back to the legacy
nanos-as-long path — rebuilding a microsecond timestamp with exact
integer division — when the loaded ``ts`` dtype is actually ``bigint``.
A timestamp-typed column passes through untouched, so the loader is
correct for either vintage of the file and never mutates session conf
on the common path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except Exception as exc:  # noqa: BLE001 - inspect & re-raise below
        # Legacy driver files store INT64 TIMESTAMP(NANOS), which Spark
        # rejects unless nanosAsLong is set. Only then flip the conf.
        if "nanos" not in str(exc).lower():
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)


# (session, path) -> base DataFrame memo. ``spark.read.parquet`` is a
# driver-side file listing + footer/schema read (~0.2 s per call via
# py4j); a suite run issues ~400 of them over the SAME ten immutable
# files, which profiled as the single largest fixed cost of query
# *construction* (guide §5: the driver should do almost no data work;
# §6: repeated file listing). The memo stores only the unresolved scan
# plan — no rows are cached, every execution still reads the parquet —
# so bench/oracle runs keep computing from the input files. Keyed on
# the live session object (a restarted session re-lists) and the path.
_TABLE_MEMO: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    ent = _TABLE_MEMO.get(path)
    if ent is not None and ent[0] is spark:
        return ent[1]
    df = _read_parquet(spark, path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos-as-long fallback: rebuild a microsecond timestamp with
        # exact integer division (double division drifts by ulps at
        # epoch-nanos magnitudes).
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)"))
        )
    _TABLE_MEMO[path] = (spark, df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
