"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hybrid-search pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the scale extensions) with DuckDB oracles — see
vechord_spark/suite.py for the implementations.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: hybrid retrieval (vector k-NN ∪ BM25 -> RRF
    fusion) over the sf0.001 corpus, joined back to document payloads —
    the Spark rendition of the reference's run_search pipeline
    (vechord/pipeline.py:394-442)."""
    from pyspark.sql import functions as F

    from vechord_spark.suite import QUERIES
    from vechord_spark.sources.testdata import load_table

    sf_dir = "/root/testdata/sf0.001"
    fused = QUERIES["hybrid_rrf"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return (
        fused.join(F.broadcast(docs), "doc_id", "left")
        .select("doc_id", "rank", "rrf_score", "lang", "source", "text")
        .orderBy("rank")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from vechord_spark.suite import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from vechord_spark.suite import ORACLES

    return dict(ORACLES)
