"""vechord_spark — a PySpark-native analytics/retrieval engine.

Re-expresses the capabilities of tensorchord/vechord (a PostgreSQL+VectorChord
RAG framework) as an idiomatic Spark DataFrame engine:

- declarative typed table schemas (``spec``),
- a namespace/table registry over Parquet (``registry``),
- top-k search operators: vector k-NN, multi-vector MaxSim, BM25
  (``operators.knn``, ``operators.maxsim``, ``operators.bm25``),
- rank fusion / dedup / rerank (``operators.fusion``),
- chunkers, tokenizers, text analysis (``operators.chunk``, ``functions.text``),
- near-duplicate detection at scale (``operators.dedup``),
- IVF index build for ANN at scale (``operators.ivf``),
- graph (entity/relation) ops (``operators.graph``),
- retrieval evaluation metrics (``operators.evaluate``),
- pipeline runtime with staged atomic publish (``plans.pipeline``).

Everything is DataFrame-first: operators are pure DataFrame -> DataFrame
functions so Catalyst can push filters, prune columns, and pick join
strategies; Python UDFs appear only where a Python library is unavoidable.
"""

from vechord_spark.session import get_spark
from vechord_spark.spec import (
    AnyOf,
    Column,
    Keyword,
    KeywordIndex,
    MultiVector,
    MultiVectorIndex,
    SparseVector,
    TableSpec,
    UniqueIndex,
    Vector,
    VectorIndex,
)
from vechord_spark.registry import VechordRegistry


def __getattr__(name):
    # heavier public entry points resolved lazily so `import
    # vechord_spark` stays cheap on executors
    if name == "HashEmbedder":
        from vechord_spark.functions.embed import HashEmbedder

        return HashEmbedder
    if name == "DynamicPipeline":
        from vechord_spark.plans.dynamic import DynamicPipeline

        return DynamicPipeline
    if name == "VechordPipeline":
        from vechord_spark.plans.pipeline import VechordPipeline

        return VechordPipeline
    if name == "spread":
        from vechord_spark.parallel import spread

        return spread
    if name == "write_bucketed":
        from vechord_spark.plans.bucketing import write_bucketed

        return write_bucketed
    if name == "TableLog":
        from vechord_spark.plans.commitlog import TableLog

        return TableLog
    raise AttributeError(f"module 'vechord_spark' has no attribute {name!r}")


__all__ = [
    "AnyOf",
    "Column",
    "DynamicPipeline",
    "HashEmbedder",
    "Keyword",
    "KeywordIndex",
    "MultiVector",
    "MultiVectorIndex",
    "SparseVector",
    "TableLog",
    "TableSpec",
    "UniqueIndex",
    "Vector",
    "VectorIndex",
    "VechordPipeline",
    "VechordRegistry",
    "get_spark",
    "spread",
    "write_bucketed",
]

__version__ = "0.1.0"
