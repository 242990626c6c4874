"""End-to-end: load documents -> chunk -> embed -> search.

The Spark rendition of the reference's examples/simple.py:18-46
(define Document/Chunk tables, run a two-step pipeline, vector-search
the chunks). Run with:

    python examples/simple.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vechord_spark.plans.dynamic import DynamicPipeline
from vechord_spark.registry import VechordRegistry
from vechord_spark.session import get_spark
from vechord_spark.sources.testdata import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("simple-example")
    registry = VechordRegistry("simple", tempfile.mkdtemp(), spark)

    pipe = DynamicPipeline.from_steps(
        registry,
        [
            {"kind": "chunker", "provider": "regex", "args": {"size": 256, "overlap": 32}},
            {"kind": "embedder", "provider": "hash", "args": {"dim": 64}},
            {"kind": "keyword", "provider": "bm25"},
        ],
    )

    docs = load_table(spark, SF_DIR, "documents").limit(100)
    counts = pipe.run_index(docs)
    print(f"indexed: {counts}")

    for query in ("fast data processing", "language model training"):
        hits = pipe.run_search(query, topk=5)
        print(f"\n--- {query!r}")
        for row in hits.collect():
            print(f"  #{row.rank}  uid={row.uid}  rrf={row.rrf_score:.4f}")

    spark.stop()


if __name__ == "__main__":
    main()
