"""Retrieval-quality + throughput harness: Pass@k and QPS per search
variant, plus ranking metrics.

The Spark rendition of the reference's measurement harness
(examples/anthropic.py:205-254: Pass@{5,10} + QPS over search variants;
examples/beir.py:139-149: NDCG/recall printouts). Queries are derived
from sampled documents (their own leading tokens), so each query's
ground truth is the chunks of its source document.

    python examples/eval_harness.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from vechord_spark.plans.dynamic import DynamicPipeline
from vechord_spark.registry import VechordRegistry
from vechord_spark.session import get_spark
from vechord_spark.sources.testdata import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
N_DOCS = 200
N_QUERIES = 20
TOPK = 10


def main() -> None:
    spark = get_spark("eval-harness")
    registry = VechordRegistry("harness", tempfile.mkdtemp(), spark)
    pipe = DynamicPipeline.from_steps(
        registry,
        [
            {"kind": "chunker", "provider": "regex", "args": {"size": 512, "overlap": 64}},
            {"kind": "embedder", "provider": "hash", "args": {"dim": 64}},
            {"kind": "keyword", "provider": "bm25"},
        ],
    )
    docs = load_table(spark, SF_DIR, "documents").limit(N_DOCS)
    counts = pipe.run_index(docs)
    print(f"indexed {counts}")
    registry.build_keyword_index("chunk")

    # queries: the first 8 tokens of every 10th document; truth = that
    # document's chunk uids
    sampled = docs.filter(F.col("doc_id") % 10 == 0).limit(N_QUERIES).collect()
    queries = [
        (r.doc_id, " ".join(r.text.split()[:8]))
        for r in sampled
    ]
    truth = {
        r.doc_id: {c.uid for c in
                   registry.select_by("chunk", {"doc_id": r.doc_id}, fields=["uid"]).collect()}
        for r in sampled
    }

    def variant_vector(q: str):
        return registry.search_by_vector("chunk", pipe.embedder.embed_query(q), topk=TOPK)

    def variant_keyword(q: str):
        return registry.search_by_keyword("chunk", q, topk=TOPK)

    def variant_hybrid(q: str):
        return pipe.run_search(q, topk=TOPK)

    print(f"\n{'variant':<14} {'Pass@10':>8} {'QPS':>8}")
    for name, fn in [
        ("vector", variant_vector),
        ("keyword", variant_keyword),
        ("hybrid", variant_hybrid),
    ]:
        hits = 0
        t0 = time.perf_counter()
        for doc_id, q in queries:
            got = {r.uid for r in fn(q).collect()}
            if got & truth[doc_id]:
                hits += 1
        wall = time.perf_counter() - t0
        print(f"{name:<14} {hits / len(queries):>8.2f} {len(queries) / wall:>8.2f}")

    # the production eval shape: the WHOLE query stream answered from
    # one scan per modality via the batch wrappers (BASELINE.md round
    # 13 measures 25-42x batch-over-loop at N=64). Results are
    # identical to the loops above by the pinned batch==loop contract.
    def batch_hits(out_df, id_col="uid"):
        per_q: dict[int, set] = {}
        for r in out_df.collect():
            per_q.setdefault(r.query_id, set()).add(r[id_col])
        return sum(
            1
            for qi, (doc_id, _) in enumerate(queries)
            if per_q.get(qi, set()) & truth[doc_id]
        )

    qvecs = [pipe.embedder.embed_query(q) for _, q in queries]
    for name, run in [
        (
            "vector-batch",
            lambda: registry.search_by_vector_batch("chunk", qvecs, topk=TOPK),
        ),
        (
            "keyword-batch",
            lambda: registry.search_by_keyword_batch(
                "chunk", [q for _, q in queries], topk=TOPK
            ),
        ),
    ]:
        t0 = time.perf_counter()
        hits = batch_hits(run())
        wall = time.perf_counter() - t0
        print(f"{name:<14} {hits / len(queries):>8.2f} {len(queries) / wall:>8.2f}")

    spark.stop()


if __name__ == "__main__":
    main()
