"""Batch-vs-loop amortization sweep (round-12 verdict ask #1).

Measures, for each of the four batched retrieval modalities (vector
IVF probes, multivector MaxSim, BM25 keyword, sparse postings), the
wall of ONE batched call vs N sequential single-query calls against
the SAME persisted registry layouts, for N in {16, 64, 256}. The
claim under test is the batch family's design premise: N queries from
one scan — the loop re-opens the layout N times, the batch pays the
scan once, so the ratio should grow with N and clear >=5x at N=64.

Run:  python benchmarks/batch_sweep.py            (sf0.1 default)
      SPARK_GRAFT_SF_DIR=... SWEEP_NS=16,64 python benchmarks/batch_sweep.py

Correctness of batch==loop is pinned separately at N=64 by
tests/test_batch_amortization.py; this script measures wall only and
prints one JSON line plus a markdown table for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NS = [int(x) for x in os.environ.get("SWEEP_NS", "16,64,256").split(",")]
TOPK = 10


def main() -> None:
    import vechord_spark as vs
    from pyspark.sql import functions as F

    from vechord_spark.functions.embed import sparse_embedding, sparse_query_vector
    from vechord_spark.registry import VechordRegistry
    from vechord_spark.sources.testdata import load_table
    from vechord_spark.spec import (
        Column,
        Keyword,
        MultiVector,
        SparseVector,
        TableSpec,
        Vector,
    )

    load0 = [round(x, 2) for x in os.getloadavg()]
    spark = vs.get_spark("batch-sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    tmp = tempfile.mkdtemp(prefix="batch_sweep_")
    reg = VechordRegistry("sweep", tmp, spark)
    rng = random.Random(7)

    # ---- corpora: the real testdata, through the shipped registry ----
    emb = load_table(spark, SF_DIR, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    reg.register(
        TableSpec(
            "vec",
            [Column("uid", "long", primary_key=True), Column("v", Vector(dim))],
        )
    )
    reg.append(
        "vec", emb.select(F.col("vec_id").alias("uid"), F.col("embedding").alias("v"))
    )
    reg.build_vector_index("vec", lists=16)

    # quantized twins of the vector layout (round 13): PQ-ADC and
    # RaBitQ bit-estimate batched searches over their own clustered
    # copies of the same corpus
    for tname, opts in (
        ("vecpq", {"pq_m": 8, "pq_ksub": 256}),
        ("vecrq", {"rabitq": True}),
    ):
        reg.register(
            TableSpec(
                tname,
                [
                    Column("uid", "long", primary_key=True),
                    Column("v", Vector(dim)),
                ],
            )
        )
        reg.append(
            tname,
            emb.select(F.col("vec_id").alias("uid"), F.col("embedding").alias("v")),
        )
        reg.build_vector_index(tname, lists=16, **opts)

    reg.register(
        TableSpec(
            "mv",
            [
                Column("uid", "long", primary_key=True),
                Column("m", MultiVector(dim)),
            ],
        )
    )
    mv = emb.groupBy(F.floor(F.col("vec_id") / 5).cast("long").alias("uid")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("vec_id", "embedding"))),
            lambda s: s["embedding"],
        ).alias("m")
    )
    reg.append("mv", mv)
    reg.build_multivec_index("mv", lists=8)

    docs = load_table(spark, SF_DIR, "documents")
    reg.register(
        TableSpec(
            "doc",
            [
                Column("uid", "long", primary_key=True),
                Column("body", Keyword()),
                Column("sv", SparseVector(16384)),
            ],
        )
    )
    reg.append(
        "doc",
        docs.select(
            F.col("doc_id").alias("uid"),
            F.col("text").alias("body"),
            sparse_embedding(F.col("text"), 16384).alias("sv"),
        ),
    )
    reg.build_keyword_index("doc")
    reg.build_sparse_index("doc")

    # query material drawn from the corpus itself so every query hits
    words = [
        r["word"]
        for r in docs.select(F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("word"))
        .where(F.length("word") > 3)
        .groupBy("word")
        .count()
        .orderBy(F.col("count").desc())
        .limit(40)
        .collect()
    ]

    def text_queries(n):
        return [
            " ".join(rng.choice(words) for _ in range(rng.randint(2, 4)))
            for _ in range(n)
        ]

    def vec_queries(n):
        return [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n)]

    def mv_queries(n):
        return [
            [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(2)]
            for _ in range(n)
        ]

    modalities = {
        "vector": dict(
            gen=vec_queries,
            batch=lambda qs: reg.search_by_vector_batch(
                "vec", qs, topk=TOPK, probes=2
            ),
            single=lambda q: reg.search_by_vector("vec", q, topk=TOPK, probes=2),
        ),
        "multivec": dict(
            gen=mv_queries,
            batch=lambda qs: reg.search_by_multivec_batch(
                "mv", qs, topk=TOPK, probes=2
            ),
            single=lambda q: reg.search_by_multivec("mv", q, topk=TOPK, probes=2),
        ),
        "vector_pq": dict(
            gen=vec_queries,
            batch=lambda qs: reg.search_by_vector_batch(
                "vecpq", qs, topk=TOPK, probes=2, refine=100
            ),
            single=lambda q: reg.search_by_vector(
                "vecpq", q, topk=TOPK, probes=2, refine=100
            ),
        ),
        "vector_rabitq": dict(
            gen=vec_queries,
            batch=lambda qs: reg.search_by_vector_batch(
                "vecrq", qs, topk=TOPK, probes=2, refine=100
            ),
            single=lambda q: reg.search_by_vector(
                "vecrq", q, topk=TOPK, probes=2, refine=100
            ),
        ),
        "bm25": dict(
            gen=text_queries,
            batch=lambda qs: reg.search_by_keyword_batch("doc", qs, topk=TOPK),
            single=lambda q: reg.search_by_keyword("doc", q, topk=TOPK),
        ),
        "sparse": dict(
            gen=lambda n: [
                sparse_query_vector(q, 16384) for q in text_queries(n)
            ],
            batch=lambda qs: reg.search_by_sparse_batch("doc", qs, topk=TOPK),
            single=lambda q: reg.search_by_sparse("doc", q, topk=TOPK),
        ),
    }

    results: dict[str, dict] = {}
    for name, m in modalities.items():
        # warm the layout + codegen once so neither side pays it
        m["single"](m["gen"](1)[0]).collect()
        m["batch"](m["gen"](2)).collect()
        results[name] = {}
        for n in NS:
            qs = m["gen"](n)
            t0 = time.perf_counter()
            rows_b = len(m["batch"](qs).collect())
            wall_b = time.perf_counter() - t0
            t0 = time.perf_counter()
            rows_l = 0
            for q in qs:
                rows_l += len(m["single"](q).collect())
            wall_l = time.perf_counter() - t0
            results[name][n] = {
                "batch_s": round(wall_b, 3),
                "loop_s": round(wall_l, 3),
                "ratio": round(wall_l / max(wall_b, 1e-9), 2),
                "rows_batch": rows_b,
                "rows_loop": rows_l,
            }
            print(
                f"# {name} N={n}: batch {wall_b:.3f}s vs loop {wall_l:.3f}s "
                f"-> {wall_l / max(wall_b, 1e-9):.1f}x "
                f"(rows {rows_b}/{rows_l})",
                file=sys.stderr,
            )

    print(
        json.dumps(
            {"sf_dir": SF_DIR, "topk": TOPK, "loadavg": load0, "results": results}
        )
    )
    # markdown for BASELINE.md
    print("\n| modality | " + " | ".join(f"N={n}" for n in NS) + " |")
    print("|---|" + "---|" * len(NS))
    for name in modalities:
        cells = [
            f"{results[name][n]['batch_s']}s vs {results[name][n]['loop_s']}s "
            f"({results[name][n]['ratio']}x)"
            for n in NS
        ]
        print(f"| {name} | " + " | ".join(cells) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
