"""The day-2 story, runnable end to end: yesterday's corpus is
indexed; today's crawl arrives and flows through

    bloom_anti_join        exact dedup vs the seen corpus — definitely-new
                           rows never shuffle
    registry.append        schema-enforced ingest
    extend_vector_index    assignment-only IVF maintenance (file-ledger
    extend_keyword_index   delta discovery: cost is O(today's data))
    merge_rollup           materialized-view refresh from today's facts only
    compact                small-file hygiene that re-adopts the index
                           ledgers, keeping day-N extends O(new data)

No step re-reads or rewrites day-1 data; the searches at the end hit
both days through the persisted indexes.

Run: python examples/incremental_day2.py
"""

from __future__ import annotations

import random
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from vechord_spark.functions.text import fingerprint
from vechord_spark.operators.bloom import bloom_anti_join
from vechord_spark.plans.rollup import merge_rollup, rollup_query, write_rollup
from vechord_spark.registry import VechordRegistry
from vechord_spark.session import get_spark
from vechord_spark.spec import Column, Keyword, TableSpec, Vector


def main() -> None:
    spark = get_spark("day2-example", master="local[4]", shuffle_partitions=4)
    work = tempfile.mkdtemp()
    rng = random.Random(42)
    topics = ["solar", "battery", "turbine", "reactor", "biofuel"]

    def doc(i: int, text: str) -> dict:
        return {
            "uid": i,
            "body": text,
            "vec": [rng.uniform(-1, 1) for _ in range(16)],
            "source": f"site{i % 7}",
        }

    reg = VechordRegistry("corpus", work, spark)
    reg.register(
        TableSpec(
            "docs",
            [
                Column("uid", "int", primary_key=True),
                Column("body", Keyword()),
                Column("vec", Vector(16)),
                Column("source", "string"),
            ],
        )
    )

    # ---- day 1: ingest, index, summarize -------------------------------
    day1 = [
        doc(i, f"report on {rng.choice(topics)} efficiency study {i}")
        for i in range(400)
    ]
    reg.insert_rows("docs", day1)
    reg.build_vector_index("docs", lists=8)
    reg.build_keyword_index("docs")
    roll = f"{work}/rollup_by_source"
    write_rollup(
        reg.load("docs"), ["source"], {"*": ["count"]}, roll
    )
    print(f"day 1: {reg.load('docs').count()} docs indexed")

    # ---- day 2: crawl arrives with re-fetches --------------------------
    day2 = [
        doc(1000 + i, f"fresh {rng.choice(topics)} analysis {i}")
        for i in range(60)
    ] + [doc(2000 + i, day1[i]["body"]) for i in range(25)]  # re-crawls
    batch = spark.createDataFrame(day2).withColumn("fp", fingerprint("body"))
    seen = reg.load("docs").select(fingerprint("body").alias("fp"))
    new = bloom_anti_join(batch, seen, "fp").drop("fp")
    n_new = new.count()
    print(f"day 2: {len(day2)} crawled -> {n_new} new after bloom dedup")

    reg.insert_rows("docs", [r.asDict() for r in new.collect()])
    print(f"index extension: +{reg.extend_vector_index('docs')} vectors, "
          f"+{reg.extend_keyword_index('docs')} docs of postings")
    merge_rollup(spark, roll, new, ["source"], {"*": ["count"]})

    # ---- day-N hygiene: compact the accumulated small files ------------
    # compact() extends every index first (pending rows get indexed, not
    # lost), rewrites the table into ~128 MB files, then re-snapshots
    # each index's file ledger — so the NEXT day's extend_* stays an
    # O(appended data) file diff instead of falling back to a full
    # pk anti-join.
    st = reg.compact("docs")
    print(f"compact: {st['files_before']} -> {st['files_after']} files; "
          "index ledgers re-adopted")

    # ---- both days are live through the persisted indexes --------------
    probe = reg.load("docs").filter(F.col("uid") == 1010).first()
    hit = reg.search_by_vector("docs", list(probe.vec), topk=1, probes=8).first()
    print(f"vector search finds day-2 doc: uid={hit.uid}")
    kw = reg.search_by_keyword("docs", "fresh analysis", topk=3).collect()
    print(f"keyword top-3 (day-2 terms): {[r.uid for r in kw]}")
    totals = rollup_query(spark, roll, ["source"], {"*": ["count"]}).collect()
    print(f"rollup now covers {sum(r.count_rows for r in totals)} docs "
          f"across {len(totals)} sources")
    spark.stop()


if __name__ == "__main__":
    main()
