"""Benchmark decontamination (operators/decontaminate.py).

Reference has no decontamination surface — this is a driver-mandated
training-data extension; semantics follow the published n-gram-overlap
scrub (GPT-3 / The Pile / Dolma recipes).
"""

from pyspark.sql import functions as F

from vechord_spark.operators.decontaminate import (
    benchmark_grams,
    contaminated_docs,
    decontaminate,
)


def _corpus(spark):
    rows = [
        # doc 1 contains the benchmark sentence verbatim -> contaminated
        (1, "intro text the quick brown fox jumps over the lazy dog and more"),
        # doc 2 shares no 8-gram with the benchmark
        (2, "completely unrelated content about distributed query engines at scale"),
        # doc 3 shares the other benchmark doc's 8-gram run
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    rows = [
        (100, "the quick brown fox jumps over the lazy dog"),
        (200, "alpha beta gamma delta epsilon zeta eta theta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contaminated_docs_flags_overlaps(spark):
    out = contaminated_docs(
        _corpus(spark), "doc_id", "text", _bench(spark), "doc_id", "text", n=8
    )
    got = {r["doc_id"]: (r["n_shared_grams"], r["n_bench_docs"]) for r in out.collect()}
    assert set(got) == {1, 3}
    # doc 1: 9-token benchmark has two 8-grams, both appear in doc 1
    assert got[1] == (2, 1)
    # doc 3: the 8-token benchmark doc yields one whole-text 8-gram
    assert got[3] == (1, 1)


def test_min_shared_threshold(spark):
    out = contaminated_docs(
        _corpus(spark), "doc_id", "text", _bench(spark), "doc_id", "text",
        n=8, min_shared=2,
    )
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_decontaminate_scrubs(spark):
    clean = decontaminate(
        _corpus(spark), "doc_id", "text", _bench(spark), "doc_id", "text", n=8
    )
    assert sorted(r["doc_id"] for r in clean.collect()) == [2]
    # columns preserved
    assert clean.columns == ["doc_id", "text"]


def test_benchmark_grams_distinct(spark):
    # repeated grams inside one doc and across docs collapse
    b = spark.createDataFrame(
        [(1, "a b c d e f g h a b c d e f g h"), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    out = benchmark_grams(b, "doc_id", "text", n=8).collect()
    grams = [(r["bench_id"], r["gram"]) for r in out]
    assert len(grams) == len(set(grams))


def test_short_docs_whole_text_shingle(spark):
    # texts shorter than n collapse to one whole-text shingle; identical
    # short texts therefore match
    c = spark.createDataFrame([(1, "tiny doc")], "doc_id long, text string")
    b = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    out = contaminated_docs(c, "doc_id", "text", b, "doc_id", "text", n=8).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1


def test_plan_broadcasts_benchmark(spark):
    plan = contaminated_docs(
        _corpus(spark), "doc_id", "text", _bench(spark), "doc_id", "text", n=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
