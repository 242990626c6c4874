"""Benchmark decontamination: flag training documents that overlap an
evaluation set.

Every serious pretraining pipeline removes eval-set contamination
before training (the GPT-3 and PaLM reports both describe n-gram
overlap scrubbing; the open replications — The Pile, RedPajama,
Dolma — standardized on 8-13 word n-grams). The operator here is that
standard: a training doc is *contaminated* when it shares at least
``min_shared`` distinct word ``n``-grams with any benchmark document.

Reference anchor: vechord has no decontamination surface (its eval
stack, vechord/evaluate.py, scores retrieval quality only) — this is a
driver-mandated training-data extension, built on the same tokenizer /
word-n-gram primitives as the dedup family (functions/text.py).

Scale shape (the part that matters at 100 TB): the benchmark side is
always tiny relative to the corpus (thousands of eval documents vs
billions of training docs), so its distinct-gram table is built once
and **broadcast** — the corpus side is a narrow projection + explode
with NO shuffle before the per-doc aggregation, and the final groupBy
is keyed on doc_id (map-side combinable, one exchange). Nothing in the
plan is O(corpus x benchmark); the join fan-out is bounded by the
benchmark gram count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vechord_spark.functions.text import word_ngrams


def benchmark_grams(
    bench_df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """``(gram, bench_id)`` pairs over the benchmark set.

    One row per (distinct-gram, benchmark-doc); the caller broadcasts
    this (it is benchmark-sized, not corpus-sized). Grams are deduped
    per document IN-ARRAY (``array_distinct`` before the explode), so
    with unique benchmark ids — the benchmark-set contract — the pairs
    are globally distinct without a cross-doc ``distinct()`` exchange.
    A duplicated bench id would only repeat its pairs, which the
    distinct-counting aggregation in :func:`contaminated_docs` absorbs.
    """
    from vechord_spark.parallel import spread

    # spread: a filter over a single-split scan leaves the CPU-bound
    # shingle projection on one core (no-op when the input is already
    # wide)
    return spread(bench_df).select(
        F.col(id_col).alias("bench_id"),
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("gram"),
    )


def contaminated_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bench_df: DataFrame,
    bench_id_col: str,
    bench_text_col: str,
    n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Per-contaminated-doc overlap report:

    - ``n_shared_grams``: distinct word n-grams shared with the benchmark
    - ``n_bench_docs``: distinct benchmark documents hit

    Only documents with ``n_shared_grams >= min_shared`` appear. The
    output feeds either a reporting join or an anti-join scrub
    (``df.join(contaminated, on=id, how="left_anti")``).

    The benchmark gram table is broadcast; the corpus never shuffles
    before the final doc_id aggregation.
    """
    from vechord_spark.parallel import spread

    bg = benchmark_grams(bench_df, bench_id_col, bench_text_col, n)
    # spread: the tokenize+shingle projection is CPU-bound; a
    # single-split scan would otherwise pin it to one core (no-op on
    # wide inputs, i.e. at cluster scale)
    corpus_grams = spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("gram"),
    )
    hits = corpus_grams.join(F.broadcast(bg), "gram")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count_distinct("gram").alias("n_shared_grams"),
            F.count_distinct("bench_id").alias("n_bench_docs"),
        )
        .filter(F.col("n_shared_grams") >= F.lit(min_shared))
    )


def decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bench_df: DataFrame,
    bench_id_col: str,
    bench_text_col: str,
    n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Scrub: return ``df`` minus contaminated documents (left-anti join
    against the contamination report — one broadcast-able small side,
    since the report is at most contaminated-doc-count rows)."""
    bad = contaminated_docs(
        df, id_col, text_col, bench_df, bench_id_col, bench_text_col, n, min_shared
    ).select(F.col("doc_id").alias(id_col))
    return df.join(bad, id_col, "left_anti")
