"""Repetition-based quality signals for training-corpus filtering.

Machine-generated and boilerplate text is dominated by repeated tokens
and phrases; corpus-quality pipelines (the Gopher/MassiveText rules
made the pattern standard) filter on "fraction of the doc that is the
top n-gram" and "fraction of duplicate tokens". These complement the
per-column heuristics in functions/text.py (punct/stopword ratios),
which look at characters; these look at the token distribution, which
needs a per-(doc, token) aggregation, not a Column expression.

Scale shape: explode -> two chained aggregations, both keyed on doc_id
(the second reuses the first's hash partitioning — one real exchange),
plus the same for n-grams; everything stays in whole-stage codegen.
State per doc is O(distinct tokens), never O(text²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vechord_spark.functions.text import tokenize, word_ngrams


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, ngram: int = 2
) -> DataFrame:
    """Per-document token-distribution stats:

    - ``n_tokens`` / ``n_distinct``
    - ``top_token_frac``: share of the most frequent token
    - ``dup_token_frac``: 1 - distinct/total (mass in repeats)
    - ``top_ngram_frac``: share of the most frequent word ``ngram``

    Documents with zero tokens produce no row (nothing to measure).
    """
    uni = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokenize(text_col)).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = uni.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_token_frac"),
        F.round(F.lit(1.0) - F.count(F.lit(1)) / F.sum("c"), 6).alias(
            "dup_token_frac"
        ),
    )
    grams = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_ngrams(text_col, ngram)).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.round(F.max("c") / F.sum("c"), 6).alias("top_ngram_frac"))
    )
    return stats.join(grams, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "top_token_frac",
        "dup_token_frac",
        F.coalesce("top_ngram_frac", F.lit(0.0)).alias("top_ngram_frac"),
    )


def top_tokens(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """Corpus-wide token frequency head — the Zipf/vocabulary report
    every corpus card ships. Explode + count is map-side-combinable:
    each partition emits one partial count per distinct token it saw,
    so the single exchange carries ~|vocab| rows, not |tokens|; the
    top-k compiles to TakeOrderedAndProject (per-partition heaps).
    Ties break on the token itself for a total order."""
    toks = df.select(F.explode(tokenize(text_col)).alias("token"))
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(k)
    )


def length_quantiles(
    df: DataFrame,
    group_col: str,
    text_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Per-group EXACT token-length quantiles (linear interpolation).

    Exact `percentile` buffers each group's values in executor memory —
    right for per-source corpus reports (groups = sources, values =
    docs/source). For quantiles over a 100 TB *ungrouped* column use
    ``F.percentile_approx`` instead (mergeable sketch, bounded memory);
    tests assert the approx path lands within tolerance of this one.
    """
    ntok = F.size(tokenize(text_col)).cast("double")
    aggs = [
        F.round(F.percentile(ntok, F.lit(q)), 6).alias(f"p{int(q * 100)}")
        for q in quantiles
    ]
    return df.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).alias("n_docs"), *aggs
    )


def nb_classifier_score(
    df: DataFrame, id_col: str, text_col: str, label_col
) -> DataFrame:
    """Train a multinomial Naive-Bayes text classifier IN-PLAN and score
    every document — the fasttext-style quality/domain filter that
    large-corpus pipelines (CCNet, the Llama data recipe) run between
    the heuristic rules and any LM-based score.

    ``label_col`` is a boolean Column of weak labels (metadata-derived:
    lang tag, source domain, heuristic threshold). Training is just two
    aggregations over the token stream — per-token class counts and the
    class totals — so unlike an MLlib fit it is deterministic, fully
    SQL-expressible (DuckDB-oracle-checkable), and never materializes a
    model object: the "model" is a DataFrame of per-token log-odds
    weights joined back onto the same token stream.

    Per-doc output: ``(id, n_tokens, nb_logodds)`` where
    ``nb_logodds = log P(pos|doc) - log P(neg|doc)`` under Laplace
    smoothing, including the class-prior term; positive means the
    classifier sides with the weak-positive class. Rounded to 6
    decimals (determinism contract; token-order float drift is ~1e-13).

    Scale shape: the token stream is scanned twice (train counts,
    probe) through one localCheckpoint of the vocab-sized count table;
    class totals and the doc-prior are broadcast scalars; the probe
    join is vocab-vs-stream (hot tokens = AQE skew case); the final
    aggregation is one map-side-combinable exchange on doc_id.
    """
    from vechord_spark.parallel import spread

    y = F.col(label_col) if isinstance(label_col, str) else label_col
    toks = spread(df).select(
        F.col(id_col),
        y.alias("y"),
        F.explode(tokenize(text_col)).alias("tok"),
    )
    counts = (
        toks.groupBy("tok")
        .agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("c_pos"),
            F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("c_neg"),
        )
        .localCheckpoint(eager=True)
    )
    totals = counts.agg(
        F.sum("c_pos").cast("double").alias("n_pos"),
        F.sum("c_neg").cast("double").alias("n_neg"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    prior = df.agg(
        F.log(
            F.sum(F.when(y, 1).otherwise(0)).cast("double")
            / F.sum(F.when(y, 0).otherwise(1)).cast("double")
        ).alias("log_prior")
    )
    scored = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            (
                F.log((F.col("c_pos") + 1.0) / (F.col("n_pos") + F.col("v")))
                - F.log((F.col("c_neg") + 1.0) / (F.col("n_neg") + F.col("v")))
            ).alias("w"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("w").alias("s"))
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            "n_tokens",
            F.round(F.col("s") + F.col("log_prior"), 6).alias("nb_logodds"),
        )
    )


def unigram_logprob(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document mean unigram log-probability — the model-free
    perplexity proxy.

    The corpus itself is the unigram LM: P(tok) = corpus_count(tok) /
    total_tokens. A document's mean log P over its tokens separates
    natural text (common-word mass) from gibberish/boilerplate tails
    without any external model — the cheap first-pass filter before an
    LM-based quality score. Returns ``(id, n_tokens, avg_logprob)``
    with avg_logprob rounded to 6 decimals (determinism contract).

    Scale shape: two corpus scans — one builds the vocab (shuffle on
    token, map-side combined), one probes it (hot tokens are a
    skewed-join case AQE splits) — plus the per-doc aggregation. The
    vocab (distinct tokens, orders of magnitude smaller than the token
    stream) is locally checkpointed so the scalar total and the probe
    join both read the materialized counts instead of re-tokenizing the
    corpus a third time.
    """
    from vechord_spark.parallel import spread

    toks = spread(df).select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    total = vocab.agg(F.sum("c").cast("double").alias("t"))
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .select(F.col(id_col), (F.log(F.col("c") / F.col("t"))).alias("lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )
