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

from typing import Sequence

import pandas as pd  # module-top: pandas-UDF string type hints resolve here

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
    from vechord_spark.parallel import spread

    df = spread(df)
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
    aggregation is one map-side-combinable exchange on doc_id. (A
    counts-first variant — pre-aggregating per-(doc, token) before the
    probe — was measured in the r13 optimization round and REJECTED:
    it adds a (doc, tok)-keyed exchange that costs more than the
    distinct-row compression saves, locally and in bytes.)
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

    Scale shape: ONE corpus tokenize pass into per-(doc, token)
    counts (map-side combined — the exchange carries counts, never the
    raw token stream), the corpus-wide token count as a COUNT WINDOW
    over the token-keyed exchange (each counts row is a distinct
    (doc, tok), so summing tf over the token's partition IS its corpus
    count — no vocab join, no second scan, no checkpoint action), a
    broadcast scalar for the total, and the per-doc aggregation with
    tf-weighted averaging (identical mean, 6-decimal-rounded). Hot
    tokens concentrate (doc, tok, tf) rows, not occurrences.
    """
    from pyspark.sql import Window

    from vechord_spark.parallel import spread

    toks = spread(df).select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("tok")
    )
    counts = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    total = counts.agg(F.sum("tf").cast("double").alias("t"))
    c = F.sum("tf").over(Window.partitionBy("tok"))
    scored = (
        counts.withColumn("c", c)
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("tf"),
            (F.col("tf") * F.log(F.col("c") / F.col("t"))).alias("lpw"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        F.round(F.sum("lpw") / F.sum("tf"), 6).alias("avg_logprob"),
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lam: float = 0.75,
) -> DataFrame:
    """Per-document mean INTERPOLATED bigram log-probability — the
    KenLM-shaped perplexity proxy one rung above :func:`unigram_logprob`
    (CCNet scores with a 5-gram KenLM; Jelinek-Mercer-smoothed bigrams
    are the same signal computable from the corpus alone):

        P(w_i | w_{i-1}) = lam * c2(w_{i-1} w_i) / c1(w_{i-1})
                         + (1 - lam) * c1(w_i) / T

    scored as ``avg(ln P)`` over a doc's bigram positions (docs with
    fewer than 2 tokens get a NULL score — nothing to measure). Repeated
    n-grams raise the score, so this rewards fluent word ORDER, which
    the bag-of-words unigram score cannot see. Returns
    ``(id, n_bigrams, avg_logprob)``, 6-decimal-rounded.

    Scale shape: the bigram list is built IN-ARRAY from the token array
    (element_at pairs — no self-join, no window, no per-doc sort), then
    one vocab aggregation per order (unigram shuffle on token, bigram on
    the pair; both map-side combined and locally checkpointed) and three
    stream-side probe joins (c2, c1(prev), c1(cur)) — hot-token skew is
    AQE's standard case. The corpus is scanned twice, same as unigram.
    """
    if not 0.0 < lam < 1.0:
        raise ValueError(f"lam must be in (0, 1), got {lam}")
    from vechord_spark.parallel import spread

    base = spread(df).select(
        F.col(id_col), tokenize(text_col).alias("__toks")
    )
    toks = base.select(id_col, F.explode("__toks").alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c1"))
        .localCheckpoint(eager=True)
    )
    total = vocab.agg(F.sum("c1").cast("double").alias("t"))
    # guard: Spark's sequence(1, 0) DESCENDS to [1, 0] instead of being
    # empty, so docs with < 2 tokens must be filtered before transform
    pairs = (
        base.filter(F.size("__toks") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__toks) - 1),"
                    " i -> struct(element_at(__toks, i) as prev,"
                    "             element_at(__toks, i + 1) as cur))"
                )
            ).alias("bg"),
        )
        .select(id_col, F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    )
    # per-(doc, bigram) counts: the probe side shuffles counts, never
    # the raw bigram stream, and the corpus bigram count c2 is a SUM
    # WINDOW over the (prev, cur)-keyed exchange — no bigram-table
    # join, no checkpoint action. The two unigram probes join on the
    # counts frame (hot-token skew concentrates (doc, bigram, tf)
    # rows, not occurrences); the per-doc mean is tf-weighted
    # (identical value, 6-decimal-rounded).
    pcounts = pairs.groupBy(id_col, "prev", "cur").agg(
        F.count(F.lit(1)).alias("tf")
    )
    from pyspark.sql import Window

    c2 = F.sum("tf").over(Window.partitionBy("prev", "cur"))
    vp = vocab.select(F.col("tok").alias("prev"), F.col("c1").alias("c1_prev"))
    vc = vocab.select(F.col("tok").alias("cur"), F.col("c1").alias("c1_cur"))
    scored = (
        pcounts.withColumn("c2", c2)
        .join(vp, "prev")
        .join(vc, "cur")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("tf"),
            (
                F.col("tf")
                * F.log(
                    F.lit(lam) * F.col("c2") / F.col("c1_prev")
                    + F.lit(1.0 - lam) * F.col("c1_cur") / F.col("t")
                )
            ).alias("lpw"),
        )
    )
    counted = scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_bigrams"),
        F.round(F.sum("lpw") / F.sum("tf"), 6).alias("avg_logprob"),
    )
    # docs with < 2 tokens: keep them visible with a NULL score so the
    # caller's corpus accounting doesn't silently lose rows
    return (
        df.select(id_col)
        .join(counted, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.col("avg_logprob"),
        )
    )


def _kn_bigram_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, prev, cur) bigram stream, built in-array (no self-join,
    no window) — shared by the KN model build and the scoring side."""
    from vechord_spark.parallel import spread

    base = spread(df).select(F.col(id_col), tokenize(text_col).alias("__toks"))
    return (
        base.filter(F.size("__toks") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__toks) - 1),"
                    " i -> struct(element_at(__toks, i) as prev,"
                    "             element_at(__toks, i + 1) as cur))"
                )
            ).alias("bg"),
        )
        .select(id_col, F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    )


def build_kn_bigram_model(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The Kneser-Ney reference model's four tables, built from ONE
    corpus bigram pass: ``(bigrams, ctx, cont, btypes)`` — bigram-type
    counts (eagerly checkpointed; everything else derives from it),
    per-context totals + distinct-continuation counts, backward
    continuation counts, and the 1-row type total. All
    vocabulary-sized. Build once per corpus and pass to
    :func:`kneser_ney_logprob` as ``model`` when several scorers run
    in one session (the per-doc scorer and the funnel LM gate share
    the same reference model)."""
    pairs = _kn_bigram_pairs(df, id_col, text_col)
    bigrams = (
        pairs.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=True)
    )
    ctx = bigrams.groupBy("prev").agg(
        F.sum("c2").cast("double").alias("c1ctx"),
        F.count(F.lit(1)).alias("n1p_fwd"),
    )
    cont = bigrams.groupBy("cur").agg(F.count(F.lit(1)).alias("n1p_back"))
    btypes = bigrams.agg(F.count(F.lit(1)).cast("double").alias("b"))
    return bigrams, ctx, cont, btypes


def kneser_ney_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    discount: float = 0.75,
    score_ids: DataFrame | None = None,
    model: tuple | None = None,
) -> DataFrame:
    """Per-document mean INTERPOLATED KNESER-NEY bigram
    log-probability — the smoothing the n-gram LM literature settled
    on (Kneser & Ney 1995; Chen & Goodman 1999 found interpolated KN
    the consistently best n-gram smoother; KenLM's default). One rung
    above :func:`bigram_logprob`'s Jelinek-Mercer mix:

        P(w2|w1) = max(c2(w1 w2) - D, 0) / c(w1)
                 + (D * N1+(w1, .) / c(w1)) * N1+(. , w2) / B

    where ``c(w1)`` is the bigram-position context count,
    ``N1+(w1, .)`` / ``N1+(. , w2)`` are distinct-continuation counts,
    and ``B`` is the number of distinct bigram types. The insight over
    JM: the backoff weight of a word is how many CONTEXTS it follows,
    not how often it occurs — "Francisco" is frequent but follows only
    "San", so KN (correctly) refuses to predict it after novel
    contexts where raw-frequency backoff would.

    Returns ``(id, n_bigrams, avg_kn_logprob)``, 6-decimal-rounded,
    NULL score for docs with < 2 tokens. Scale shape: identical to
    bigram_logprob — in-array bigram construction (no self-join, no
    window), the continuation counts come from the bigram-TYPE table
    (already aggregated, vocabulary-sized), three stream-side probe
    joins plus the 1-row type-total broadcast.

    ``score_ids`` (a one-column frame of ``id_col`` values) restricts
    the SCORING side to those documents while the model still trains
    on all of ``df`` — the corpus-funnel LM gate scores only the
    dedup survivors under the full-crawl reference model: the scoring
    tokenize scan then reads only the survivors (the semi-join lands
    BEFORE the bigram explode), and the model aggregates are
    vocabulary-sized either way. ``model`` (a
    :func:`build_kn_bigram_model` result) reuses an already-built
    reference model — several scorers in one session then share the
    one corpus bigram pass.
    """
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")

    if model is None:
        model = build_kn_bigram_model(df, id_col, text_col)
    bigrams, ctx, cont, btypes = model
    d = float(discount)
    score_df = (
        df.join(score_ids, id_col, "left_semi") if score_ids is not None else df
    )
    score_pairs = _kn_bigram_pairs(score_df, id_col, text_col)
    scored = (
        score_pairs.join(bigrams, ["prev", "cur"])
        .join(ctx, "prev")
        .join(cont, "cur")
        .crossJoin(F.broadcast(btypes))
        .select(
            F.col(id_col),
            F.log(
                F.greatest(F.col("c2") - F.lit(d), F.lit(0.0))
                / F.col("c1ctx")
                + F.lit(d)
                * F.col("n1p_fwd")
                / F.col("c1ctx")
                * F.col("n1p_back")
                / F.col("b")
            ).alias("lp"),
        )
    )
    counted = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_kn_logprob"),
    )
    base_ids = score_ids if score_ids is not None else df.select(id_col)
    return (
        base_ids
        .join(counted, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.col("avg_kn_logprob"),
        )
    )


def kn_perplexity_gate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    drop_frac: float = 0.2,
    discount: float = 0.75,
    reference: DataFrame | None = None,
    model: tuple | None = None,
) -> DataFrame:
    """The CCNet LM gate as ONE operator: score ``df``'s documents
    under a Kneser-Ney bigram model trained on ``reference`` (default:
    ``df`` itself — self-referential filtering; pass the full crawl to
    judge a subset under the corpus-wide model, or a prebuilt
    ``model`` from :func:`build_kn_bigram_model`), then drop the
    bottom ``drop_frac`` quantile by mean logprob. The quantile is
    exact and scale-honest: scores are 6-dp-rounded, so the cutoff
    comes from a histogram over DISTINCT score values (a
    vocabulary-sized frame — the global window orders score values,
    never documents), and threshold ties drop together. Docs with no
    bigrams drop (no evidence of fluency). Returns the kept rows of
    ``df`` unchanged."""
    from pyspark.sql import Window

    if not 0.0 <= drop_frac < 1.0:
        raise ValueError(f"drop_frac must be in [0, 1), got {drop_frac}")
    ref = reference if reference is not None else df
    scores = (
        kneser_ney_logprob(
            ref,
            id_col,
            text_col,
            discount,
            score_ids=df.select(id_col),
            model=model,
        )
        .filter(F.col("avg_kn_logprob").isNotNull())
        .select(id_col, F.col("avg_kn_logprob").alias("__s"))
        .localCheckpoint(eager=True)
    )
    hist = scores.groupBy("__s").agg(F.count(F.lit(1)).alias("__cnt"))
    wcum = Window.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "__s",
        F.sum("__cnt").over(wcum).alias("__cum"),
        F.sum("__cnt").over(wall).alias("__n"),
    )
    k = F.floor(F.lit(drop_frac) * F.col("__n"))
    row = (
        cum.filter((k >= F.lit(1)) & (F.col("__cum") >= k))
        .agg(F.min("__s").alias("thr"))
        .first()
    )
    thr = row["thr"] if row is not None else None
    kept = scores if thr is None else scores.filter(F.col("__s") > F.lit(thr))
    return df.join(kept.select(id_col), id_col, "left_semi")


# Unicode script classes as explicit codepoint ranges — NOT \p{Script}
# properties, whose tables differ across regex engines (Java vs RE2 vs
# Python); literal ranges count identically everywhere, which is what
# lets the DuckDB oracle pin the exact fractions.
SCRIPT_RANGES = {
    "latin": "[A-Za-zÀ-ɏ]",
    "digit": "[0-9]",
    "cyrillic": "[Ѐ-ӿ]",
    "greek": "[Ͱ-Ͽ]",
    "arabic": "[؀-ۿ]",
    "cjk": "[぀-ヿ一-鿿가-힯]",
    "space": "[ \\t\\n\\r]",
}


def script_mix(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Unicode SCRIPT composition: the fraction of
    characters in each major script class (:data:`SCRIPT_RANGES`) plus
    ``other_frac`` for everything unclassified — the multilingual
    triage signal language-ID models key on, and the cheap detector
    for script-mixing spam, mojibake residue, and mislabeled-language
    docs (a ``lang='en'`` row that is 40% CJK is a routing bug). Pure
    zero-shuffle scan: one ``length(regexp_replace(...))`` per class,
    all whole-stage codegen, fractions 6-dp-rounded for cross-engine
    hash stability. Empty docs report NULL fractions."""
    n = F.length(F.col(text_col)).cast("double")
    cols = [F.col(id_col)]
    covered = None
    for name, pattern in SCRIPT_RANGES.items():
        cnt = F.length(F.col(text_col)) - F.length(
            F.regexp_replace(F.col(text_col), pattern, "")
        )
        covered = cnt if covered is None else covered + cnt
        cols.append(
            F.when(n > 0, F.round(cnt / n, 6)).alias(f"{name}_frac")
        )
    cols.append(
        F.when(n > 0, F.round((F.length(F.col(text_col)) - covered) / n, 6)).alias(
            "other_frac"
        )
    )
    return df.select(*cols)


def char_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Shannon entropy of the character distribution, in
    bits — the classic gibberish/noise detector: natural language sits
    ~3.5-4.5 bits/char, base64/binary junk pushes toward 6, repeated-
    character spam collapses toward 0. Complements the token-level
    signals (repetition_stats, unigram_logprob), which cannot see
    sub-token noise.

    Entropy without a probability column:
    H = log2(N) - (1/N) * sum_c n_c*log2(n_c). Empty docs keep a row
    with entropy 0.0 (corpus accounting never loses rows).

    Scale shape: MAP-ONLY — the statistic is purely per-document, so
    instead of exploding |text| (doc, char) rows through two shuffles,
    each doc's characters are ``array_sort``-ed in place and ONE
    ``F.aggregate`` fold accumulates Σ n_c*ln(n_c) over the
    equal-adjacent runs (the same zero-shuffle trick as the Gopher
    char-repetition fold above). Zero exchanges, whole-stage codegen;
    per-doc cost O(L log L).
    """
    from vechord_spark.parallel import spread

    chars = F.array_sort(
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), ""),
            lambda c: c != "",
        )
    )
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0.0).alias("s"),  # sum of n_c * ln(n_c) over flushed runs
        F.lit(0).cast("long").alias("n"),
    )

    def _flush(acc):
        return F.when(
            acc["run"] > 0, acc["run"] * F.log(acc["run"].cast("double"))
        ).otherwise(F.lit(0.0))

    def merge(acc, x):
        same = x.eqNullSafe(acc["prev"])
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["s"]).otherwise(acc["s"] + _flush(acc)).alias("s"),
            (acc["n"] + 1).alias("n"),
        )

    def finish(acc):
        n = acc["n"]
        s = acc["s"] + _flush(acc)
        ln2 = 0.6931471805599453
        return F.struct(
            n.alias("n_chars"),
            F.when(
                n > 0,
                F.round(
                    (F.log(n.cast("double")) - s / n) / F.lit(ln2), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("entropy_bits"),
        )

    stats = F.aggregate(chars, zero, merge, finish)
    return spread(df).select(
        F.col(id_col),
        stats["n_chars"].cast("bigint").alias("n_chars"),
        stats["entropy_bits"].alias("entropy_bits"),
    )


def dsir_importance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target,
    n_buckets: int = 8192,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every doc by
    how much more likely its tokens are under the TARGET distribution
    than under the raw-corpus distribution, with tokens hashed into a
    fixed bucket space so the two "LMs" are bounded count vectors, not
    open vocabularies.

        importance(doc) = avg over tokens of
            ln( P_target(bucket) / P_corpus(bucket) )

    with Laplace smoothing on both sides. ``target`` is a boolean
    Column marking the target-domain rows (lang tag, trusted source);
    positive scores mean "looks like the target domain" — feed the
    score to a top-fraction or threshold sampler for the actual
    resample step.

    Hashing: bucket = md5-derived uniform int mod ``n_buckets`` — the
    one hash bit-identical in Spark and the DuckDB oracle (the paper
    uses a fixed hash for the same reason: the feature space must be
    stable across runs and machines).

    Scale shape: two passes over the token stream through one
    checkpointed bucket-count table (fixed size ``n_buckets``,
    broadcast by construction — unlike :func:`nb_classifier_score`'s
    open vocabulary, the probe join never shuffles the stream), then
    one map-side-combinable doc aggregation. Returns
    ``(id, n_tokens, importance)``, 6-decimal-rounded.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    from vechord_spark.parallel import spread

    y = F.col(target) if isinstance(target, str) else target
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    toks = (
        spread(df)
        .select(F.col(id_col), y.alias("__y"), F.explode(tokenize(text_col)).alias("tok"))
        .select(id_col, "__y", bucket.alias("b"))
    )
    counts = (
        toks.groupBy("b")
        .agg(
            F.sum(F.when(F.col("__y"), 1).otherwise(0)).alias("c_tgt"),
            F.count(F.lit(1)).alias("c_all"),
        )
        .localCheckpoint(eager=True)
    )
    totals = counts.agg(
        F.sum("c_tgt").cast("double").alias("n_tgt"),
        F.sum("c_all").cast("double").alias("n_all"),
    )
    # the count table is <= n_buckets rows BY CONSTRUCTION, so the
    # probe is a broadcast join at any corpus size — without the hint
    # the checkpointed frame's default size estimate forces a full
    # shuffle (and sort) of the token stream on ``b``; with it the
    # stream's only exchange is the final map-side-combined doc
    # aggregation
    scored = (
        toks.join(F.broadcast(counts), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            (
                F.log(
                    (F.col("c_tgt") + 1.0) / (F.col("n_tgt") + float(n_buckets))
                )
                - F.log(
                    (F.col("c_all") + 1.0) / (F.col("n_all") + float(n_buckets))
                )
            ).alias("w"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round(F.avg("w"), 6).alias("importance"),
    )


def perplexity_buckets(
    scored: DataFrame,
    group_col: str,
    score_col: str,
    cuts: tuple[float, float] = (1 / 3, 2 / 3),
) -> DataFrame:
    """CCNet-style head/middle/tail bucketing: rank every document's
    quality score against its OWN group's (language's) distribution and
    cut at the ``cuts`` quantiles — the standard per-language corpus
    tiering (Wenzek et al. 2019) that follows a perplexity-proxy score
    like ``unigram_logprob``. Higher score = better, so ``head`` is the
    top tier (score >= upper quantile), ``tail`` the bottom.

    Determinism: thresholds and comparisons use 6-decimal-rounded
    doubles, so bucket membership is bit-reproducible across engines
    (exact interpolated ``percentile`` matches DuckDB quantile_cont
    after rounding — the same contract length_quantiles relies on).

    Scale shape: one group aggregation for the |groups|-row threshold
    table (exact percentile buffers per-group values — right when
    groups are languages; swap percentile_approx for the mergeable
    sketch at 100 TB), broadcast back onto the scored frame — the
    corpus itself never shuffles. Adds a ``ppl_bucket`` column.
    """
    lo, hi = cuts
    if not 0.0 < lo < hi < 1.0:
        raise ValueError(f"cuts must satisfy 0 < lo < hi < 1, got {cuts}")
    s = F.round(F.col(score_col), 6)
    th = scored.groupBy(group_col).agg(
        F.round(F.percentile(F.round(F.col(score_col), 6), F.lit(lo)), 6).alias("__q_lo"),
        F.round(F.percentile(F.round(F.col(score_col), 6), F.lit(hi)), 6).alias("__q_hi"),
    )
    bucket = (
        F.when(s >= F.col("__q_hi"), F.lit("head"))
        .when(s >= F.col("__q_lo"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.join(F.broadcast(th), group_col)
        .withColumn("ppl_bucket", bucket)
        .drop("__q_lo", "__q_hi")
    )


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", appendix A1.1 —
# the MassiveText filter that open pipelines (RedPajama, Dolma, FineWeb)
# reuse). Reference anchor: vechord has no corpus-quality surface — this
# is a driver-mandated training-data extension.
# ---------------------------------------------------------------------------

#: the eight "required" English words; a Gopher-passing doc contains >= 2
GOPHER_REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_words: int = 2,
) -> DataFrame:
    """Per-document Gopher rule report: every signal the original rule
    set measures, plus the combined ``passes_gopher`` verdict.

    - ``n_words`` / ``mean_word_len`` — whitespace words (punctuation
      kept attached, as in the paper)
    - ``symbol_ratio`` — ('#' + ellipsis occurrences) / words
    - ``bullet_line_frac`` / ``ellipsis_line_frac`` — over non-empty
      trimmed lines (split on newline)
    - ``alpha_word_frac`` — words containing >= 1 alphabetic char
    - ``n_required_words`` — how many of the eight required English
      words appear at least once

    Scale shape: every signal is a Column expression over one scan —
    no explode, no shuffle, whole-stage codegen end to end. At 100 TB
    this is the cheapest possible pass (filter pushes into the scan
    when used as a predicate); the expensive token-distribution
    signals live in ``repetition_stats``.
    """
    e = _gopher_exprs(
        text_col,
        min_words=min_words,
        max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        max_symbol_ratio=max_symbol_ratio,
        max_bullet_frac=max_bullet_frac,
        max_ellipsis_frac=max_ellipsis_frac,
        min_alpha_word_frac=min_alpha_word_frac,
        min_required_words=min_required_words,
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        e["n_words"].cast("int").alias("n_words"),
        e["mean_word_len"].alias("mean_word_len"),
        e["symbol_ratio"].alias("symbol_ratio"),
        e["bullet_line_frac"].alias("bullet_line_frac"),
        e["ellipsis_line_frac"].alias("ellipsis_line_frac"),
        e["alpha_word_frac"].alias("alpha_word_frac"),
        e["n_required_words"].cast("int").alias("n_required_words"),
        e["passes"].alias("passes_gopher"),
    )


def gopher_pass_filter(
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_words: int = 2,
) -> Column:
    """The combined Gopher verdict as ONE boolean Column — usable as a
    stateless filter on batch AND streaming frames (streaming cannot
    join a side-computed flags table back without state). Same
    expressions as :func:`gopher_quality`'s ``passes_gopher``, by
    construction (shared ``_gopher_exprs``)."""
    return _gopher_exprs(
        text_col,
        min_words=min_words,
        max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        max_symbol_ratio=max_symbol_ratio,
        max_bullet_frac=max_bullet_frac,
        max_ellipsis_frac=max_ellipsis_frac,
        min_alpha_word_frac=min_alpha_word_frac,
        min_required_words=min_required_words,
    )["passes"]


def _gopher_exprs(
    text_col: str,
    min_words: int,
    max_words: int,
    min_mean_word_len: float,
    max_mean_word_len: float,
    max_symbol_ratio: float,
    max_bullet_frac: float,
    max_ellipsis_frac: float,
    min_alpha_word_frac: float,
    min_required_words: int,
) -> dict:
    """The Gopher signal Columns, shared by the report (gopher_quality)
    and the filter form (gopher_pass_filter)."""

    text = F.col(text_col)
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    sum_len = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    ).cast("double")
    mean_wl = F.when(n_words > 0, F.round(sum_len / n_words, 6)).otherwise(F.lit(0.0))
    n_symbols = (
        F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ) + F.regexp_count(text, F.lit(r"(\.\.\.|…)"))
    symbol_ratio = F.when(n_words > 0, F.round(n_symbols / n_words, 6)).otherwise(
        F.lit(0.0)
    )
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^[-*•‣▶]")))
    n_ellip = F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$")))
    bullet_frac = F.when(n_lines > 0, F.round(n_bullet / n_lines, 6)).otherwise(
        F.lit(0.0)
    )
    ellipsis_frac = F.when(n_lines > 0, F.round(n_ellip / n_lines, 6)).otherwise(
        F.lit(0.0)
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    alpha_frac = F.when(n_words > 0, F.round(n_alpha / n_words, 6)).otherwise(
        F.lit(0.0)
    )
    toks = tokenize(text_col)
    n_req = sum(
        (F.array_contains(toks, w).cast("int") for w in GOPHER_REQUIRED_WORDS),
        start=F.lit(0),
    )
    passes = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_word_frac)
        & (n_req >= min_required_words)
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "symbol_ratio": symbol_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "n_required_words": n_req,
        "passes": passes,
    }


def top_tfidf_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    n_docs: int | None = None,
) -> DataFrame:
    """Per-document keyphrase extraction: top-``k`` terms by smoothed
    TF-IDF (``tf * (ln((N+1)/(df+1)) + 1)``, the sklearn smoothing so
    unseen-term idf stays finite), ties broken by term — the classic
    unsupervised doc-labeling / topic-signal pass over a corpus.

    Scale shape: one tokenize pass -> (doc, term) counts (map-side
    combinable) -> document frequency as a COUNT WINDOW over the
    term-keyed exchange (each counts row is one distinct (doc, term),
    so the partition row count IS the term's df — no second
    aggregation, no join, and the counts subtree is consumed once) ->
    per-doc window top-k. Three key-parallel exchanges, no broadcast
    of the vocabulary (corpus-sized vocab cannot be broadcast at
    100 TB), no O(vocab x docs) anywhere. A corpus-hot term
    concentrates its (doc, term) rows on one partition in either
    formulation (the join shuffled the same rows by term).

    ``n_docs``: pass the corpus size if already known to keep the count
    out of the plan; defaults to ``df.count()``.
    """
    from pyspark.sql import Window

    from vechord_spark.parallel import spread

    if n_docs is None:
        n_docs = df.count()
    df = spread(df)
    counts = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokenize(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = F.count(F.lit(1)).over(Window.partitionBy("term"))
    idf = F.log((F.lit(float(n_docs + 1))) / (dfc + 1)) + F.lit(1.0)
    scored = counts.select(
        "doc_id", "term", (F.col("tf") * idf).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "rank", F.round("score", 6).alias("score"))
    )


def _dup_run_stats(sorted_arr, gchar_off: int):
    """Fold a SORTED string array into duplicate-run totals:
    ``struct(dupc, dupch)`` = (Σ run over runs of length>1,
    Σ run x (length(elem) - gchar_off) over the same runs).

    Equal elements are adjacent after ``array_sort``, so one left fold
    with a (prev, run) accumulator sees every duplicate group exactly
    once — the zero-shuffle replacement for explode + groupBy(doc, elem)
    when the statistic is purely per-document.
    """
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dupc"),
        F.lit(0).cast("long").alias("dupch"),
    )

    def _flush_c(acc):
        return F.when(acc["run"] > 1, acc["run"]).otherwise(F.lit(0).cast("long"))

    def _flush_ch(acc):
        return F.when(
            acc["run"] > 1,
            acc["run"] * (F.length(acc["prev"]) - F.lit(gchar_off)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    def merge(acc, x):
        same = x.eqNullSafe(acc["prev"])
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["dupc"]).otherwise(acc["dupc"] + _flush_c(acc)).alias("dupc"),
            F.when(same, acc["dupch"]).otherwise(acc["dupch"] + _flush_ch(acc)).alias("dupch"),
        )

    def finish(acc):
        return F.struct(
            (acc["dupc"] + _flush_c(acc)).alias("dupc"),
            (acc["dupch"] + _flush_ch(acc)).alias("dupch"),
        )

    return F.aggregate(sorted_arr, zero, merge, finish)


def _top_run_chars(sorted_arr, gchar_off: int):
    """Fold a SORTED string array into the char mass of its most
    frequent element: ``count x (length - gchar_off)``, ties broken by
    the lexicographically smallest element — which is simply the FIRST
    maximal run in sorted order, so a strict ``>`` comparison suffices.
    """
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("bestc"),
        F.lit(0).cast("long").alias("bestch"),
    )

    def _better(acc):
        return acc["run"] > acc["bestc"]

    def _run_ch(acc):
        return acc["run"] * (F.length(acc["prev"]) - F.lit(gchar_off)).cast("long")

    def merge(acc, x):
        same = x.eqNullSafe(acc["prev"])
        flushed_c = F.when(_better(acc), acc["run"]).otherwise(acc["bestc"])
        flushed_ch = F.when(_better(acc), _run_ch(acc)).otherwise(acc["bestch"])
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["bestc"]).otherwise(flushed_c).alias("bestc"),
            F.when(same, acc["bestch"]).otherwise(flushed_ch).alias("bestch"),
        )

    def finish(acc):
        return F.when(_better(acc), _run_ch(acc)).otherwise(acc["bestch"])

    return F.aggregate(sorted_arr, zero, merge, finish)


def repetition_char_fractions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_ngram: int = 2,
    dup_ngram: int = 5,
) -> DataFrame:
    """The character-weighted half of the Gopher repetition rules
    (Rae et al. 2021 A1.1, the counts-based half is
    ``repetition_stats``):

    - ``dup_line_frac`` / ``dup_line_char_frac`` — within-doc
      duplicate lines, by count and by character mass
    - ``top_ngram_char_frac`` — characters covered by the most
      frequent word ``top_ngram``-gram (count x gram token chars /
      total token chars, the standard open-pipeline approximation of
      the paper's overlapping-occurrence count, capped at 1)
    - ``dup_ngram_char_frac`` — characters in ``dup_ngram``-grams
      occurring more than once, same approximation

    Ties for the top gram break lexicographically; gram character
    mass excludes the joining spaces (``len(gram) - (n-1)``) so both
    engines count identical characters. Docs with no tokens emit 0.0
    everywhere.

    Scale shape: every statistic is PER-DOCUMENT, so this is a single
    map-only projection — ``array_sort`` each doc's lines/grams, then
    one ``F.aggregate`` fold per metric counting duplicate runs (equal
    elements are adjacent after the sort, and the first maximal run IS
    the lexicographic tie-break winner). One corpus scan, zero
    shuffles, zero Python, all in codegen; replaced a 4-scan plan with
    three doc_id exchanges plus a window (6.8 s -> map-only at sf0.1).
    Per-doc cost O(L log L). The input is spread() so a single-split
    scan doesn't serialize the CPU-bound folds onto one core (no-op on
    wide inputs).
    """
    from vechord_spark.parallel import spread

    df = spread(df)
    text = F.col(text_col)

    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    toks = tokenize(text)
    tchars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, l: acc + F.length(l)
    )
    lstats = _dup_run_stats(F.array_sort(lines), 0)
    top_chars = _top_run_chars(F.array_sort(word_ngrams(text, top_ngram)), top_ngram - 1)
    dup_chars = _dup_run_stats(F.array_sort(word_ngrams(text, dup_ngram)), dup_ngram - 1)["dupch"]

    n_lines = F.size(lines)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.round(
            F.when(n_lines > 0, lstats["dupc"] / n_lines).otherwise(F.lit(0.0)), 6
        ).alias("dup_line_frac"),
        F.round(
            F.when(n_lines > 0, lstats["dupch"] / line_chars).otherwise(F.lit(0.0)), 6
        ).alias("dup_line_char_frac"),
        F.round(
            F.when(
                tchars > 0, F.least(F.lit(1.0), top_chars / tchars)
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_ngram_char_frac"),
        F.round(
            F.when(
                tchars > 0, F.least(F.lit(1.0), dup_chars / tchars)
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_ngram_char_frac"),
    )


def blocklist_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    blocklist: Sequence[str],
) -> DataFrame:
    """Per-document blocklist exposure — the C4-style "bad words"
    filter signal (C4 dropped any page containing a listed word; most
    modern pipelines threshold on the RATIO instead, which is why both
    come back):

    - ``n_tokens`` / ``n_blocked`` — token counts (engine tokenizer)
    - ``blocked_ratio`` — n_blocked / n_tokens (0.0 for empty docs)
    - ``has_blocked`` — the strict C4 verdict bit

    Scale shape: the blocklist compiles into the filter lambda as an
    ``isin`` literal — pure Column expressions, one scan, zero
    shuffles, whole-stage codegen (same shape as the Gopher rules).
    For blocklists beyond a few thousand entries, broadcast-join a
    terms table against the exploded token stream instead.
    """
    if not blocklist:
        raise ValueError("blocklist must not be empty")
    toks = tokenize(F.coalesce(F.col(text_col), F.lit("")))
    blocked = F.filter(toks, lambda t: t.isin(*[w.lower() for w in blocklist]))
    n_tokens = F.size(toks)
    n_blocked = F.size(blocked)
    return df.select(
        F.col(id_col),
        n_tokens.cast("bigint").alias("n_tokens"),
        n_blocked.cast("bigint").alias("n_blocked"),
        F.when(
            n_tokens > 0, F.round(n_blocked / n_tokens.cast("double"), 6)
        )
        .otherwise(F.lit(0.0))
        .alias("blocked_ratio"),
        (n_blocked > 0).alias("has_blocked"),
    )


class AhoCorasick:
    """Multi-pattern substring automaton (Aho & Corasick, CACM 1975)
    — goto trie + BFS failure links + collapsed output sets, built
    once driver-side and shipped to executors in the UDF closure.

    The point at scale: matching is ``O(len(text) + matches)``
    REGARDLESS of pattern count, where the naive per-pattern scan
    (``blocklist_stats``'s isin, or one ``contains`` per pattern) is
    ``O(patterns * text)`` — with a 100k-entry phrase blocklist the
    automaton is the only affordable shape. The transition step is a
    dict lookup with the standard failure-link walk; each input
    character is consumed once (failure hops are amortized by the
    matched prefix they discard).
    """

    def __init__(self, patterns: Sequence[str], lowercase: bool = True):
        pats = [p.lower() if lowercase else p for p in patterns]
        if not pats or any(not p for p in pats):
            raise ValueError("patterns must be non-empty strings")
        self.lowercase = lowercase
        self.n_patterns = len(pats)
        goto: list[dict[str, int]] = [{}]
        out: list[list[int]] = [[]]
        for pid, p in enumerate(pats):
            s = 0
            for ch in p:
                nxt = goto[s].get(ch)
                if nxt is None:
                    nxt = len(goto)
                    goto[s][ch] = nxt
                    goto.append({})
                    out.append([])
                s = nxt
            out[s].append(pid)
        # BFS failure links; collapse each state's reachable outputs so
        # the scan never walks suffix links at match time
        fail = [0] * len(goto)
        from collections import deque

        q = deque(goto[0].values())
        while q:
            s = q.popleft()
            for ch, t in goto[s].items():
                q.append(t)
                f = fail[s]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[t] = goto[f].get(ch, 0) if t != goto[f].get(ch) else 0
                out[t] = out[t] + out[fail[t]]
        self._goto, self._fail, self._out = goto, fail, out

    def scan(self, text: str) -> tuple[int, int]:
        """``(total_occurrences, distinct_patterns)`` over one text —
        every position where any pattern ends counts once per pattern
        ending there (nested patterns both count, like counting each
        pattern independently)."""
        if self.lowercase:
            text = text.lower()
        goto, fail, out = self._goto, self._fail, self._out
        s = 0
        total = 0
        seen: set[int] = set()
        for ch in text:
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            o = out[s]
            if o:
                total += len(o)
                seen.update(o)
        return total, len(seen)


def substring_blocklist_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: Sequence[str],
    lowercase: bool = True,
) -> DataFrame:
    """Per-document multi-pattern SUBSTRING exposure — the phrase-level
    companion of :func:`blocklist_stats` (which is word-level): URL
    fragments, spam phrases, boilerplate sentences. One Arrow-batched
    pass with the broadcast Aho-Corasick automaton; returns
    ``(id, n_hits, n_patterns)`` where ``n_hits`` counts every
    occurrence of every pattern (nested patterns count independently)
    and ``n_patterns`` counts distinct patterns present.

    Scale shape: automaton build is driver-side O(sum of pattern
    lengths); the corpus pass is embarrassingly parallel and O(text)
    per document independent of pattern count — the property that
    makes 100k-phrase blocklists affordable where per-pattern
    ``contains`` scans are O(patterns * text)."""
    from pyspark.sql.functions import pandas_udf

    ac = AhoCorasick(patterns, lowercase=lowercase)

    @pandas_udf("n_hits int, n_patterns int")
    def _scan(texts: pd.Series) -> pd.DataFrame:
        rows = [ac.scan(t or "") for t in texts]
        return pd.DataFrame(rows, columns=["n_hits", "n_patterns"])

    return df.select(
        F.col(id_col), _scan(F.col(text_col)).alias("__s")
    ).select(
        id_col,
        F.col("__s.n_hits").alias("n_hits"),
        F.col("__s.n_patterns").alias("n_patterns"),
    )
