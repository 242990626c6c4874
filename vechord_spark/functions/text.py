"""Text analysis expressions: tokenization, quality, language-ID,
fingerprints.

The reference tokenizes inside Postgres (``tokenize(text, model)``,
vechord/client.py:230-238) with bert/wiki tokenizers. Those models are
not available here; the engine pins a deterministic, documented
"simple" tokenizer (lowercase, split on non-alphanumeric) that is
expressible identically in Spark SQL and in the DuckDB oracle — BM25
parity is validated at ranking level, per SURVEY §7.3.

All of these are pure Column expressions (JVM-side, codegen-friendly);
none require Python UDFs, so they run at full scan speed on a cluster.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column, functions as F

ColumnOrName = Union[Column, str]

TOKEN_SPLIT_REGEX = "[^a-z0-9]+"

# small multilingual stopword sets for the n-gram/stopword language
# heuristic. Deterministic and mirrored in oracle SQL.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "es": ["el", "la", "que", "de", "es"],
    "fr": ["le", "la", "et", "les", "des"],
}

STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "this", "that",
]


def _as_col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokenize(text: ColumnOrName) -> Column:
    """Lowercase + split on non-alphanumeric, empty tokens dropped.

    DuckDB-oracle equivalent:
    ``list_filter(string_split_regex(lower(x), '[^a-z0-9]+'), t -> t <> '')``
    """
    toks = F.split(F.lower(_as_col(text)), TOKEN_SPLIT_REGEX)
    return F.filter(toks, lambda t: t != "")


def token_count(text: ColumnOrName) -> Column:
    """Whitespace/punct token count."""
    return F.size(tokenize(text))


def contains_phrase(text: ColumnOrName, words: list[str]) -> Column:
    """True when the token sequence of ``text`` contains ``words`` as
    a CONTIGUOUS run (order and duplicates matter — this is phrase
    match, not bag-of-words). Pure Column expression: ``exists`` over
    candidate start positions with an unrolled per-word equality
    conjunction, all inside codegen.

    DuckDB-oracle equivalent (space-join trick, exact because tokens
    never contain spaces):
    ``' ' || array_to_string(tokens, ' ') || ' ' LIKE '% w1 w2 %'``.
    """
    if not words:
        return F.lit(False)
    m = len(words)

    # bind the token array ONCE (1-element outer transform, the
    # expression-API `let`): a lambda capturing the tokenize() tree
    # re-evaluates it per candidate start position — O(len^2) regex
    # work per row, the same trap word_ngrams had
    def _match(toks: Column) -> Column:
        n = F.size(toks)

        def _at(i: Column) -> Column:
            cond = F.element_at(toks, i) == words[0]
            for j in range(1, m):
                cond = cond & (F.element_at(toks, i + F.lit(j)) == words[j])
            return cond

        starts = F.sequence(F.lit(1), n - F.lit(m) + F.lit(1))
        # guard: Spark's sequence(1, stop) DESCENDS when stop < 1,
        # which would probe bogus positions — short texts are False
        return F.when(n >= F.lit(m), F.exists(starts, _at)).otherwise(
            F.lit(False)
        )

    return F.element_at(
        F.transform(F.array(tokenize(text)), _match), 1
    )


def char_ngrams(text: ColumnOrName, n: int = 5) -> Column:
    """Character n-gram (shingle) array over the lowercased text.

    Built with ``sequence`` + ``transform`` + ``substring`` — no UDF; the
    shingle set feeds MinHash / Jaccard dedup (operators/dedup.py).

    The lowered text is bound ONCE as a lambda variable (1-element
    outer transform): a lambda capturing the ``lower()`` tree would
    re-lower the document per shingle position — the O(doc^2) trap
    word_ngrams had (round 10).
    """

    def _grams(t: Column) -> Column:
        length = F.length(t)
        starts = F.sequence(
            F.lit(1), F.greatest(length - F.lit(n - 1), F.lit(1))
        )
        return F.when(
            length >= n,
            F.transform(starts, lambda i: t.substr(i, F.lit(n))),
        ).otherwise(F.array(t))

    return F.flatten(
        F.transform(F.array(F.lower(_as_col(text))), _grams)
    )


def word_ngrams(text: ColumnOrName, n: int = 3) -> Column:
    """Word n-gram (shingle) array — the document-dedup standard.

    O(shingle) per element (array slice + join), unlike character
    shingles whose per-index ``substring`` over a long UTF8 string is
    O(doc) each (quadratic per document — measurably the bottleneck at
    1M+ shingles). Texts shorter than ``n`` tokens yield one shingle of
    the whole text.

    DuckDB-oracle equivalent: ``list_transform(generate_series(1,
    len(toks) - n + 1), i -> array_to_string(list_slice(toks, i,
    i + n - 1), ' '))``.
    """
    # Bind the token array ONCE as a lambda variable: higher-order
    # lambdas re-evaluate captured expression trees per element, so
    # `slice(tokenize(text), i, n)` re-tokenizes the document for
    # EVERY shingle position — O(len^2) regex work per row (measured
    # 7.5 s -> 0.6 s for 5k docs at sf0.1 with the binding). The
    # 1-element outer transform is the expression-API idiom for `let`.
    def _ngrams(tk: Column) -> Column:
        starts = F.sequence(
            F.lit(1), F.greatest(F.size(tk) - F.lit(n - 1), F.lit(1))
        )
        return F.when(
            F.size(tk) >= n,
            F.transform(starts, lambda i: F.concat_ws(" ", F.slice(tk, i, n))),
        ).otherwise(F.array(F.concat_ws(" ", tk)))

    return F.flatten(
        F.transform(F.array(tokenize(text)), _ngrams)
    )


def punct_ratio(text: ColumnOrName) -> Column:
    """Fraction of characters that are not alphanumeric or whitespace."""
    t = _as_col(text)
    total = F.length(t)
    clean = F.length(F.regexp_replace(t, "[^a-zA-Z0-9\\s]", ""))
    return F.when(total > 0, (total - clean).cast("double") / total).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(text: ColumnOrName) -> Column:
    """Fraction of tokens that are English stopwords (quality signal)."""
    toks = tokenize(text)
    stops = F.filter(toks, lambda t: t.isin(STOPWORDS_EN))
    return F.when(F.size(toks) > 0, F.size(stops).cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def mean_token_length(text: ColumnOrName) -> Column:
    toks = tokenize(text)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def quality_score(text: ColumnOrName) -> Column:
    """Heuristic document-quality score in [0, 1].

    Combines length, punctuation, and token-shape signals the way
    large-corpus filtering pipelines (C4/Gopher-style rules) do. Fully
    SQL-expressible so the score is pushdown-friendly and oracle-checkable.
    """
    t = _as_col(text)
    n_tok = token_count(t).cast("double")
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - punct_ratio(t) * 4.0, F.lit(0.0))
    mean_len = mean_token_length(t)
    shape_score = F.when((mean_len >= 2.0) & (mean_len <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return F.round((len_score * 0.5 + punct_pen * 0.3 + shape_score * 0.2), 6)


def language_id(text: ColumnOrName) -> Column:
    """Stopword-marker language heuristic -> {en, de, es, fr, unknown}.

    Scores each language by the number of its marker words present in
    the token set; ties break by language code order. Deterministic and
    expressible in the DuckDB oracle with the same marker lists.
    """
    toks = tokenize(text)
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = LANG_MARKERS[lang]
        hits = F.size(F.filter(toks, lambda t: t.isin(markers)))
        scores.append((lang, hits))
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("unknown")
    # build reverse so earlier languages win ties via last-wins chaining
    for lang, hits in reversed(scores):
        result = F.when((best_score > 0) & (hits == best_score), F.lit(lang)).otherwise(
            result
        )
    return result


def fingerprint(text: ColumnOrName) -> Column:
    """Document fingerprint: md5 of the whitespace/punct-normalized,
    lowercased text. Identical rows (modulo formatting) collide —
    the exact-dedup key. md5 is bit-identical in Spark and DuckDB."""
    normalized = F.concat_ws(" ", tokenize(text))
    return F.md5(normalized)


# PII redaction patterns, applied in order (earlier patterns must not
# leave fragments later ones would mis-match: SSN's 3-2-4 shape runs
# before the generic 3-3-4 phone; IPv4 before phone so dotted digit
# runs are never half-eaten). Every pattern is restricted to the
# regex subset with identical semantics in Java (Spark) and RE2
# (DuckDB oracle): classes, bounded repeats, ASCII \b — no
# lookaround, no backreferences.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[A-Za-z0-9./_%?=&#~-]+", "<URL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def redact_pii(text: ColumnOrName) -> Column:
    """Replace emails, URLs, SSNs, IPv4s and phone numbers with typed
    placeholder tokens — the standard scrub pass before training-data
    release. Chained ``regexp_replace`` Column expressions: JVM-side,
    codegen-friendly, no Python in the scan.

    DuckDB-oracle equivalent: the same patterns via
    ``regexp_replace(x, pat, repl, 'g')`` in ``PII_PATTERNS`` order.
    """
    out = _as_col(text)
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: ColumnOrName) -> list[Column]:
    """One ``n_<kind>`` long Column per PII pattern, counting matches
    in the raw text (detection signal; pairs with :func:`redact_pii`)."""
    t = _as_col(text)
    return [
        F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
