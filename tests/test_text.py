"""Text analysis expression tests."""

import pytest
from pyspark.sql import functions as F

from vechord_spark.functions.text import (
    char_ngrams,
    fingerprint,
    language_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokenize,
)


def one(spark, expr, text):
    return spark.createDataFrame([(text,)], "t string").select(expr.alias("v")).collect()[0].v


def test_tokenize(spark):
    assert one(spark, tokenize("t"), "Hello, World! 12x") == ["hello", "world", "12x"]
    assert one(spark, tokenize("t"), "...") == []


def test_token_count(spark):
    assert one(spark, token_count("t"), "a b  c") == 3
    assert one(spark, token_count("t"), "") == 0


def test_char_ngrams(spark):
    assert one(spark, char_ngrams("t", 3), "abcd") == ["abc", "bcd"]
    assert one(spark, char_ngrams("t", 5), "ab") == ["ab"]  # short text -> whole


def test_punct_ratio(spark):
    assert one(spark, punct_ratio("t"), "ab!!") == pytest.approx(0.5)
    assert one(spark, punct_ratio("t"), "") == 0.0


def test_stopword_ratio(spark):
    assert one(spark, stopword_ratio("t"), "the fox and the dog") == pytest.approx(0.6)


def test_language_id(spark):
    assert one(spark, language_id("t"), "the cat is on the mat and it sleeps") == "en"
    assert one(spark, language_id("t"), "der hund ist nicht hier und die katze") == "de"
    assert one(spark, language_id("t"), "el perro es grande y la casa que vemos") == "es"
    assert one(spark, language_id("t"), "xyzzy plugh") == "unknown"


def test_fingerprint_normalizes(spark):
    a = one(spark, fingerprint("t"), "The quick  brown fox!")
    b = one(spark, fingerprint("t"), "the QUICK brown... fox")
    c = one(spark, fingerprint("t"), "a different text")
    assert a == b != c


def test_quality_score_bounds(spark):
    hi = one(spark, quality_score("t"), " ".join(["sensible", "words"] * 40))
    lo = one(spark, quality_score("t"), "!!! ??? ### $$$")
    assert 0.0 <= lo < hi <= 1.0


def test_repetition_stats_known_distribution(spark):
    from vechord_spark.operators.quality import repetition_stats

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "all distinct words here"), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(df, "doc_id", "text").collect()}
    r1 = got[1]
    assert r1.n_tokens == 4 and r1.n_distinct == 2
    assert r1.top_token_frac == 0.75 and r1.dup_token_frac == 0.5
    assert r1.top_ngram_frac == round(2 / 3, 6)  # 'a a' twice of 3 bigrams
    r2 = got[2]
    assert r2.dup_token_frac == 0.0 and r2.top_ngram_frac == round(1 / 3, 6)
    assert 3 not in got  # empty text yields no row


def test_redact_pii_all_kinds(spark):
    from vechord_spark.functions.text import pii_counts, redact_pii

    raw = ("mail a.b%x@ex-1.co.uk go https://ex.org/d/9?a=b#f ssn 123-45-6789"
           " call 555-010-1234 from 10.0.3.217 done")
    df = spark.createDataFrame([(raw,)], "t string")
    row = df.select(
        redact_pii("t").alias("red"), *pii_counts("t")
    ).collect()[0]
    assert row.red == ("mail <EMAIL> go <URL> ssn <SSN>"
                       " call <PHONE> from <IP> done")
    assert (row.n_email, row.n_url, row.n_ssn, row.n_ip, row.n_phone) == (1, 1, 1, 1, 1)


def test_redact_pii_passthrough_and_idempotent(spark):
    from vechord_spark.functions.text import redact_pii

    clean = "no sensitive content just words and numbers like 42 or 3.14"
    df = spark.createDataFrame([(clean,)], "t string")
    once = df.select(redact_pii("t").alias("r")).collect()[0].r
    assert once == clean
    redacted = "already scrubbed <EMAIL> and <IP> stay put"
    twice = (
        spark.createDataFrame([(redacted,)], "t string")
        .select(redact_pii("t").alias("r")).collect()[0].r
    )
    assert twice == redacted


def test_redact_pii_boundaries(spark):
    from vechord_spark.functions.text import redact_pii

    cases = {
        # version strings are not IPs (only 3 octets)
        "pkg v1.2.3 released": "pkg v1.2.3 released",
        # IP at end of sentence keeps the period
        "host 192.168.0.1.": "host <IP>.",
        # ssn shape wins over phone shape
        "id 999-99-9999 and 999-999-9999": "id <SSN> and <PHONE>",
    }
    for raw, want in cases.items():
        got = (
            spark.createDataFrame([(raw,)], "t string")
            .select(redact_pii("t").alias("r")).collect()[0].r
        )
        assert got == want, (raw, got, want)


# --- nb_classifier_score (in-plan Naive Bayes) ----------------------------

def test_nb_classifier_separates_classes(spark):
    import math
    from pyspark.sql import functions as F
    from vechord_spark.operators.quality import nb_classifier_score

    rows = [
        (1, "good clean prose with words", True),
        (2, "good clean text with words", True),
        (3, "zz qq xx junk junk junk", False),
        (4, "qq zz xx spam spam spam", False),
        (5, "good clean words", True),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    out = nb_classifier_score(df, "doc_id", "text", "y")
    got = {r["doc_id"]: r["nb_logodds"] for r in out.collect()}
    # positive-labeled docs score above negative-labeled docs
    assert min(got[1], got[2], got[5]) > max(got[3], got[4])
    assert all(math.isfinite(v) for v in got.values())


def test_nb_classifier_matches_hand_computation(spark):
    import math
    from vechord_spark.operators.quality import nb_classifier_score

    rows = [(1, "a a b", True), (2, "b c", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    out = {r["doc_id"]: (r["n_tokens"], r["nb_logodds"])
           for r in nb_classifier_score(df, "doc_id", "text", "y").collect()}
    # counts: a: pos 2 / neg 0; b: pos 1 / neg 1; c: pos 0 / neg 1
    # n_pos = 3, n_neg = 2, V = 3, prior = ln(1/1) = 0
    def w(cp, cn):
        return math.log((cp + 1) / (3 + 3)) - math.log((cn + 1) / (2 + 3))
    exp1 = round(w(2, 0) * 2 + w(1, 1), 6)
    exp2 = round(w(1, 1) + w(0, 1), 6)
    assert out[1] == (3, pytest.approx(exp1, abs=1e-6))
    assert out[2] == (2, pytest.approx(exp2, abs=1e-6))


def test_nb_classifier_accepts_column_label(spark):
    from pyspark.sql import functions as F
    from vechord_spark.operators.quality import nb_classifier_score

    rows = [(1, "hello world", "en"), (2, "bonjour le monde", "fr")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_classifier_score(df, "doc_id", "text", F.col("lang") == "en")
    assert {r["doc_id"] for r in out.collect()} == {1, 2}


def test_gopher_quality_hand_computed(spark):
    """Known doc: 60 words (50 x 'the' + fillers), clean prose -> passes;
    bullet-heavy and symbol-heavy docs fail the specific rule."""
    from vechord_spark.operators.quality import gopher_quality

    good = " ".join(["the word"] * 30)  # 60 words, mean len 3.5, has 'the'
    bullets = "\n".join(f"- item {i} of the list to be had" for i in range(10))
    symbols = " ".join(["### word"] * 30)
    empty = "   "
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, symbols), (4, empty)], ["id", "body"]
    )
    rows = {r.doc_id: r for r in gopher_quality(df, "id", "body").collect()}

    g = rows[1]
    assert g.n_words == 60 and abs(g.mean_word_len - 3.5) < 1e-9
    assert g.symbol_ratio == 0.0 and g.alpha_word_frac == 1.0
    # required words: only 'the' -> n_required_words == 1 -> fails
    assert g.n_required_words == 1 and not g.passes_gopher

    b = rows[2]
    assert b.bullet_line_frac == 1.0 and not b.passes_gopher

    s = rows[3]
    # 60 words, 90 '#' chars -> ratio 1.5 > 0.1
    assert abs(s.symbol_ratio - 1.5) < 1e-9 and not s.passes_gopher

    e = rows[4]
    assert e.n_words == 0 and e.mean_word_len == 0.0 and not e.passes_gopher


def test_gopher_quality_passing_doc(spark):
    """A doc engineered to satisfy every rule passes."""
    from vechord_spark.operators.quality import gopher_quality

    body = (
        "the cat sat with all of these and that other thing to have been "
    ) * 5  # 65 words, plenty of required words, clean
    df = spark.createDataFrame([(7, body)], ["id", "body"])
    r = gopher_quality(df, "id", "body").collect()[0]
    assert r.passes_gopher, r
    assert r.n_required_words >= 5
    assert 3.0 <= r.mean_word_len <= 10.0


def test_gopher_quality_ellipsis_lines(spark):
    from vechord_spark.operators.quality import gopher_quality

    body = "\n".join(
        ["the line of text to be had with that"] * 6
        + ["trailing off with the rest..."] * 4
    )
    r = gopher_quality(
        spark.createDataFrame([(1, body)], ["id", "body"]), "id", "body"
    ).collect()[0]
    assert abs(r.ellipsis_line_frac - 0.4) < 1e-9
    # 0.4 > 0.3 threshold -> fails despite everything else
    assert not r.passes_gopher


def test_top_tfidf_terms_hand_computed(spark):
    """3-doc corpus: a term unique to one doc outranks corpus-wide
    terms; ties break alphabetically; ranks are 1..k."""
    import math

    from vechord_spark.operators.quality import top_tfidf_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "common common cherry"),
        ],
        ["id", "body"],
    )
    out = top_tfidf_terms(docs, "id", "body", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term, r.score))
    for v in by_doc.values():
        v.sort()
    # doc 1: apple tf=2 df=1 -> 2*(ln(4/2)+1); banana tf=1 df=2
    exp_apple = round(2 * (math.log(4 / 2) + 1), 6)
    assert by_doc[1][0] == (1, "apple", exp_apple)
    assert by_doc[1][1][1] == "banana"
    # doc 3: common tf=2 df=3 -> idf = ln(4/4)+1 = 1 -> score 2.0
    assert by_doc[3][0] == (1, "common", 2.0)
    assert all(len(v) == 2 for v in by_doc.values())


def test_repetition_char_fractions_hand_computed(spark):
    from vechord_spark.operators.quality import repetition_char_fractions

    # doc 1: 3 lines, 'dup line' twice (8 chars each), 'solo' once (4)
    #   dup_line_frac = 2/3; dup_line_char_frac = 16/20
    # tokens: dup line dup line solo -> 2-grams: 'dup line' x2,
    # 'line dup' 'line solo' -> top = 2*(8-1)=14 chars? gchars=len-1=7
    # tchars = 3+4+3+4+4 = 18 -> top_frac = 14/18
    # 5-grams: exactly one ('dup line dup line solo') c=1 -> dup5 = 0
    body1 = "dup line\nsolo\ndup line"
    # doc 2: no repetition at all
    body2 = "alpha beta\ngamma delta"
    df = spark.createDataFrame([(1, body1), (2, body2)], ["id", "body"])
    rows = {r.doc_id: r for r in repetition_char_fractions(df, "id", "body").collect()}
    r1 = rows[1]
    assert abs(r1.dup_line_frac - round(2 / 3, 6)) < 1e-9
    assert abs(r1.dup_line_char_frac - 0.8) < 1e-9
    assert abs(r1.top_ngram_char_frac - round(14 / 18, 6)) < 1e-9
    assert r1.dup_ngram_char_frac == 0.0
    r2 = rows[2]
    assert r2.dup_line_frac == 0.0 and r2.dup_line_char_frac == 0.0
    assert r2.dup_ngram_char_frac == 0.0
    # 4 tokens -> single whole-text 5-gram, c=1 -> still 0; top 2-gram
    # 'alpha beta' c=1 gchars=10-1=9; tchars=5+4+5+5=19 -> 9/19
    assert abs(r2.top_ngram_char_frac - round(9 / 19, 6)) < 1e-9


def test_repetition_char_fractions_empty_doc(spark):
    from vechord_spark.operators.quality import repetition_char_fractions

    df = spark.createDataFrame([(1, ""), (2, "   \n  ")], ["id", "body"])
    rows = {r.doc_id: r for r in repetition_char_fractions(df, "id", "body").collect()}
    for r in rows.values():
        assert (
            r.dup_line_frac == 0.0
            and r.dup_line_char_frac == 0.0
            and r.top_ngram_char_frac == 0.0
            and r.dup_ngram_char_frac == 0.0
        )


def test_perplexity_buckets(spark):
    from vechord_spark.operators.quality import perplexity_buckets

    rows = [(i, "en", float(i)) for i in range(9)] + [
        (100 + i, "fr", float(i * 10)) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    got = {r.doc_id: r.ppl_bucket
           for r in perplexity_buckets(df, "lang", "score").collect()}
    # en: 9 values 0..8 -> q_lo ~ 2.67, q_hi ~ 5.33
    assert [got[i] for i in range(9)] == [
        "tail", "tail", "tail", "middle", "middle", "middle",
        "head", "head", "head",
    ]
    # fr: 3 values 0,10,20 -> q_lo ~ 6.67, q_hi ~ 13.33
    assert [got[100], got[101], got[102]] == ["tail", "middle", "head"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        perplexity_buckets(df, "lang", "score", cuts=(0.7, 0.3))


def test_bigram_logprob_hand_computed(spark):
    import math

    from vechord_spark.operators.quality import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bigram_logprob(df, "doc_id", "text").collect()}
    # corpus tokens: a b a b a -> c1: a=3, b=2, T=5
    # bigrams (doc 1): (a,b) x2, (b,a) x1 -> c2: ab=2, ba=1
    lam = 0.75
    p_ab = lam * 2 / 3 + (1 - lam) * 2 / 5
    p_ba = lam * 1 / 2 + (1 - lam) * 3 / 5
    want = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert rows[1].n_bigrams == 3
    assert abs(rows[1].avg_logprob - round(want, 6)) < 1e-9
    # <2-token docs stay visible with NULL score
    assert rows[2].n_bigrams == 0 and rows[2].avg_logprob is None
    assert rows[3].n_bigrams == 0 and rows[3].avg_logprob is None
    import pytest as _pytest
    with _pytest.raises(ValueError):
        bigram_logprob(df, "doc_id", "text", lam=1.0)


def test_dsir_importance_separates_domains(spark):
    from vechord_spark.operators.quality import dsir_importance

    rows = (
        [(i, "en", "alpha beta gamma delta") for i in range(20)]
        + [(100 + i, "fr", "zeta eta theta iota") for i in range(20)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r.doc_id: r.importance
        for r in dsir_importance(
            df, "doc_id", "text", df.lang == "en"
        ).collect()
    }
    # target-domain docs score strictly above out-of-domain docs
    assert min(got[i] for i in range(20)) > max(got[100 + i] for i in range(20))
    # ln P_target - ln P_corpus is positive for target-exclusive tokens
    assert all(got[i] > 0 for i in range(20))
    assert all(got[100 + i] < 0 for i in range(20))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dsir_importance(df, "doc_id", "text", df.lang == "en", n_buckets=0)


def test_char_entropy_hand_computed(spark):
    import math

    from vechord_spark.operators.quality import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in char_entropy(df, "doc_id", "text").collect()}
    assert got[1].entropy_bits == 0.0 and got[1].n_chars == 4
    assert abs(got[2].entropy_bits - 1.0) < 1e-9          # two equiprobable chars
    assert abs(got[3].entropy_bits - 2.0) < 1e-9          # four equiprobable chars
    assert got[4].n_chars == 0 and got[4].entropy_bits == 0.0
    # NULL text keeps its row with (0, 0.0) — same as empty (the suite
    # oracle's LEFT JOIN coalesces absent docs the same way)
    assert got[5].n_chars == 0 and got[5].entropy_bits == 0.0
    # repeated-char spam scores strictly below natural-ish text
    assert got[1].entropy_bits < got[2].entropy_bits < got[3].entropy_bits


def test_blocklist_stats(spark):
    from vechord_spark.operators.quality import blocklist_stats

    df = spark.createDataFrame(
        [
            (1, "clean text only here"),
            (2, "this has one BAD word"),
            (3, "bad bad bad"),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in blocklist_stats(df, "doc_id", "text", ["bad"]).collect()}
    assert not got[1].has_blocked and got[1].blocked_ratio == 0.0
    assert got[2].has_blocked and got[2].n_blocked == 1  # case-folded
    assert got[3].blocked_ratio == 1.0
    assert got[4].n_tokens == 0 and got[4].blocked_ratio == 0.0
    assert got[5].n_tokens == 0 and not got[5].has_blocked  # NULL-safe
    import pytest as _p
    with _p.raises(ValueError):
        blocklist_stats(df, "doc_id", "text", [])


# ---------------------------------------------------------------------------
# Aho-Corasick phrase blocklist (round 11)


def test_aho_corasick_matches_brute_force():
    import random

    from vechord_spark.operators.quality import AhoCorasick

    def brute(text, pats):
        text = text.lower()
        total, distinct = 0, 0
        for p in pats:
            c = sum(1 for i in range(len(text)) if text.startswith(p, i))
            total += c
            distinct += 1 if c else 0
        return total, distinct

    rng = random.Random(9)
    for _ in range(200):
        alpha = "abc "
        pats = list(
            {
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 4))).strip()
                or "a"
                for _ in range(rng.randint(1, 6))
            }
        )
        text = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 60)))
        ac = AhoCorasick(pats)
        assert ac.scan(text) == brute(text, pats)


def test_aho_corasick_nested_and_overlapping():
    from vechord_spark.operators.quality import AhoCorasick

    # nested: "data" fires inside "data slow" (suffix outputs)
    assert AhoCorasick(["data", "data slow"]).scan(
        "data slow data x DATA SLOW"
    ) == (5, 2)
    # overlapping occurrences all count ("aa" in "aaaa" -> 3)
    assert AhoCorasick(["aa"]).scan("aaaa") == (3, 1)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        AhoCorasick([])
    with _pytest.raises(ValueError):
        AhoCorasick(["ok", ""])


def test_substring_blocklist_stats(spark):
    from vechord_spark.operators.quality import substring_blocklist_stats

    df = spark.createDataFrame(
        [
            (1, "the table scan then table scan again"),
            (2, "no phrases here"),
            (3, None),
            (4, "Table Scan uppercase and data slow tail"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["n_patterns"])
        for r in substring_blocklist_stats(
            df, "doc_id", "text", ["table scan", "data slow", "data"]
        ).collect()
    }
    assert got[1] == (2, 1)
    assert got[2] == (0, 0)
    assert got[3] == (0, 0)  # NULL text scans as empty
    assert got[4] == (3, 3)  # table scan + data slow + nested data


# ---------------------------------------------------------------------------
# mojibake repair (round 11)


def test_fix_mojibake_round_trips():
    from vechord_spark.operators.normalize import fix_mojibake

    for s in ("café", "naïve — №5", "Zürich", "plain ascii", "日本語テキスト"):
        assert fix_mojibake(s) == (s, 0)  # clean text untouched
        m1 = s.encode("utf-8").decode("latin-1")
        if m1 != s:
            assert fix_mojibake(m1) == (s, 1)
            m2 = m1.encode("utf-8").decode("latin-1")
            assert fix_mojibake(m2) == (s, 2)


def test_fix_mojibake_bounds_passes():
    from vechord_spark.operators.normalize import fix_mojibake

    s = "déjà vu"
    deep = s
    for _ in range(5):
        deep = deep.encode("utf-8").decode("latin-1")
    fixed, n = fix_mojibake(deep, max_passes=3)
    assert n == 3 and fixed != s  # bounded: three of five layers undone
    assert fix_mojibake(fixed, max_passes=5) == (s, 2)  # rest recoverable


def test_scrub_mojibake_spark(spark):
    from vechord_spark.operators.normalize import scrub_mojibake

    rows = [
        (1, "café".encode("utf-8").decode("latin-1")),
        (2, "clean café"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["text"], r["mojibake_passes"])
        for r in scrub_mojibake(df, "doc_id", "text").collect()
    }
    assert got[1] == ("café", 1)
    assert got[2] == ("clean café", 0)
    assert got[3] == (None, 0)


def test_mojibake_property_roundtrip():
    """Property (hypothesis): over ASCII + U+00C0..U+00FF — an
    alphabet whose non-ASCII chars map to cp1252/latin-1 bytes
    0xC0-0xFF, which can never form valid multi-byte UTF-8 without
    continuation bytes (0x80-0xBF, excluded) — fix_mojibake is
    provably exact: clean text is a fixpoint (0 passes), and one
    corruption layer repairs in exactly one pass whenever the
    corruption changed anything."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vechord_spark.operators.normalize import fix_mojibake

    safe = st.text(
        alphabet=st.one_of(
            st.characters(min_codepoint=0x20, max_codepoint=0x7E),
            st.characters(min_codepoint=0xC0, max_codepoint=0xFF),
        ),
        max_size=80,
    )

    @settings(max_examples=300, deadline=None)
    @given(safe)
    def prop(s):
        assert fix_mojibake(s) == (s, 0)
        m = s.encode("utf-8").decode("latin-1")
        expected = (s, 1) if m != s else (s, 0)
        assert fix_mojibake(m) == expected

    prop()


def test_kneser_ney_semantics(spark):
    """KN's defining behavior vs raw-frequency backoff: a word that is
    FREQUENT but follows only one context gets a small continuation
    weight; a word with many distinct predecessors gets a large one.
    Plus: probabilities per context sum to 1 (a real distribution)."""
    import math

    from vechord_spark.operators.quality import kneser_ney_logprob

    # "francisco" appears 4x but ONLY after "san"; "x" appears 4x
    # after 4 different words
    corpus = [
        (1, "san francisco san francisco"),
        (2, "san francisco san francisco"),
        (3, "a x b x c x d x"),
        (4, "one two"),
        (5, "solo"),
    ]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in kneser_ney_logprob(df, "doc_id", "text").collect()}
    assert out[5]["n_bigrams"] == 0 and out[5]["avg_kn_logprob"] is None
    assert out[4]["n_bigrams"] == 1
    # repeated high-count bigrams score higher than one-off bigrams
    assert out[1]["avg_kn_logprob"] > out[4]["avg_kn_logprob"]

    # distribution check in pure python with the same formula
    from collections import Counter, defaultdict

    toks = []
    for _, t in corpus:
        ws = t.split()
        toks.extend(zip(ws, ws[1:]))
    c2 = Counter(toks)
    ctx = defaultdict(float)
    fwd = defaultdict(set)
    back = defaultdict(set)
    for (a, b), c in c2.items():
        ctx[a] += c
        fwd[a].add(b)
        back[b].add(a)
    B = len(c2)
    D = 0.75
    vocab_cur = {b for _, b in c2}
    for a in ctx:
        s = sum(
            max(c2.get((a, w), 0) - D, 0.0) / ctx[a]
            + D * len(fwd[a]) / ctx[a] * len(back[w]) / B
            for w in vocab_cur
        )
        # sums to 1 over words seen as continuations ANYWHERE (the
        # closed vocabulary the continuation distribution is over)
        assert math.isclose(s, 1.0, rel_tol=1e-9), (a, s)


def test_script_mix_counts_ranges(spark):
    """script_mix fractions per script class on a mixed-script doc;
    literal codepoint ranges, BMP classes (the cross-engine contract)."""
    from vechord_spark.operators.quality import script_mix

    df = spark.createDataFrame(
        [(1, "abc МИР 中文 123"), (2, ""), (3, "....")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in script_mix(df, "doc_id", "text").collect()}
    r1 = rows[1]  # 15 chars: 3 latin, 3 cyr, 2 cjk, 3 digit, 3 space, 1? -> recount
    n = len("abc МИР 中文 123")
    assert abs(r1["latin_frac"] - round(3 / n, 6)) < 1e-9
    assert abs(r1["cyrillic_frac"] - round(3 / n, 6)) < 1e-9
    assert abs(r1["cjk_frac"] - round(2 / n, 6)) < 1e-9
    assert abs(r1["digit_frac"] - round(3 / n, 6)) < 1e-9
    assert abs(r1["space_frac"] - round(3 / n, 6)) < 1e-9
    assert abs(r1["other_frac"] - 0.0) < 1e-9
    assert rows[2]["latin_frac"] is None  # empty doc -> NULL fractions
    assert rows[3]["other_frac"] == 1.0  # punctuation is unclassified


def test_kn_perplexity_gate_drops_gibberish_tail(spark):
    """The LM gate drops the bottom drop_frac quantile by KN logprob:
    fluent repeated-pattern docs survive, the shuffled-token outliers
    drop first; drop_frac=0 keeps everything."""
    from vechord_spark.operators.quality import kn_perplexity_gate

    fluent = "the quick brown fox jumps over the lazy dog"
    rows = [(i, fluent) for i in range(8)]
    # gibberish: same tokens, orders never repeated elsewhere
    rows += [(100, "dog the over fox quick jumps brown lazy the")]
    rows += [(101, "lazy jumps the dog brown over quick the fox")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    kept = kn_perplexity_gate(df, "doc_id", "text", drop_frac=0.2)
    ids = sorted(x["doc_id"] for x in kept.collect())
    assert 100 not in ids and 101 not in ids  # the unpredictable tail
    assert ids == list(range(8))

    assert kn_perplexity_gate(df, "doc_id", "text", drop_frac=0.0).count() == 10
    import pytest as _pytest

    with _pytest.raises(ValueError, match="drop_frac"):
        kn_perplexity_gate(df, "doc_id", "text", drop_frac=1.0)
