"""Unigram-LM tokenizer (SentencePiece's algorithm, Viterbi-EM
variant): Viterbi optimality, training convergence, determinism,
encodability floor, save/load, Arrow counting column."""

import math

import pytest

from vechord_spark.functions.unigram import (
    UnigramTokenizer,
    _viterbi,
    train_from_frequencies,
    train_unigram,
)


def test_viterbi_matches_brute_force():
    """DP best segmentation == brute-force enumeration over all 2^(n-1)
    splits, on every word over a small vocab."""
    logp = {
        "a": math.log(0.2),
        "b": math.log(0.1),
        "ab": math.log(0.3),
        "ba": math.log(0.05),
        "aba": math.log(0.25),
        "bb": math.log(0.1),
    }

    def brute(word):
        n = len(word)
        best, best_seg = -math.inf, None
        for mask in range(1 << (n - 1)):
            cuts = [0] + [i + 1 for i in range(n - 1) if mask >> i & 1] + [n]
            seg = [word[a:b] for a, b in zip(cuts, cuts[1:])]
            if any(p not in logp for p in seg):
                continue
            score = sum(logp[p] for p in seg)
            if score > best:
                best, best_seg = score, seg
        return best, best_seg

    for word in ("ab", "aba", "abab", "bbaab", "ababa", "aabbaa"):
        got = _viterbi(word, logp, 3)
        score = sum(logp[p] for p in got)
        want_score, _ = brute(word)
        assert abs(score - want_score) < 1e-12, (word, got)

    # unseen character falls back to per-char pieces, never crashes
    assert _viterbi("axb", logp, 3) == ["a", "x", "b"]


def test_train_keeps_whole_words_on_tiny_corpus():
    """On a corpus of a few repeated words, the fitted model keeps the
    full-word pieces and Viterbi segments each word as ONE piece — the
    convergence property the suite oracle pins."""
    freqs = [("alpha", 50), (" alpha", 40), ("omega", 30), (" omega", 20)]
    tok = train_from_frequencies(freqs, vocab_size=40, em_iters=3)
    for w, _ in freqs:
        assert tok.encode_word(w) == [w]
    # deterministic: same input -> identical model
    tok2 = train_from_frequencies(freqs, vocab_size=40, em_iters=3)
    assert tok.logp == tok2.logp


def test_chars_never_pruned_and_roundtrip(tmp_path):
    freqs = [("abcabc", 10), ("cab", 5), ("bca", 5)]
    tok = train_from_frequencies(freqs, vocab_size=4, em_iters=2)
    assert {"a", "b", "c"} <= set(tok.vocab)  # encodability floor
    # every word still encodes, and pieces concatenate back exactly
    for w in ("abcabc", "cab", "bca", "aaa"):
        seg = tok.encode_word(w)
        assert "".join(seg) == w
    p = tmp_path / "uni.json"
    tok.save(str(p))
    loaded = UnigramTokenizer.load(str(p))
    assert loaded.logp == tok.logp


def test_train_unigram_distributed_and_count_column(spark):
    df = spark.createDataFrame(
        [("alpha omega alpha",), ("omega omega",), ("alpha",)], ["text"]
    )
    tok = train_unigram(df, "text", vocab_size=60, em_iters=2)
    # pre-tokens: "alpha", " omega", " alpha", "omega" — all single-piece
    assert tok.token_count("alpha omega alpha") == 3
    out = df.select(tok.token_count_column("text").alias("n")).collect()
    assert sorted(x["n"] for x in out) == [1, 2, 3]
    with pytest.raises(ValueError):
        train_from_frequencies([], vocab_size=10)


def test_viterbi_matches_brute_force_fuzzed():
    """Hypothesis fuzz of the DP against brute-force enumeration:
    random piece vocabularies (chars always present) and random words
    over a 3-letter alphabet — the DP's best score must equal the
    exhaustive optimum for every case."""
    from hypothesis import given, settings, strategies as st

    alphabet = "abc"

    @settings(max_examples=60, deadline=None)
    @given(
        word=st.text(alphabet=alphabet, min_size=1, max_size=7),
        pieces=st.sets(
            st.text(alphabet=alphabet, min_size=2, max_size=4), max_size=8
        ),
        weights=st.data(),
    )
    def run(word, pieces, weights):
        vocab = sorted(set(alphabet) | pieces)
        logp = {
            p: weights.draw(
                st.floats(min_value=-8.0, max_value=-0.1), label=p
            )
            for p in vocab
        }
        max_len = max(len(p) for p in vocab)
        got = _viterbi(word, logp, max_len)
        assert "".join(got) == word
        got_score = sum(logp[p] for p in got)

        n = len(word)
        best = -math.inf
        for mask in range(1 << (n - 1)):
            cuts = [0] + [i + 1 for i in range(n - 1) if mask >> i & 1] + [n]
            seg = [word[a:b] for a, b in zip(cuts, cuts[1:])]
            if all(p in logp for p in seg):
                best = max(best, sum(logp[p] for p in seg))
        assert abs(got_score - best) < 1e-9, (word, got, got_score, best)

    run()
