"""BPE trainer/encoder parity: the Spark-facing implementation in
functions/bpe.py is pinned against a naive from-the-definition BPE
written independently here (recount every pair from scratch per merge;
encode by repeatedly applying the lowest-rank merge), then the
distributed pieces are exercised end-to-end on a SparkSession."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vechord_spark.functions.bpe import (
    BpeTokenizer,
    pretokenize,
    train_bpe,
    train_from_frequencies,
    word_frequencies,
)

# ---------------------------------------------------------------------------
# Naive reference (written from the published algorithm, not from the
# module under test): training recounts all pairs per merge; encoding
# re-scans for the lowest-rank pair per step.


def _syms(word: str):
    b = word.encode("utf-8")
    return [b[i : i + 1] for i in range(len(b))]


def _merge_all(syms, pair):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(pair[0] + pair[1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def naive_train(word_freqs, num_merges):
    words = {w: _syms(w) for w, _ in word_freqs}
    freqs = dict(word_freqs)
    merges = []
    for _ in range(num_merges):
        counts = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freqs[w]
        if not counts:
            break
        best_n = max(counts.values())
        best = min(p for p, n in counts.items() if n == best_n)
        merges.append(best)
        words = {w: _merge_all(s, best) for w, s in words.items()}
    return merges


def naive_encode(text, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    out = []
    for w in pretokenize(text):
        syms = _syms(w)
        while len(syms) > 1:
            pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
            ranked = [p for p in pairs if p in ranks]
            if not ranked:
                break
            best = min(ranked, key=lambda p: ranks[p])
            syms = _merge_all(syms, best)
        out.extend(syms)
    return out


# ---------------------------------------------------------------------------


def test_pretokenize_leading_space_attaches():
    assert pretokenize("hello world") == ["hello", " world"]
    assert pretokenize("a1 b2") == ["a", "1", " b", "2"]
    assert pretokenize("") == []
    assert pretokenize("  x") == [" ", " x"]
    assert pretokenize("a_b c!") == ["a", "_", "b", " c", "!"]


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=40))
def test_pretokenize_is_lossless(text):
    assert "".join(pretokenize(text)) == text


def test_trainer_matches_naive_on_small_corpus():
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3), (" low", 4)]
    for k in (0, 1, 3, 8, 50):
        fast = train_from_frequencies(wf, k).merges
        assert fast == naive_train(wf, k), f"num_merges={k}"


def test_encode_matches_naive():
    wf = [("aaab", 3), ("abab", 2), ("ba", 7), (" aa", 5)]
    tok = train_from_frequencies(wf, 6)
    for text in ["aaab abab", "ba ba aaab", " aa", "zzz aaab", ""]:
        assert tok.encode(text) == naive_encode(text, tok.merges), text


def test_encode_unicode_roundtrip():
    wf = [("héllo", 4), ("wörld", 3), ("héllo wörld", 1)]
    tok = train_from_frequencies(wf, 12)
    text = "héllo wörld héllo"
    toks = tok.encode(text)
    assert b"".join(toks).decode("utf-8") == text
    assert toks == naive_encode(text, tok.merges)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.sampled_from("ab c") ,
                min_size=1,
                max_size=6,
            ),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=12),
    st.text(alphabet=st.sampled_from("abc xyz"), max_size=24),
)
def test_fuzz_trainer_and_encoder_match_naive(wf_raw, k, text):
    # dedupe words (frequency tables are keyed), keep first freq
    seen = {}
    for w, f in wf_raw:
        seen.setdefault(w, f)
    wf = sorted(seen.items())
    fast = train_from_frequencies(wf, k)
    assert fast.merges == naive_train(wf, k)
    assert fast.encode(text) == naive_encode(text, fast.merges)
    # token bytes always reassemble the input exactly
    assert b"".join(fast.encode(text)).decode("utf-8") == text


def test_training_is_deterministic_under_input_order():
    wf = [("ab", 3), ("ba", 3), ("aa", 3), ("bb", 3)]
    a = train_from_frequencies(wf, 4).merges
    rng = random.Random(7)
    for _ in range(5):
        shuffled = wf[:]
        rng.shuffle(shuffled)
        assert train_from_frequencies(shuffled, 4).merges == a


def test_zero_merges_is_byte_tokenization():
    tok = BpeTokenizer([])
    assert tok.token_count("abc de") == 6
    assert tok.token_count("héllo") == 6  # é is 2 UTF-8 bytes


# ---------------------------------------------------------------------------
# Spark end-to-end


def test_word_frequencies_counts_and_cap(spark):
    df = spark.createDataFrame(
        [("the cat sat",), ("the cat",), ("the",)], ["text"]
    )
    rows = {r["word"]: r["freq"] for r in word_frequencies(df).collect()}
    assert rows == {"the": 3, " cat": 2, " sat": 1}
    top = word_frequencies(df, max_words=1).collect()
    assert [(r["word"], r["freq"]) for r in top] == [("the", 3)]


def test_train_bpe_end_to_end_matches_local(spark, docs):
    sample = docs.select("text").limit(60)
    tok = train_bpe(sample, num_merges=40, max_words=10_000)
    # same corpus through the naive trainer over the same freq table
    wf = [
        (r["word"], r["freq"])
        for r in word_frequencies(sample, max_words=10_000).collect()
    ]
    assert tok.merges == naive_train(wf, 40)
    assert len(tok.merges) == 40  # real text has >40 mergeable pairs


def test_token_count_column_matches_scalar(spark, docs):
    sample = docs.select("doc_id", "text").limit(30)
    tok = train_bpe(sample, num_merges=30)
    got = {
        r["doc_id"]: r["n"]
        for r in sample.select(
            "doc_id", tok.token_count_column("text").alias("n")
        ).collect()
    }
    want = {
        r["doc_id"]: tok.token_count(r["text"]) for r in sample.collect()
    }
    assert got == want


def test_tokens_column_reassembles(spark):
    df = spark.createDataFrame([("the cat sat on the mat",)], ["text"])
    tok = train_from_frequencies([("the", 5), (" cat", 2), (" sat", 2)], 8)
    [row] = df.select(tok.tokens_column("text").alias("t")).collect()
    assert b"".join(bytes(x) for x in row["t"]) == b"the cat sat on the mat"


def test_save_load_roundtrip(tmp_path):
    wf = [("newest", 6), ("widest", 3), (" héllo", 4)]
    tok = train_from_frequencies(wf, 9)
    p = str(tmp_path / "merges.json")
    tok.save(p)
    from vechord_spark.functions.bpe import BpeTokenizer

    back = BpeTokenizer.load(p)
    assert back.merges == tok.merges
    assert back.encode("newest héllo") == tok.encode("newest héllo")
    (tmp_path / "bad.json").write_text('{"format": "other"}')
    with pytest.raises(ValueError):
        BpeTokenizer.load(str(tmp_path / "bad.json"))


def test_bpe_artifact_trains_once_then_loads(spark, tmp_path, sf_dir):
    from vechord_spark.functions.bpe import ensure_bpe_artifact
    from vechord_spark.plans.artifacts import ArtifactStore

    store = ArtifactStore(spark, tmp_path / "warehouse")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    src = [f"{sf_dir}/documents.parquet"]
    tok1 = ensure_bpe_artifact(store, "bpe_docs", docs, src, num_merges=25)
    vocab = store.path("bpe_docs") / "merges.json"
    mtime = vocab.stat().st_mtime_ns
    tok2 = ensure_bpe_artifact(store, "bpe_docs", docs, src, num_merges=25)
    assert tok2.merges == tok1.merges
    assert vocab.stat().st_mtime_ns == mtime  # loaded, not rebuilt
    # params change -> rebuild with the new merge count
    tok3 = ensure_bpe_artifact(store, "bpe_docs", docs, src, num_merges=10)
    assert len(tok3.merges) == 10
    assert tok3.merges == tok1.merges[:10]  # same corpus, same prefix
