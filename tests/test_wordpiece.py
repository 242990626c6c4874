"""WordPiece tokenizer (bert_base_uncased analog) — algorithm vectors
from the published BERT reference behavior, plus BM25 integration."""

import pytest

from vechord_spark.functions.wordpiece import WordPieceTokenizer

VOCAB = [
    "[UNK]", "[CLS]", "[SEP]",
    "un", "##aff", "##able", "hello", "world", "!", ",",
    "run", "##ning", "##s", "the", "cafe", "data", "##base",
]


@pytest.fixture()
def tok():
    return WordPieceTokenizer(VOCAB)


def test_canonical_unaffable(tok):
    # the canonical example from the BERT paper / reference impl
    assert tok.tokenize("unaffable") == ["un", "##aff", "##able"]


def test_greedy_longest_match(tok):
    assert tok.tokenize("running runs") == ["run", "##ning", "run", "##s"]


def test_unknown_word_is_unk(tok):
    assert tok.tokenize("hello xyzzy") == ["hello", "[UNK]"]


def test_punctuation_isolated_and_lowercased(tok):
    assert tok.tokenize("Hello, World!") == ["hello", ",", "world", "!"]


def test_accent_stripping_uncased(tok):
    # NFD + Mn-strip: café -> cafe
    assert tok.tokenize("Café") == ["cafe"]


def test_cased_mode_keeps_case():
    t = WordPieceTokenizer(["Hello", "[UNK]"], lowercase=False)
    assert t.tokenize("Hello hello") == ["Hello", "[UNK]"]


def test_max_chars_guard(tok):
    t = WordPieceTokenizer(VOCAB, max_input_chars_per_word=5)
    assert t.tokenize("unaffable") == ["[UNK]"]


def test_vocab_file_roundtrip(tmp_path, tok):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    t = WordPieceTokenizer.from_vocab_file(str(p))
    assert t.tokenize("unaffable") == tok.tokenize("unaffable")


def test_column_path_matches_python(spark, tok):
    df = spark.createDataFrame(
        [(1, "unaffable database"), (2, "Hello, runs!")], "id int, text string"
    )
    got = {
        r.id: r.toks
        for r in df.select("id", tok.column("text").alias("toks")).collect()
    }
    assert got[1] == ["un", "##aff", "##able", "data", "##base"]
    assert got[2] == tok.tokenize("Hello, runs!")


def test_bm25_with_wordpiece_tokenizer(spark, tok):
    from vechord_spark.operators.bm25 import Bm25Index

    df = spark.createDataFrame(
        [
            (1, "unaffable database running"),
            (2, "hello world hello world"),
            (3, "the database runs"),
        ],
        "doc_id long, text string",
    )
    idx = Bm25Index(df, "doc_id", "text", tokenizer=tok)
    top = idx.topk("database runs", k=2).collect()
    # docs 1 and 3 share 'data ##base'; doc 3 also matches 'run ##s'
    assert [r.doc_id for r in top] == [3, 1]
