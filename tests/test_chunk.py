"""RegexChunker parity fixtures (exact expected chunk lists for fixed
inputs — reference vechord/chunk.py:20-83 behavior, verified by fuzzing
against the reference algorithm)."""

from pyspark.sql import functions as F

from vechord_spark.operators.chunk import (
    chunk_documents,
    fixed_size_chunks,
    regex_chunk,
)


def test_basic_packing():
    text = "Hello world. This is a test! Another sentence here; and more text follows. End."
    assert regex_chunk(text, size=40, overlap=10) == [
        "Hello world. This is a test",
        "Another sentence here",
        "and more text follows. End",
    ]


def test_overlap_carry():
    # pieces: aa(2) bbbb(4) cc(2) dddd(4); size 8:
    # aa+bbbb+cc = 8 fits exactly; dddd flushes, carrying the suffix of
    # the flushed pieces whose total stays under the overlap budget
    # (["cc"] for overlap=4: cc=2 < 4, +bbbb would reach 6).
    assert regex_chunk("aa. bbbb. cc. dddd", size=8, overlap=4) == [
        "aa. bbbb. cc",
        "cc. dddd",
    ]


def test_oversized_piece():
    # a single piece longer than size is emitted alone
    big = "x" * 100
    assert regex_chunk(f"small. {big}. tail", size=20, overlap=5) == [
        "small",
        big,
        "tail",
    ]


def test_empty_and_whitespace():
    assert regex_chunk("", size=10, overlap=2) == []
    assert regex_chunk(" . ! ; \n", size=10, overlap=2) == []


def test_defaults_match_reference():
    # size=1536 / overlap=200 (vechord/chunk.py:23-26)
    text = "word " * 1000
    chunks = regex_chunk(text.strip())
    assert chunks == [text.strip()]  # no separators -> single piece


def test_chunk_documents_explodes_with_seq(spark):
    df = spark.createDataFrame(
        [(1, "one. two. three. four"), (2, "")], "doc_id int, text string"
    )
    out = chunk_documents(df, "doc_id", "text", size=10, overlap=0).collect()
    got = {(r.doc_id, r.seq_id): r.chunk_text for r in out}
    assert got == {(1, 0): "one. two", (1, 1): "three. four"}


def test_fixed_size_chunks_sql(spark):
    df = spark.createDataFrame([("abcdefghij",)], "t string")
    out = df.select(fixed_size_chunks("t", 4).alias("c")).collect()[0].c
    assert out == ["abcd", "efgh", "ij"]
    out2 = df.select(fixed_size_chunks("t", 4, step=2).alias("c")).collect()[0].c
    assert out2 == ["abcd", "cdef", "efgh", "ghij", "ij"]


def test_suite_oracle_precondition_no_oversized_tokens(docs):
    # the recursive-CTE oracle for the chunk_regex suite query
    # (suite._chunk_regex_sql) omits the oversized-piece shed path;
    # valid only while no whitespace token reaches the chunk size (120)
    from pyspark.sql import functions as F

    max_tok = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("t"))
        .agg(F.max(F.length("t")))
        .collect()[0][0]
    )
    assert max_tok < 120


def test_split_sentences_rules():
    from vechord_spark.operators.chunk import split_sentences

    assert split_sentences("") == []
    assert split_sentences("One sentence only") == ["One sentence only"]
    got = split_sentences("First part. Second part! Third? Yes.")
    assert got == ["First part.", "Second part!", "Third?", "Yes."]
    # abbreviations and initials do not split
    got = split_sentences("Dr. Smith met J. Doe at 5 p.m. yesterday. Then left.")
    assert got == ["Dr. Smith met J. Doe at 5 p.m. yesterday.", "Then left."]
    # lowercase continuation after the period does not split
    assert split_sentences("see fig. 3 for details. done deal. Next one.") == [
        "see fig. 3 for details. done deal.",
        "Next one.",
    ]
    # closing quotes stay attached to the sentence
    assert split_sentences('He said "stop." Then ran.') == ['He said "stop."', "Then ran."]


def test_spacy_chunker_fallback_segment():
    from vechord_spark.providers import SpacyChunker

    got = SpacyChunker().segment("Alpha beta. Gamma delta. Last one!")
    assert got == ["Alpha beta.", "Gamma delta.", "Last one!"]


def test_sentence_chunks_dataframe(spark):
    from vechord_spark.operators.chunk import sentence_chunks

    df = spark.createDataFrame(
        [(1, "One two. Three four! Five."), (2, "Single sentence")],
        "doc_id long, text string",
    )
    rows = sentence_chunks(df, "doc_id", "text").collect()
    got = {(r.doc_id, r.seq_id): r.chunk_text for r in rows}
    assert got == {
        (1, 0): "One two.",
        (1, 1): "Three four!",
        (1, 2): "Five.",
        (2, 0): "Single sentence",
    }
