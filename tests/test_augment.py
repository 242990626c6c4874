"""Contextual augmentation (D11)."""

from vechord_spark.operators.augment import augment_chunks_with_head


def test_augment_prepends_doc_head(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "x y")],
        "doc_id long, text string",
    )
    chunks = spark.createDataFrame(
        [(10, 1, "chunk one"), (11, 1, "chunk two"), (20, 2, "only chunk")],
        "uid long, doc_id long, text string",
    )
    out = {
        r.uid: r.text_ctx
        for r in augment_chunks_with_head(chunks, docs, head_tokens=3).collect()
    }
    assert out[10] == "alpha beta gamma\n\nchunk one"
    assert out[11] == "alpha beta gamma\n\nchunk two"
    assert out[20] == "x y\n\nonly chunk"


def test_augment_orphan_chunk_keeps_text(spark):
    docs = spark.createDataFrame([(1, "head words")], "doc_id long, text string")
    chunks = spark.createDataFrame(
        [(30, 99, "orphan chunk")], "uid long, doc_id long, text string"
    )
    row = augment_chunks_with_head(chunks, docs).collect()[0]
    # concat_ws skips the NULL head -> chunk text survives unprefixed
    assert row.text_ctx == "orphan chunk"
