"""Loaders + extractors (S1/S2/S8, D1-D3): directory loading with
digests, extension dispatch, NFKC, and PDF extraction over the
checked-in fixture."""

from pathlib import Path

import pytest

from vechord_spark.sources.loaders import (
    extract_html,
    extract_pdf,
    extract_text,
    extract_udf,
    load_dir,
    read_jsonl,
    read_qrels_tsv,
)

FIXTURE = Path(__file__).parent / "fixtures" / "tiny.pdf"


def test_extract_pdf_fixture():
    text = extract_pdf(FIXTURE.read_bytes())
    # Tj + TJ segments, octal/paren escapes unescaped
    assert text == "Hello PDFworld (escaped)"


def test_extract_text_dispatch_and_nfkc():
    assert extract_text(FIXTURE.read_bytes(), "pdf").startswith("Hello PDF")
    assert extract_text(b"<p>hi<script>x()</script></p>", "html") == "hi"
    # NFKC folds the ligature
    assert extract_text("ﬁn".encode(), "txt") == "fin"


def test_extract_html_skips_script_style():
    html = b"<html><style>.a{}</style><body>keep <b>me</b></body></html>"
    assert extract_html(html) == "keep me"


def test_load_dir_and_extract_udf(spark, tmp_path):
    (tmp_path / "a.txt").write_text("plain text")
    (tmp_path / "b.html").write_text("<p>markup</p>")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "c.pdf").write_bytes(FIXTURE.read_bytes())
    (tmp_path / "skip.bin").write_bytes(b"\x00")

    df = load_dir(spark, str(tmp_path))
    rows = {r.ext: r for r in df.collect()}
    assert set(rows) == {"txt", "html", "pdf"}  # .bin filtered, subdir walked
    assert all(len(r.digest) == 64 for r in rows.values())

    out = df.withColumn("text", extract_udf()(df["data"], df["ext"]))
    texts = {r.ext: r.text for r in out.collect()}
    assert texts["txt"] == "plain text"
    assert texts["html"] == "markup"
    assert texts["pdf"] == "Hello PDFworld (escaped)"


def test_jsonl_and_qrels_readers(spark, tmp_path):
    (tmp_path / "corpus.jsonl").write_text(
        '{"_id": "d1", "text": "alpha"}\n{"_id": "d2", "text": "beta"}\n'
    )
    corpus = read_jsonl(spark, str(tmp_path / "corpus.jsonl"))
    assert corpus.count() == 2
    (tmp_path / "qrels.tsv").write_text(
        "query-id\tcorpus-id\tscore\nq1\td1\t1\nq1\td2\t0\n"
    )
    qrels = read_qrels_tsv(spark, str(tmp_path / "qrels.tsv"))
    got = {(r.query_id, r.doc_id): r.relevance for r in qrels.collect()}
    assert got == {("q1", "d1"): 1, ("q1", "d2"): 0}


def test_events_loader_micros_and_nanos(spark, tmp_path):
    """load_table must handle BOTH vintages of events.parquet: plain
    timestamp[us] (current driver files — passes through untouched) and
    INT64 TIMESTAMP(NANOS) (legacy — nanos-as-long fallback rebuilds a
    microsecond timestamp with exact integer division)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from vechord_spark.sources.testdata import load_table

    stamps = [
        dt.datetime(2024, 1, 1, 0, 0, 0, 123456),
        dt.datetime(2024, 6, 15, 12, 30, 45, 999999),
    ]
    base = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["view", "click"]),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(['{"k": 1}', '{"k": 2}']),
    }

    micros_dir = tmp_path / "micros"
    micros_dir.mkdir()
    pq.write_table(
        pa.table({**base, "ts": pa.array(stamps, pa.timestamp("us"))}),
        str(micros_dir / "events.parquet"),
    )
    df_us = load_table(spark, str(micros_dir), "events")
    got_us = sorted(r.ts for r in df_us.select("ts").collect())
    assert got_us == stamps

    nanos_dir = tmp_path / "nanos"
    nanos_dir.mkdir()
    pq.write_table(
        pa.table({**base, "ts": pa.array(stamps, pa.timestamp("ns"))}),
        str(nanos_dir / "events.parquet"),
        use_deprecated_int96_timestamps=False,
        coerce_timestamps=None,
        version="2.6",
    )
    df_ns = load_table(spark, str(nanos_dir), "events")
    got_ns = sorted(r.ts for r in df_ns.select("ts").collect())
    assert got_ns == stamps


# ---------------------------------------------------------------- fuzz
from hypothesis import given, settings, strategies as st


@settings(max_examples=30, deadline=None)
@given(rows=st.lists(st.dictionaries(
    st.sampled_from(["id", "text", "extra"]),
    st.one_of(st.integers(-1000, 1000), st.text(max_size=30), st.none()),
    max_size=3,
), min_size=1, max_size=6))
def test_fuzz_jsonl_roundtrip(spark, tmp_path_factory, rows):
    """read_jsonl never raises on arbitrary JSONL content and returns
    one row per input line."""
    import json

    from vechord_spark.sources.loaders import read_jsonl

    p = tmp_path_factory.mktemp("jl") / "data.jsonl"
    p.write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n", encoding="utf-8"
    )
    got = read_jsonl(spark, str(p))
    assert got.count() == len(rows)
