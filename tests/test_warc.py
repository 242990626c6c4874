"""WARC ingestion (sources/warc.py): synthetic archives round-trip."""

import gzip

import pytest

from vechord_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    split_http_response,
    warc_to_documents,
)


def _record(warc_type: str, uri: str, payload: bytes, extra: str = "") -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"{extra}"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http_html(title: str, body: str) -> bytes:
    html = f"<html><head><title>{title}</title></head><body><p>{body}</p></body></html>"
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        + html.encode()
    )


@pytest.fixture()
def archive() -> bytes:
    return (
        _record("warcinfo", "", b"software: test-crawler\r\n")
        + _record("response", "http://a.example/", _http_html("A", "alpha beta"))
        + _record("request", "http://a.example/", b"GET / HTTP/1.1\r\n")
        + _record(
            "response",
            "http://b.example/img",
            b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n\x89PNG...",
        )
        + _record("response", "http://c.example/", _http_html("C", "gamma delta"))
    )


def test_parse_plain_and_gzip(archive):
    plain = list(parse_warc_bytes(archive, path="p"))
    assert [r["warc_type"] for r in plain] == [
        "warcinfo", "response", "request", "response", "response",
    ]
    assert plain[1]["target_uri"] == "http://a.example/"
    # multi-member gzip (the Common Crawl convention is one member per
    # record; any member split decompresses to the same stream)
    members = b"".join(
        gzip.compress(chunk)
        for chunk in [archive[:len(archive) // 2], archive[len(archive) // 2:]]
    )
    # concatenated members decompress to the same stream
    assert [r["target_uri"] for r in parse_warc_bytes(members)] == [
        r["target_uri"] for r in plain
    ]


def test_truncated_tail_dropped(archive):
    broken = archive + _record("response", "http://d.example/", b"x" * 100)[:-80]
    got = list(parse_warc_bytes(broken))
    assert len(got) == 5  # the truncated record is dropped, not raised


def test_split_http_response():
    ctype, body = split_http_response(_http_html("T", "content"))
    assert ctype.startswith("text/html")
    assert b"<html>" in body
    assert split_http_response(b"no headers here") == ("", b"no headers here")


def test_read_warc_and_to_documents(spark, tmp_path, archive):
    (tmp_path / "a.warc").write_bytes(archive)
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(archive))
    records = read_warc(spark, str(tmp_path))
    assert records.count() == 10  # both archives parsed
    docs = warc_to_documents(records)
    rows = sorted(
        (r.url, r.text) for r in docs.collect()
    )
    # 2 archives x 2 html responses; the png response is dropped
    assert len(rows) == 4
    assert rows[0][0] == "http://a.example/"
    assert "alpha beta" in rows[0][1]
    assert all("png" not in u for u, _ in rows)


def test_gzip_parse_is_streaming(archive, monkeypatch):
    """parse_warc_bytes must never materialize the whole decompressed
    archive (a 1 GB .warc.gz expands 4-5x per task); the gzip path goes
    through GzipFile, not gzip.decompress."""
    import vechord_spark.sources.warc as warc_mod

    def _boom(_data):
        raise AssertionError("gzip.decompress materializes the archive")

    monkeypatch.setattr(warc_mod.gzip, "decompress", _boom)
    got = list(parse_warc_bytes(gzip.compress(archive)))
    assert [r["target_uri"] for r in got] == [
        r["target_uri"] for r in parse_warc_bytes(archive)
    ]


def test_wet_conversion_records_to_documents(spark, tmp_path):
    from vechord_spark.sources.warc import wet_to_documents

    wet = (
        _record("warcinfo", "", b"software: test-crawler\r\n")
        + _record(
            "conversion",
            "http://a.example/",
            b"alpha beta gamma extracted text",
            extra="Content-Type: text/plain\r\n",
        )
        + _record(
            "conversion",
            "http://b.example/",
            b"   ",  # whitespace-only page -> dropped
            extra="Content-Type: text/plain\r\n",
        )
        + _record("response", "http://c.example/", _http_html("C", "ignored"))
    )
    p = tmp_path / "crawl.wet.gz"
    p.write_bytes(gzip.compress(wet))
    docs = wet_to_documents(read_warc(spark, str(p))).collect()
    assert len(docs) == 1
    assert docs[0].url == "http://a.example/"
    assert docs[0].text == "alpha beta gamma extracted text"
    assert docs[0].fetched_at == "2024-01-01T00:00:00Z"


def test_wat_metadata_records(spark, tmp_path):
    import json as _json

    from vechord_spark.sources.warc import wat_to_metadata

    envelope = {
        "Envelope": {
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {
                    "Response-Message": {"Status": "200"},
                    "HTML-Metadata": {
                        "Head": {"Title": "A Page"},
                        "Links": [
                            {"url": "http://x.example/1"},
                            {"url": "http://x.example/2"},
                        ],
                    },
                }
            }
        }
    }
    wat = _record("warcinfo", "", b"software: test\r\n") + _record(
        "metadata",
        "http://a.example/",
        _json.dumps(envelope).encode(),
        extra="Content-Type: application/json\r\n",
    )
    p = tmp_path / "crawl.wat.gz"
    p.write_bytes(gzip.compress(wat))
    rows = wat_to_metadata(read_warc(spark, str(p))).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.url == "http://a.example/"
    assert r.title == "A Page"
    assert r.http_status == "200"
    assert r.n_links == 2
    assert '"Links"' in r.wat_json


# ---------------------------------------------------------------- fuzz
# Property-based hardening: the parser must never raise on hostile
# bytes, and truncation must only ever drop the broken tail (prefix
# consistency), at both the record layer and the gzip layer.

from hypothesis import given, settings, strategies as st


def _key(r):
    return (r["record_offset"], r["warc_type"], r["target_uri"], r["payload"])


@st.composite
def _archives(draw):
    """A syntactically valid multi-record archive with CRLF/LF variants
    and optional extra headers."""
    nl = draw(st.sampled_from(["\r\n", "\n"]))
    recs = []
    for _ in range(draw(st.integers(1, 5))):
        payload = draw(st.binary(max_size=64))
        wtype = draw(st.sampled_from(["response", "metadata", "conversion"]))
        headers = [
            "WARC/1.0",
            f"WARC-Type: {wtype}",
            "WARC-Target-URI: http://f.example/",
        ]
        if draw(st.booleans()):
            headers.append("WARC-Date: 2024-01-01T00:00:00Z")
        if draw(st.booleans()):
            headers.append("X-Junk: " + draw(st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=20)))
        headers.append(f"Content-Length: {len(payload)}")
        recs.append(nl.join(headers).encode() + nl.encode() * 2
                    + payload + nl.encode() * 2)
    return b"".join(recs), len(recs)


@settings(max_examples=60, deadline=None)
@given(_archives())
def test_fuzz_valid_archives_roundtrip(arch):
    data, n = arch
    got = list(parse_warc_bytes(data, path="p"))
    assert len(got) == n
    assert all(r["target_uri"] == "http://f.example/" for r in got)


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=512))
def test_fuzz_garbage_never_raises(data):
    list(parse_warc_bytes(data))
    list(parse_warc_bytes(gzip.compress(data)))
    # gzip magic followed by garbage must not raise either
    list(parse_warc_bytes(b"\x1f\x8b" + data))


@settings(max_examples=60, deadline=None)
@given(_archives(), st.data())
def test_fuzz_truncation_prefix_consistent(arch, data):
    raw, _ = arch
    full = [_key(r) for r in parse_warc_bytes(raw)]
    cut = data.draw(st.integers(0, len(raw)))
    got = [_key(r) for r in parse_warc_bytes(raw[:cut])]
    assert got == full[: len(got)]


@settings(max_examples=40, deadline=None)
@given(_archives(), st.data())
def test_fuzz_gzip_truncation_prefix_consistent(arch, data):
    """A truncated/corrupt .warc.gz drops only the broken tail — a
    crashed crawler mid-write must not poison the whole archive."""
    raw, _ = arch
    gz = gzip.compress(raw)
    full = [_key(r) for r in parse_warc_bytes(gz)]
    cut = data.draw(st.integers(0, len(gz)))
    got = [_key(r) for r in parse_warc_bytes(gz[:cut])]
    assert got == full[: len(got)]


@settings(max_examples=30, deadline=None)
@given(_archives())
def test_fuzz_multimember_gzip_equals_single(arch):
    """Per-record gzip members (the Common Crawl convention) parse to
    the same records as one single-member archive — offsets included,
    since both decompress to the same byte stream."""
    raw, _ = arch
    single = [_key(r) for r in parse_warc_bytes(gzip.compress(raw))]
    # split the raw stream at arbitrary-ish fixed points into members
    third = max(1, len(raw) // 3)
    multi = b"".join(
        gzip.compress(raw[i : i + third]) for i in range(0, len(raw), third)
    )
    assert [_key(r) for r in parse_warc_bytes(multi)] == single


def test_wat_metadata_degrades_per_field(spark, tmp_path):
    """A record whose Links field mismatches the pinned schema (object,
    not array) must not take title/status down with it: each lifted
    column falls back to a targeted get_json_object re-parse."""
    import json as _json

    from vechord_spark.sources.warc import wat_to_metadata

    envelope = {
        "Envelope": {
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {
                    "Response-Message": {"Status": "301"},
                    "HTML-Metadata": {
                        "Head": {"Title": "Odd Page"},
                        "Links": {"not": "an array"},
                    },
                }
            }
        }
    }
    wat = _record(
        "metadata",
        "http://odd.example/",
        _json.dumps(envelope).encode(),
        extra="Content-Type: application/json\r\n",
    )
    p = tmp_path / "odd.wat.gz"
    p.write_bytes(gzip.compress(wat))
    r = wat_to_metadata(read_warc(spark, str(p))).collect()[0]
    assert r.title == "Odd Page"
    assert r.http_status == "301"
    assert r.n_links == 0  # non-array Links counts as zero, not poison
