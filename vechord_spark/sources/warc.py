"""WARC (Web ARChive) ingestion — the Common Crawl container format.

A 100 TB text corpus starts as WARC: gzip'd archives of captured HTTP
exchanges (ISO 28500). This reader is pure stdlib — WARC is a simple
length-prefixed record stream — and distributes the natural way: one
archive file per task via Spark's ``binaryFile`` source (Common Crawl
shards archives at ~1 GB precisely so per-file parallelism works), with
record parsing in an Arrow-batched ``mapInPandas``.

Pipeline shape::

    read_warc(spark, "s3a://bucket/crawl/*.warc.gz")   # records
      -> warc_to_documents(...)                        # HTML -> text
      -> the engine's dedup / quality / lang-id operators

Multi-member gzip (each record its own member — the Common Crawl
convention, enabling record-level seeks) and plain concatenated-member
files both decompress with one streaming pass.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

RECORD_SCHEMA = (
    "warc_path string, record_offset long, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "payload binary"
)


def parse_warc_bytes(data: bytes, path: str = "") -> Iterator[dict]:
    """Iterate records of one (possibly gzip'd) WARC byte blob.

    Decompression is STREAMING: a ``gzip.GzipFile`` over the raw bytes,
    so peak memory per task is the raw archive plus one record's
    payload — never the full decompressed archive (a ~1 GB Common Crawl
    ``.warc.gz`` expands 4-5x; materializing it per task would OOM
    executors). The raw bytes themselves still arrive whole via Spark's
    ``binaryFile`` source, which caps files at 2 GiB — within Common
    Crawl's ~1 GB shard convention, but re-shard larger archives first.

    Tolerant of trailing junk and truncated final records (a crashed
    crawler mid-write must not poison the whole archive — only the
    broken tail is dropped). That tolerance covers the COMPRESSED layer
    too: a truncated or corrupt gzip tail surfaces as
    EOFError/BadGzipFile/zlib.error mid-read, which ends the iteration
    after the last complete record instead of propagating (fuzz-pinned
    in tests/test_warc.py). ``record_offset`` is the offset in the
    DECOMPRESSED stream.
    """
    import zlib

    if data[:2] == b"\x1f\x8b":
        # handles concatenated members, one streaming pass
        buf = io.BufferedReader(gzip.GzipFile(fileobj=io.BytesIO(data)))
    else:
        buf = io.BufferedReader(io.BytesIO(data))
    try:
        yield from _iter_warc_records(buf, path)
    except (EOFError, OSError, zlib.error):
        # gzip.BadGzipFile is OSError; the stream is in-memory, so any
        # OSError here is a decompression failure, not real I/O —
        # drop the broken tail, keep everything parsed before it
        return


def _iter_warc_records(buf: io.BufferedReader, path: str) -> Iterator[dict]:
    while True:
        offset = buf.tell()
        line = buf.readline()
        if not line:
            return
        if not line.strip():
            continue
        if not line.startswith(b"WARC/"):
            return  # lost sync — stop rather than emit garbage
        headers: dict[str, str] = {}
        while True:
            h = buf.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, _, v = h.partition(b":")
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        payload = buf.read(length)
        if len(payload) < length:
            return  # truncated tail
        yield {
            "warc_path": path,
            "record_offset": offset,
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "payload": payload,
        }
        # skip the two record-terminating CRLFs (and any padding) via
        # peek, not seek — backward seek on a gzip stream restarts
        # decompression from byte 0 (quadratic over the archive)
        while True:
            nxt = buf.peek(1)
            if not nxt:
                return
            if nxt[:1] in (b"\r", b"\n"):
                buf.readline()
                continue
            break


def split_http_response(payload: bytes) -> tuple[str, bytes]:
    """Split an HTTP response payload into (content-type, body)."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return "", payload
    ctype = ""
    for line in head.split(b"\r\n")[1:]:
        if line.lower().startswith(b"content-type:"):
            ctype = line.partition(b":")[2].decode("ascii", "replace").strip()
            break
    return ctype, body


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC records as a DataFrame — one archive per task, Arrow-batched
    parsing, columns ``RECORD_SCHEMA``."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def _parse(batches):
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_bytes(bytes(blob), path=p))
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_path", "record_offset", "warc_type", "target_uri",
                    "warc_date", "content_type", "payload",
                ],
            )

    return files.mapInPandas(_parse, RECORD_SCHEMA)


def warc_to_documents(records: DataFrame) -> DataFrame:
    """HTTP ``response`` records -> (url, fetched_at, text) — the
    Common Crawl -> documents-table step. HTML is stripped with the
    engine's stdlib extractor; non-HTML responses are dropped."""
    import pandas as pd

    from vechord_spark.sources.loaders import extract_html

    responses = records.filter(F.col("warc_type") == "response").select(
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("fetched_at"),
        "payload",
    )

    def _extract(batches):
        for pdf in batches:
            urls, dates, texts = [], [], []
            for url, date, payload in zip(
                pdf["url"], pdf["fetched_at"], pdf["payload"]
            ):
                ctype, body = split_http_response(bytes(payload))
                if "html" not in ctype.lower():
                    continue
                urls.append(url)
                dates.append(date)
                texts.append(extract_html(body))
            yield pd.DataFrame(
                {"url": urls, "fetched_at": dates, "text": texts}
            )

    return responses.mapInPandas(
        _extract, "url string, fetched_at string, text string"
    )


def wat_to_metadata(records: DataFrame) -> DataFrame:
    """WAT ``metadata`` records -> per-page crawl metadata.

    WAT is Common Crawl's third container: one ``WARC-Type: metadata``
    record per page whose payload is a JSON envelope
    (``Envelope.Payload-Metadata.HTTP-Response-Metadata``) describing
    the fetch — headers, detected MIME, title, outgoing links.

    The envelope is parsed ONCE per row with ``from_json`` against a
    pinned PARTIAL schema — parse-once-then-dispatch, the same pattern
    as the reference's extract dispatch (vechord/extract.py:52-62).
    WAT payloads are kilobytes of nested JSON; per-field
    ``get_json_object`` re-parses the blob for every extracted column,
    which multiplies CPU on the biggest input at crawl scale. Fields
    outside the partial schema are skipped by the Jackson parser at
    token level (never materialized), and the raw string is kept as
    ``wat_json`` for ad-hoc ``get_json_object`` digs into the long
    tail.
    """
    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
    )

    link = StructType([StructField("url", StringType())])
    resp_schema = StructType(
        [
            StructField("Entity-Type", StringType()),  # may be absent
            StructField(
                "Response-Message",
                StructType([StructField("Status", StringType())]),
            ),
            StructField(
                "HTML-Metadata",
                StructType(
                    [
                        StructField(
                            "Head",
                            StructType([StructField("Title", StringType())]),
                        ),
                        StructField("Links", ArrayType(link)),
                    ]
                ),
            ),
        ]
    )
    wat_schema = StructType(
        [
            StructField(
                "Envelope",
                StructType(
                    [
                        StructField(
                            "Payload-Metadata",
                            StructType(
                                [
                                    StructField(
                                        "HTTP-Response-Metadata", resp_schema
                                    )
                                ]
                            ),
                        )
                    ]
                ),
            )
        ]
    )
    meta = records.filter(F.col("warc_type") == "metadata").select(
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("fetched_at"),
        F.col("payload").cast("string").alias("wat_json"),
    )
    resp = F.from_json("wat_json", wat_schema)["Envelope"]["Payload-Metadata"][
        "HTTP-Response-Metadata"
    ]
    # per-field degradation: from_json (PERMISSIVE) nulls the WHOLE
    # struct when ANY field mismatches its pinned type, so each lifted
    # column coalesces to a targeted get_json_object re-parse — only
    # schema-mismatched records pay it (Coalesce short-circuits), and a
    # bad Links shape can no longer take title/status down with it
    jp = "$.Envelope.Payload-Metadata.HTTP-Response-Metadata"
    return meta.select(
        "url",
        "fetched_at",
        F.coalesce(
            resp["HTML-Metadata"]["Head"]["Title"],
            F.get_json_object("wat_json", f"{jp}.HTML-Metadata.Head.Title"),
        ).alias("title"),
        F.coalesce(
            resp["Entity-Type"],
            F.get_json_object("wat_json", f"{jp}.Entity-Type"),
        ).alias("entity_type"),
        F.coalesce(
            resp["Response-Message"]["Status"],
            F.get_json_object("wat_json", f"{jp}.Response-Message.Status"),
        ).alias("http_status"),
        F.greatest(
            F.coalesce(
                F.size(resp["HTML-Metadata"]["Links"]),
                F.json_array_length(
                    F.get_json_object("wat_json", f"{jp}.HTML-Metadata.Links")
                ),
                F.lit(0),
            ),
            F.lit(0),
        ).alias("n_links"),
        "wat_json",
    )


def wet_to_documents(records: DataFrame) -> DataFrame:
    """WET ``conversion`` records -> (url, fetched_at, text).

    Common Crawl ships three containers per crawl: WARC (raw HTTP),
    WAT (metadata), and WET — the pre-extracted PLAIN TEXT, one
    ``WARC-Type: conversion`` record per page with the text as the
    payload (no HTTP envelope, no HTML). Most text pipelines start
    from WET because it skips the HTML strip entirely; the parser is
    the same length-prefixed record reader (``read_warc``), so this
    is a pure Column program — decode the payload, keep non-empty
    text — with no Python extraction step at all."""
    return (
        records.filter(F.col("warc_type") == "conversion")
        .select(
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("fetched_at"),
            F.col("payload").cast("string").alias("text"),
        )
        .filter(F.trim(F.col("text")) != "")
    )
