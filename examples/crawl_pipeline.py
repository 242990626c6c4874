"""Crawl-to-corpus pipeline: WARC archives -> URL hygiene -> documents
-> dedup -> quality — the Common Crawl shape, end to end.

Synthesizes a few small WARC archives (no network), then runs the
exact steps a 100 TB crawl pipeline runs, each one an engine operator:

    read_warc             archive-per-task record parse
    warc_to_documents     HTTP response filter + HTML strip
    filter_urls           scheme/blocklist drop
    normalize_url         canonical dedup key
    drop_exact_duplicates refetch collapse on the URL fingerprint
    cap_per_key           per-domain anti-bias cap
    text_quality          heuristic quality score

Run: python examples/crawl_pipeline.py
"""

from __future__ import annotations

import gzip
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from vechord_spark.functions.url import filter_urls, normalize_url, url_domain
from vechord_spark.session import get_spark
from vechord_spark.sources.warc import read_warc, warc_to_documents


def _record(warc_type: str, uri: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\nWARC-Type: {warc_type}\r\nWARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _page(title: str, body: str) -> bytes:
    html = f"<html><head><title>{title}</title></head><body><p>{body}</p></body></html>"
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html.encode()
    )


def synthesize_archives(out_dir: Path, n_archives: int = 3) -> None:
    for a in range(n_archives):
        blob = b""
        for i in range(10):
            # same page crawled with and without tracking params ->
            # normalization must collapse them
            decorated = "?utm_source=crawler" if i % 2 else ""
            blob += _record(
                "response",
                f"https://site{i % 4}.example/page{i}{decorated}",
                _page(f"t{a}-{i}", f"tokens alpha beta doc {a} {i} " * 8),
            )
        blob += _record("response", "ftp://junk.example/x", _page("j", "junk"))
        (out_dir / f"crawl-{a}.warc.gz").write_bytes(gzip.compress(blob))


def main() -> None:
    spark = get_spark("crawl-example")
    with tempfile.TemporaryDirectory() as td:
        synthesize_archives(Path(td))

        records = read_warc(spark, td)
        print(f"records: {records.count()}")

        docs = warc_to_documents(records)
        docs = filter_urls(docs, "url", blocked_domains=["badsite.example"])
        docs = docs.withColumn("url_norm", normalize_url("url")).withColumn(
            "domain", url_domain("url")
        )

        # refetch collapse: same normalized URL -> keep one
        from vechord_spark.operators.dedup import drop_exact_duplicates

        unique = drop_exact_duplicates(docs, id_col="url", text_col="url_norm")
        print(f"docs: {docs.count()} -> unique urls: {unique.count()}")

        # per-domain cap + quality
        from vechord_spark.operators.sample import cap_per_key

        capped = cap_per_key(unique, "domain", 5, order_id="url_norm")
        from vechord_spark.functions.text import quality_score

        scored = capped.withColumn("quality", quality_score("text"))
        scored.select("domain", "url_norm", F.round("quality", 3).alias("q")).show(
            10, truncate=60
        )
    spark.stop()


if __name__ == "__main__":
    main()
