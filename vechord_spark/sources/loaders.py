"""Document loaders / extractors — distributed sources.

Reference loaders read local/S3 files into ``Document`` structs
(vechord/load.py:21-65: walk dir, filter extension, sha256 digest,
mtime). Spark's ``binaryFile`` source does the same distributed: one
row per file with path/modificationTime/length/content, and the digest
is a codegen'd ``sha2``.

Extractors (vechord/extract.py): PDF via pypdfium2 when installed
(pure-stdlib Flate/Tj fallback otherwise — see extract_pdf), HTML via
stdlib parser, TXT passthrough + NFKC normalization. OCR extractors
(Gemini/LlamaParse, extract.py:103-169) are external-API stages —
their HTTP clients live in providers_http.
"""

from __future__ import annotations

import unicodedata
from html.parser import HTMLParser
from io import StringIO

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def load_dir(
    spark: SparkSession,
    path: str,
    extensions: tuple[str, ...] = ("txt", "md", "html", "pdf"),
) -> DataFrame:
    """Directory -> documents DataFrame (reference LocalLoader.load,
    vechord/load.py:21-51; S3 works identically via s3a:// paths,
    covering the reference's S3Loader stub, load.py:54-65).

    Columns: path, ext, digest (sha256 hex), updated_at, data (binary).
    """
    glob = "*.{" + ",".join(extensions) + "}"
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return raw.select(
        F.col("path"),
        F.element_at(F.split(F.col("path"), "\\."), -1).alias("ext"),
        F.sha2(F.col("content"), 256).alias("digest"),
        F.col("modificationTime").alias("updated_at"),
        F.col("content").alias("data"),
    )


class _TextHTMLParser(HTMLParser):
    """Minimal text extractor: skips script/style contents
    (behavioral parity with vechord/extract.py:18-36)."""

    def __init__(self) -> None:
        super().__init__()
        self._out = StringIO()
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in ("script", "style") and self._skip_depth:
            self._skip_depth -= 1

    def handle_data(self, data):
        if not self._skip_depth:
            self._out.write(data)

    def text(self) -> str:
        return self._out.getvalue()


def extract_html(data: bytes) -> str:
    parser = _TextHTMLParser()
    parser.feed(data.decode("utf-8", errors="replace"))
    return parser.text()


def extract_pdf(data: bytes) -> str:
    """PDF -> text (reference vechord/extract.py:71-78 uses pypdfium2).

    Uses pypdfium2 when installed; otherwise a pure-stdlib fallback
    that inflates FlateDecode content streams and reads the text-show
    operators (Tj / ' / TJ) with PDF string unescaping. The fallback
    covers simple generator output (standard encodings, no CID fonts) —
    enough for plumbing tests and plain machine-generated PDFs; install
    pypdfium2 for full-fidelity extraction.
    """
    try:
        import pypdfium2
    except ImportError:
        return _extract_pdf_fallback(data)
    pdf = pypdfium2.PdfDocument(data)
    try:
        return "\n".join(page.get_textpage().get_text_bounded() for page in pdf)
    finally:
        pdf.close()


_PDF_STR = rb"\(((?:\\.|[^\\()])*)\)"


def _pdf_unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= len(raw):
            break
        e = raw[i : i + 1]
        simple = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                  b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}
        if e in simple:
            out += simple[e]
            i += 1
        elif e.isdigit():  # octal escape, up to 3 digits
            j = i
            while j < len(raw) and j - i < 3 and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        else:  # line continuation or unknown escape: keep the char
            out += e
            i += 1
    return out.decode("latin-1")


def _extract_pdf_fallback(data: bytes) -> str:
    import re
    import zlib

    pieces: list[str] = []
    for m in re.finditer(rb"stream\r?\n(.*?)\r?\nendstream", data, re.S):
        content = m.group(1)
        try:
            content = zlib.decompress(content)
        except zlib.error:
            pass
        found: list[str] = []
        # (text) Tj and (text) ' show a string; [(a) -20 (b)] TJ shows
        # an array of strings with kerning numbers interleaved
        for sm in re.finditer(_PDF_STR + rb"\s*(?:Tj|')", content):
            found.append(_pdf_unescape(sm.group(1)))
        for tm in re.finditer(rb"\[((?:" + _PDF_STR + rb"|[^\]])*)\]\s*TJ", content):
            for s in re.finditer(_PDF_STR, tm.group(1)):
                found.append(_pdf_unescape(s.group(1)))
        if found:
            pieces.append("".join(found))
    return "\n".join(pieces)


def extract_text(data: bytes, ext: str) -> str:
    """Extension dispatch + NFKC normalization
    (reference vechord/extract.py:52-62)."""
    if ext == "html":
        text = extract_html(data)
    elif ext == "pdf":
        text = extract_pdf(data)
    else:
        text = data.decode("utf-8", errors="replace")
    return unicodedata.normalize("NFKC", text)


def extract_udf():
    """Arrow-batched extractor: (data binary, ext string) -> text."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _extract(data: pd.Series, ext: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_text(d, e) for d, e in zip(data, ext)], dtype="object"
        )

    return _extract


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """BEIR-style JSONL corpus reader (reference examples/beir.py:78-126)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_qrels_tsv(spark: SparkSession, path: str) -> DataFrame:
    """qrels TSV reader (reference examples/beir.py qrels loading):
    columns query_id, doc_id, relevance."""
    return (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .csv(path)
        .toDF("query_id", "doc_id", "relevance")
        .withColumn("relevance", F.col("relevance").cast("int"))
    )
