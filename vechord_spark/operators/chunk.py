"""Text chunkers.

- ``regex_chunk`` / ``RegexChunkerUDF``: behavioral port of the
  reference's RegexChunker (vechord/chunk.py:20-83): split on a
  separator regex, strip pieces, greedily pack pieces up to ``size``
  characters per chunk, carrying an ``overlap``-budget suffix of the
  previous chunk's pieces forward; pieces are re-joined with ``concat``
  (default ". "). Defaults size=1536 / overlap=200 match the reference
  (vechord/chunk.py:23-26). Chunk boundaries feed correctness hashes, so
  the packing rules below reproduce the reference exactly (including the
  oversized-piece trim path) — verified by fixture tests.

- ``fixed_size_chunks``: character-window chunker as a pure SQL
  expression (sequence/transform/substring) — zero-UDF, oracle-checkable,
  the scale path when byte-exact windows are acceptable.

Spark integration: chunkers are row-local (document -> list of chunks),
so they parallelize embarrassingly; the UDF form uses Arrow-batched
pandas UDFs and the results explode with ``posexplode`` to get stable
``seq_id`` per chunk.
"""

from __future__ import annotations

import re
from typing import Callable

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

DEFAULT_SIZE = 1536
DEFAULT_OVERLAP = 200
DEFAULT_SEPARATOR = r"[\n\r\f\v\t?!.;]{1,}"
DEFAULT_CONCAT = ". "


def _overlap_suffix(pieces: list[str], overlap: int) -> list[str]:
    """Maximal suffix of ``pieces`` whose total character length stays
    strictly under ``overlap`` (the carry-over between chunks)."""
    kept: list[str] = []
    budget = 0
    for p in reversed(pieces):
        budget += len(p)
        if budget >= overlap:
            break
        kept.append(p)
    kept.reverse()
    return kept


def regex_chunk(
    text: str,
    size: int = DEFAULT_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    separator: str = DEFAULT_SEPARATOR,
    concat: str = DEFAULT_CONCAT,
) -> list[str]:
    """Split ``text`` into packed chunks (see module docstring).

    Pure deterministic function of its inputs — safe to run inside any
    executor with no state.
    """
    sep = re.compile(separator)
    out: list[str] = []
    carry: list[str] = []  # overlap pieces carried from the last emit
    fresh: list[str] = []  # pieces accumulated since the last emit
    running = 0  # sum of len() over carry + fresh

    for raw in sep.split(text):
        piece = raw.strip()
        if not piece:
            continue
        if fresh and running + len(piece) > size:
            out.append(concat.join(carry + fresh))
            carry = _overlap_suffix(fresh, overlap)
            fresh = []
            running = sum(len(p) for p in carry)
        fresh.append(piece)
        running += len(piece)
        if running > size:
            # single piece overflows the budget: shed carry pieces from
            # the front until it fits (always shedding at least one),
            # emit, and start over from this piece's overlap suffix.
            trimmed = list(carry)
            while trimmed:
                running -= len(trimmed.pop(0))
                if running <= size:
                    break
            out.append(concat.join(trimmed + fresh))
            carry = _overlap_suffix(fresh, overlap)
            fresh = []
            running = sum(len(p) for p in carry)

    tail = concat.join(carry + fresh)
    if tail:
        out.append(tail)
    return out


def regex_chunk_udf(
    size: int = DEFAULT_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    separator: str = DEFAULT_SEPARATOR,
    concat: str = DEFAULT_CONCAT,
) -> Callable:
    """Arrow-batched pandas UDF: text column -> array<string> of chunks."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.StringType()))
    def _chunk(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: regex_chunk(t or "", size, overlap, separator, concat)
        )

    return _chunk


def chunk_documents(
    df: DataFrame,
    doc_id: str,
    text_col: str,
    size: int = DEFAULT_SIZE,
    overlap: int = DEFAULT_OVERLAP,
) -> DataFrame:
    """Document table -> chunk table ``(doc_id, seq_id, chunk_text)``.

    The Spark rendition of the reference ingest step "chunk each
    document" (vechord/pipeline.py:300-303) — one distributed pass,
    posexplode keeps a stable per-document sequence id.
    """
    from vechord_spark.parallel import spread

    udf = regex_chunk_udf(size=size, overlap=overlap)
    return spread(df).select(
        F.col(doc_id),
        F.posexplode(udf(F.col(text_col))).alias("seq_id", "chunk_text"),
    )


def fixed_size_chunks(
    text: Column | str, size: int, step: int | None = None
) -> Column:
    """Character-window chunks as a pure SQL expression.

    ``step`` defaults to ``size`` (non-overlapping); set ``step < size``
    for overlapping windows. Stays in whole-stage codegen and has an
    exact SQL oracle, unlike the piece-packing chunker.
    """
    t = F.col(text) if isinstance(text, str) else text
    if step is None:
        step = size
    starts = F.sequence(F.lit(1), F.greatest(F.length(t), F.lit(1)), F.lit(step))
    return F.transform(starts, lambda i: F.substring(t, i, size))


# ---------------------------------------------------------------------------
# rule-based sentence segmentation (the no-spaCy D7 fallback)
# ---------------------------------------------------------------------------

# common English abbreviations that end with '.' mid-sentence
_ABBREVIATIONS = frozenset(
    "mr mrs ms dr prof sr jr st vs etc al inc ltd co corp fig no vol "
    "dept est approx jan feb mar apr jun jul aug sep sept oct nov dec".split()
)

_SENT_BOUNDARY = re.compile(r"([.!?]+)([\"')\]]*)\s+")


def split_sentences(text: str) -> list[str]:
    """Heuristic sentence splitter (pure Python, no models).

    The in-container fallback for the reference's spaCy sentence
    chunker (vechord/chunk.py:86-102): split after sentence-final
    punctuation when the next token starts a sentence (capital, digit,
    or opening quote/bracket), guarding common abbreviations and
    single-letter initials. Same contract as SpacyChunker.segment —
    every chunk is a sentence, document order preserved.
    """
    sents: list[str] = []
    start = 0
    for m in _SENT_BOUNDARY.finditer(text):
        nxt = m.end()
        if nxt < len(text) and not (
            text[nxt].isupper() or text[nxt].isdigit() or text[nxt] in "\"'(["
        ):
            continue
        if m.group(1) == ".":
            before = text[start : m.start()]
            words = before.split()
            last = words[-1].lstrip("\"'([").lower() if words else ""
            # "Dr", single initials ("J"), and dotted forms ("e.g", "U.S")
            if last in _ABBREVIATIONS or (len(last) == 1 and last.isalpha()) or "." in last:
                continue
        piece = text[start : m.start() + len(m.group(1)) + len(m.group(2))].strip()
        if piece:
            sents.append(piece)
        start = nxt
    tail = text[start:].strip()
    if tail:
        sents.append(tail)
    return sents


def sentence_chunks(
    df: DataFrame, doc_id: str, text_col: str
) -> DataFrame:
    """Document table -> one row per sentence ``(doc_id, seq_id,
    chunk_text)`` using the rule-based splitter (Arrow-batched; same
    output shape as chunk_documents)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _split(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: split_sentences(t or ""))

    from vechord_spark.parallel import spread

    return spread(df).select(
        F.col(doc_id),
        F.posexplode(_split(F.col(text_col))).alias("seq_id", "chunk_text"),
    )
