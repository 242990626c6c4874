"""External-API provider stages: rate-limited mapInPandas plumbing.

The reference wraps every external model call (Gemini/Jina/Voyage/
OpenAI embedders D9, Cohere/Jina rerankers R4, OCR extractors D4/D5,
Gemini NER G7, contextual augmenter D11) in per-provider rate-limited
HTTP transports (vechord/utils.py:9-16, 38-68). None of those services
are reachable from this environment, so each provider here is a
clearly-marked STUB — but the Spark-side machinery is real and tested:

- ``RateLimiter``: token-spacing limiter (one call per 1/rps seconds),
  instantiated PER PARTITION inside mapInPandas so the global call rate
  is bounded by rps x num_partitions; ``repartition(n)`` is the global
  concurrency knob (reference pool size 16, vechord/client.py:66-68).
- ``external_stage``: wraps a batch-of-rows -> batch-of-rows callable
  as a mapInPandas transform with retry and poison-row capture (the
  reference just raises, vechord/provider.py:78-82 — at 100 TB a
  single bad row must not kill the job).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# reference rates (requests/sec), vechord/utils.py:9-16
RATE_LIMITS = {
    "gemini_generate": 16.66,
    "gemini_embed": 0.6,
    "voyage": 33.33,
    "jina": 8.33,
    "cohere": 10.0,
}


class RateLimiter:
    """Token-spacing limiter: guarantees >= 1/rps seconds between
    acquisitions (the reference's transport behavior,
    vechord/utils.py:38-68)."""

    def __init__(self, rps: float) -> None:
        self.interval = 1.0 / rps
        self._next_at = 0.0

    def acquire(self) -> None:
        now = time.monotonic()
        wait = self._next_at - now
        if wait > 0:
            time.sleep(wait)
            now = time.monotonic()
        self._next_at = max(self._next_at, now) + self.interval


def external_stage(
    call: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: T.StructType,
    rps: float | None = None,
    max_retries: int = 3,
    error_col: str = "_error",
):
    """Wrap a per-batch external call as a DataFrame transform.

    ``call`` receives a pandas batch and returns the output batch
    (same row count). Each Arrow batch is one "request" for rate
    purposes. Retries back off exponentially; exhausted batches emit
    rows with ``error_col`` set instead of raising, so poison rows are
    quarantined rather than failing the job.
    """
    cols = [f.name for f in output_schema.fields]

    def transform(df: DataFrame) -> DataFrame:
        def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            limiter = RateLimiter(rps) if rps else None
            for pdf in batches:
                if limiter:
                    limiter.acquire()
                delay = 1.0
                for attempt in range(max_retries):
                    try:
                        out = call(pdf)
                        if error_col in cols and error_col not in out.columns:
                            out[error_col] = None
                        yield out[cols]
                        break
                    except Exception as exc:  # noqa: BLE001 — quarantine path
                        if attempt == max_retries - 1:
                            bad = pd.DataFrame(
                                {c: [None] * len(pdf) for c in cols}
                            )
                            if error_col in cols:
                                bad[error_col] = str(exc)
                            yield bad
                        else:
                            time.sleep(delay)
                            delay *= 2

        return df.mapInPandas(_apply, output_schema)

    return transform


# ---------------------------------------------------------------------------
# provider stubs (real signatures, unreachable backends)
# ---------------------------------------------------------------------------


@dataclass
class GeminiEmbedder:
    """STUB — Gemini dense embedder (reference vechord/embedding.py:120-170).
    Use functions/embed.HashEmbedder for runnable pipelines."""

    model: str = "gemini-embedding-001"
    dim: int = 3072

    def embed_documents(self, text):
        raise NotImplementedError("Gemini API is not reachable in this environment")

    def embed_query(self, text: str):
        raise NotImplementedError("Gemini API is not reachable in this environment")


@dataclass
class CohereReranker:
    """STUB — external reranker (reference vechord/rerank.py:28-63).
    The runnable rerank path is operators/fusion.reorder_by fed by any
    (id, score) frame."""

    model: str = "rerank-v3.5"

    def rerank(self, query: str, texts: list[str]) -> list[int]:
        raise NotImplementedError("Cohere API is not reachable in this environment")


@dataclass
class GeminiNER:
    """STUB — LLM entity/relation extraction (reference
    vechord/graph.py:155-223). Graph merge/search operators
    (operators/graph.py) consume any (text, label, description,
    chunk_uuids) frame."""

    model: str = "gemini-2.5-flash"

    def extract(self, text: str):
        raise NotImplementedError("Gemini API is not reachable in this environment")


@dataclass
class GeminiAugmenter:
    """STUB — contextual-retrieval augmentation (reference
    vechord/augment.py:30-93)."""

    model: str = "gemini-2.5-flash"

    def augment_chunk(self, doc: str, chunk: str) -> str:
        raise NotImplementedError("Gemini API is not reachable in this environment")


@dataclass
class SpacyChunker:
    """STUB — sentence segmentation via spaCy (reference
    vechord/chunk.py:86-102). The runnable chunkers are
    operators/chunk.regex_chunk (exact port of the reference default)
    and fixed_size_chunks."""

    model: str = "en_core_web_sm"

    def segment(self, text: str) -> list[str]:
        raise NotImplementedError("spaCy is not installed in this environment")


@dataclass
class GeminiChunker:
    """STUB — LLM semantic chunking with RegexChunker pre-split above
    65,536 chars (reference vechord/chunk.py:118-166)."""

    model: str = "gemini-2.5-flash"

    def segment(self, text: str) -> list[str]:
        raise NotImplementedError("Gemini API is not reachable in this environment")


@dataclass
class SpacyRelationMatcher:
    """STUB — rule-based ENT_VERB_ENT relation extraction (reference
    vechord/graph.py:29-141). Graph operators (operators/graph.py)
    consume any (source, target, description) frame."""

    model: str = "en_core_web_sm"

    def extract_relations(self, text: str):
        raise NotImplementedError("spaCy is not installed in this environment")
