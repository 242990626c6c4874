"""External-API provider stages: rate-limited mapInPandas plumbing.

The reference wraps every external model call (Gemini/Jina/Voyage/
OpenAI embedders D9, Cohere/Jina rerankers R4, OCR extractors D4/D5,
Gemini NER G7, contextual augmenter D11) in per-provider rate-limited
HTTP transports (vechord/utils.py:9-16, 38-68). The wire protocols
live in providers_http (pure request builders/parsers + stdlib
transport, fixture-tested offline); this module provides the
engine-facing provider classes on top, plus the Spark-side batch
machinery:

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
# providers: real HTTP clients (providers_http) behind the engine-facing
# interfaces. Construction requires the provider's API key env var
# (raises providers_http.ApiKeyMissing otherwise); the wire shapes are
# fixture-tested offline in tests/test_providers_http.py. The
# deterministic no-network analogs remain functions/embed.HashEmbedder,
# operators/fusion.reorder_by and operators/groundtruth.
# ---------------------------------------------------------------------------


@dataclass
class GeminiEmbedder:
    """Gemini dense embedder (reference vechord/embedding.py:120-170)
    over the public embedContent endpoint, preserving the doc/query
    task asymmetry. Column path: providers_http.embedding_stage."""

    model: str = "gemini-embedding-001"
    dim: int = 3072
    transport: object | None = None

    def _client(self):
        from vechord_spark.providers_http import GeminiEmbeddingClient

        return GeminiEmbeddingClient(
            model=self.model, dim=self.dim, transport=self.transport
        )

    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        client = self._client()
        return [client.embed_document(t) for t in texts]

    def embed_query(self, text: str) -> list[float]:
        return self._client().embed_query(text)


@dataclass
class CohereReranker:
    """Cohere v2 reranker (reference vechord/rerank.py:28-63): returns
    the reranked index list. The no-network rerank path is
    operators/fusion.reorder_by fed by any (id, score) frame."""

    model: str = "rerank-v3.5"
    transport: object | None = None

    def rerank(self, query: str, texts: list[str]) -> list[int]:
        from vechord_spark.providers_http import CohereRerankClient

        return CohereRerankClient(model=self.model, transport=self.transport).rerank(
            query, texts
        )


@dataclass
class JinaReranker:
    """Jina reranker (reference vechord/rerank.py:66-92)."""

    model: str = "jina-reranker-m0"
    transport: object | None = None

    def rerank(self, query: str, texts: list[str]) -> list[int]:
        from vechord_spark.providers_http import JinaRerankClient

        return JinaRerankClient(model=self.model, transport=self.transport).rerank(
            query, texts
        )


# NER prompt contract (reference vechord/graph.py:143-148): entity =
# person/location/org/event/category; structured-JSON response.
NER_PROMPT = (
    "Given the text document, extract meaningful named entities and the "
    "possible relations between them. Entity could be person, location, "
    "org, event or category.\n<document>\n{text}\n</document>\n"
)

NER_RELATION_SCHEMA = {
    "type": "array",
    "items": {
        "type": "object",
        "properties": {
            "source": {
                "type": "object",
                "properties": {"text": {"type": "string"}, "label": {"type": "string"}},
                "required": ["text", "label"],
            },
            "target": {
                "type": "object",
                "properties": {"text": {"type": "string"}, "label": {"type": "string"}},
                "required": ["text", "label"],
            },
            "description": {"type": "string"},
        },
        "required": ["source", "target"],
    },
}


@dataclass
class GeminiNER:
    """LLM entity/relation extraction (reference vechord/graph.py:155-223)
    via structured-JSON generation. Output feeds the graph merge
    operators (operators/graph.py) as (text, label, description) rows."""

    model: str = "gemini-2.5-flash"
    transport: object | None = None

    def _client(self):
        from vechord_spark.providers_http import GeminiGenerateClient

        return GeminiGenerateClient(model=self.model, transport=self.transport)

    def extract(self, text: str) -> tuple[list[dict], list[dict]]:
        """Returns (entities, relations); entities are deduped from the
        relation endpoints (reference decode_relations,
        vechord/graph.py:185-198)."""
        import json as _json

        raw = self._client().generate(
            NER_PROMPT.format(text=text), response_schema=NER_RELATION_SCHEMA
        )
        try:
            relations = _json.loads(raw)
            if not isinstance(relations, list):
                raise TypeError("expected a JSON array of relations")
            ents: dict[str, dict] = {}
            for rel in relations:
                for side in ("source", "target"):
                    ent = rel[side]
                    ents[ent["text"]] = ent
        except (_json.JSONDecodeError, TypeError, KeyError) as err:
            raise ValueError(f"undecodable NER response: {raw[:200]}") from err
        return list(ents.values()), relations


# Contextual-retrieval prompt (the published Anthropic contextual
# retrieval recipe, quoted by the reference at vechord/augment.py:59-66)
AUGMENT_CONTEXT_PROMPT = (
    "<document>\n{doc}\n</document>\n"
    "Here is the chunk we want to situate within the whole document \n"
    "<chunk>\n{chunk}\n</chunk>\n"
    "Please give a short succinct context to situate this chunk within "
    "the overall document for the purposes of improving search retrieval "
    "of the chunk. Answer only with the succinct context and nothing else."
)

# query-generation variant (reference vechord/augment.py:68-82)
AUGMENT_QUERY_PROMPT = (
    "<document>\n{doc}\n</document>\n"
    "Here is the chunk we want to ask questions about \n"
    "<chunk>\n{chunk}\n</chunk>\n"
    "Please ask questions about this chunk based on the overall document "
    "for the purposes of improving search retrieval of the chunk. "
    "Answer only with the question and nothing else."
)

# doc summarization (reference vechord/augment.py:84-93)
SUMMARIZE_PROMPT = (
    "Summarize the provided document concisely while preserving its key "
    "ideas, main arguments, and essential details. Ensure clarity and "
    "coherence, avoiding unnecessary repetition."
    "\n<document>{doc}</document>\n"
)


@dataclass
class GeminiAugmenter:
    """Contextual-retrieval augmentation (reference
    vechord/augment.py:30-93). The no-network in-plan analog is
    operators/augment.augment_with_doc_head."""

    model: str = "gemini-2.5-flash"
    transport: object | None = None

    def _client(self):
        from vechord_spark.providers_http import GeminiGenerateClient

        return GeminiGenerateClient(model=self.model, transport=self.transport)

    def augment_chunk(self, doc: str, chunk: str) -> str:
        return self._client().generate(
            AUGMENT_CONTEXT_PROMPT.format(doc=doc, chunk=chunk)
        ).strip()

    def augment_chunks(self, doc: str, chunks: list[str]) -> list[str]:
        client = self._client()
        return [
            client.generate(AUGMENT_CONTEXT_PROMPT.format(doc=doc, chunk=c)).strip()
            for c in chunks
        ]

    def augment_query(self, doc: str, chunks: list[str]) -> list[str]:
        """Generate a retrieval question per chunk (reference
        vechord/augment.py:68-82)."""
        client = self._client()
        return [
            client.generate(AUGMENT_QUERY_PROMPT.format(doc=doc, chunk=c)).strip()
            for c in chunks
        ]

    def summarize_doc(self, doc: str) -> str:
        """Concise document summary (reference vechord/augment.py:84-93)."""
        return self._client().generate(SUMMARIZE_PROMPT.format(doc=doc)).strip()


# OCR extraction contracts (reference vechord/extract.py:91-101):
# return content verbatim, no interpretation; images add a caption.
EXTRACT_PDF_PROMPT = (
    "Extract the main content from the PDF document. Ensure to exclude "
    "any metadata, headers, footers, or any other non-essential "
    "information. Return the extracted content as it appears in the "
    "document, without any additional modification, summarization or "
    "interpretation."
)
EXTRACT_IMAGE_PROMPT = (
    "Extract the visible text from the image, generate a concise "
    "caption describing the image's content or scene, return the text "
    "with caption."
)


@dataclass
class GeminiExtractor:
    """OCR via Gemini generation with inline document/image data
    (reference vechord/extract.py:104-134; D4). The no-network PDF path
    is sources/loaders.extract_pdf."""

    model: str = "gemini-2.5-flash"
    prompt: str = ""
    transport: object | None = None

    def _client(self):
        from vechord_spark.providers_http import GeminiGenerateClient

        return GeminiGenerateClient(model=self.model, transport=self.transport)

    def extract_pdf(self, doc: bytes) -> str:
        return self._client().generate(
            self.prompt or EXTRACT_PDF_PROMPT,
            inline_data=doc,
            mime_type="application/pdf",
        ).strip()

    def extract_image(self, img: bytes) -> str:
        return self._client().generate(
            self.prompt or EXTRACT_IMAGE_PROMPT,
            inline_data=img,
            mime_type="image/jpeg",
        ).strip()


@dataclass
class LlamaParseExtractor:
    """OCR via the LlamaCloud Parse service: upload -> poll -> text
    (reference vechord/extract.py:137-169; D5). Same extractor contract
    as GeminiExtractor, different backend — useful for scanned PDFs
    where layout-aware parsing beats inline-data OCR."""

    transport: object | None = None

    def _client(self):
        from vechord_spark.providers_http import LlamaParseClient

        return LlamaParseClient(transport=self.transport)

    def extract_pdf(self, doc: bytes) -> str:
        # reference model/llamacloud.py:67-68 uploads as document.pdf
        return self._client().parse_bytes(doc, "application/pdf", "document.pdf").strip()

    def extract_image(self, img: bytes) -> str:
        # reference model/llamacloud.py:62-64 uploads as image.jpg
        return self._client().parse_bytes(img, "image/jpeg", "image.jpg").strip()


def _load_spacy(model: str):
    try:
        import spacy
    except ImportError as err:  # spaCy absent from this environment
        raise NotImplementedError(
            "spaCy is not installed; use operators/chunk.regex_chunk or "
            "the Gemini providers instead"
        ) from err
    return spacy.load(model)


@dataclass
class SpacyChunker:
    """Sentence segmentation (reference vechord/chunk.py:86-102). Uses
    spaCy when installed; otherwise falls back to the rule-based
    splitter in operators/chunk.split_sentences (same pattern as D1's
    pure-stdlib PDF fallback), so sentence chunking always runs. Set
    ``require_spacy=True`` to forbid the fallback."""

    model: str = "en_core_web_sm"
    require_spacy: bool = False

    def segment(self, text: str) -> list[str]:
        try:
            nlp = _load_spacy(self.model)
        except NotImplementedError:
            if self.require_spacy:
                raise
            from vechord_spark.operators.chunk import split_sentences

            return split_sentences(text)
        return [sent.text for sent in nlp(text).sents]


# LLM semantic-chunking contract (reference vechord/chunk.py:104-115):
# coherent segments under a token budget, document order preserved,
# structured list-of-strings response.
CHUNK_PROMPT = (
    "You are an expert text chunker. Divide the document into chunks that "
    "are as semantically coherent as possible, ensuring no chunk exceeds "
    "the specified token length, and maintain document order.\n"
    "The return format is a list of chunk strings.\n"
    "The maximum token length is {size} per chunk.\n"
    "The document is as follows: <document>\n{document}\n</document>"
)

CHUNK_LIST_SCHEMA = {"type": "array", "items": {"type": "string"}}

# above this input length the reference pre-splits with its regex
# chunker before asking the LLM (vechord/chunk.py:130-131,151-166)
GEMINI_CHUNK_INPUT_LIMIT = 65_536


@dataclass
class GeminiChunker:
    """LLM semantic chunking with a regex pre-split above 65,536 chars
    (reference vechord/chunk.py:118-166). The no-network chunkers are
    operators/chunk.regex_chunk and fixed_size_chunks."""

    model: str = "gemini-2.5-flash"
    size: int = 1536
    transport: object | None = None

    def _client(self):
        from vechord_spark.providers_http import GeminiGenerateClient

        return GeminiGenerateClient(model=self.model, transport=self.transport)

    def _ask(self, client, document: str) -> list[str]:
        import json as _json

        raw = client.generate(
            CHUNK_PROMPT.format(size=self.size, document=document),
            response_schema=CHUNK_LIST_SCHEMA,
        )
        chunks = _json.loads(raw)
        if not isinstance(chunks, list):
            raise ValueError(f"expected a JSON list of chunks, got: {raw[:200]}")
        return [str(c) for c in chunks]

    def segment(self, text: str) -> list[str]:
        client = self._client()
        if len(text) <= GEMINI_CHUNK_INPUT_LIMIT:
            return self._ask(client, text)
        from vechord_spark.operators.chunk import regex_chunk

        out: list[str] = []
        for piece in regex_chunk(text, size=GEMINI_CHUNK_INPUT_LIMIT, overlap=0):
            out.extend(self._ask(client, piece))
        return out


# tokens that open a sentence without being an entity (heuristic NER)
_SENT_START_STOPWORDS = frozenset(
    "the a an in on at it he she they we i you this that these those "
    "but and or so if when while after before however then there "
    "is are was were his her its their our my your".split()
)

# closed-class + high-frequency verbs for the ENT-VERB-ENT test
_COMMON_VERBS = frozenset(
    "is are was were be been being has have had do does did can could "
    "will would may might must made make makes created creates founded "
    "founds acquired acquires owns owned runs ran leads led wrote "
    "writes built builds develops developed launched launches joined "
    "joins works worked met meets visited visits announced announces "
    "bought buys sold sells hired hires became becomes".split()
)

_WORD_STRIP = ".,;:!?\"'()[]"


def _verbish(token: str) -> bool:
    t = token.lower().strip(_WORD_STRIP)
    return t in _COMMON_VERBS or (len(t) > 4 and t.endswith(("ed", "ing")))


@dataclass
class RuleBasedRelationMatcher:
    """Pure-Python entity/relation extraction — the no-spaCy G6
    fallback (same role split_sentences plays for D7).

    Entities are maximal runs of capitalized tokens (a run never starts
    on a capitalized stopword); a relation is emitted for each adjacent
    within-sentence entity pair whose connecting span contains a
    verb-like token, with the covering span as the description — the
    same ENT-VERB-ENT contract as SpacyRelationMatcher, deterministic
    and dependency-free."""

    label: str = "ENTITY"

    def _sentence_entities(self, sent: str) -> list[tuple[int, int, str]]:
        """(start_word_idx, end_word_idx_exclusive, text) entity runs."""
        import re as _re

        words = sent.split()
        ents: list[tuple[int, int, str]] = []
        run_start: int | None = None

        def close(end: int) -> None:
            nonlocal run_start
            if run_start is not None:
                ents.append(
                    (
                        run_start,
                        end,
                        " ".join(x.strip(_WORD_STRIP) for x in words[run_start:end]),
                    )
                )
                run_start = None

        for i, w in enumerate(words):
            core = w.strip(_WORD_STRIP)
            is_cap = bool(_re.match(r"^[A-Z][\w-]*$", core))
            if is_cap and run_start is None:
                # a run never STARTS on a capitalized stopword ("The
                # company", "He said") — loses "The Hague", keeps the
                # fallback deterministic and precision-leaning
                if core.lower() in _SENT_START_STOPWORDS:
                    continue
                run_start = i
            elif not is_cap:
                close(i)
            # trailing punctuation ends the run ("Corp." / "Paris,")
            if run_start is not None and w != core and w.rstrip(_WORD_STRIP) != w:
                close(i + 1)
        close(len(words))
        return ents

    def extract(self, text: str) -> list[dict]:
        from vechord_spark.operators.chunk import split_sentences

        out: list[dict] = []
        for sent in split_sentences(text):
            for _, _, ent_text in self._sentence_entities(sent):
                out.append({"text": ent_text, "label": self.label, "description": ""})
        return out

    def extract_relations(self, text: str) -> tuple[list[dict], list[dict]]:
        from vechord_spark.operators.chunk import split_sentences

        ents: list[dict] = []
        relations: list[dict] = []
        for sent in split_sentences(text):
            words = sent.split()
            spans = self._sentence_entities(sent)
            for _, _, ent_text in spans:
                ents.append({"text": ent_text, "label": self.label, "description": ""})
            for (s1, e1, t1), (s2, e2, t2) in zip(spans, spans[1:]):
                between = words[e1:s2]
                if any(_verbish(w) for w in between):
                    relations.append(
                        {
                            "source": {"text": t1, "label": self.label},
                            "target": {"text": t2, "label": self.label},
                            "description": " ".join(
                                w.strip(_WORD_STRIP) for w in words[s1:e2]
                            ),
                        }
                    )
        return ents, relations


@dataclass
class SpacyRelationMatcher:
    """Rule-based entity/relation extraction via spaCy (the reference
    matches ENT-VERB-ENT style token patterns, vechord/graph.py:29-141).
    Falls back to RuleBasedRelationMatcher when spaCy is absent (set
    ``require_spacy=True`` to forbid). Behavioral analog, not a
    pattern-for-pattern port: entities come from ``doc.ents``; a
    relation is emitted for each within-sentence entity pair whose
    connecting span contains a verb, with that span as the description.
    Graph operators (operators/graph.py) consume the resulting
    (source, target, description) rows."""

    model: str = "en_core_web_sm"
    require_spacy: bool = False

    def _fallback(self) -> RuleBasedRelationMatcher | None:
        try:
            _load_spacy(self.model)
        except NotImplementedError:
            if self.require_spacy:
                raise
            return RuleBasedRelationMatcher()
        return None

    def extract(self, text: str) -> list[dict]:
        fb = self._fallback()
        if fb is not None:
            return fb.extract(text)
        nlp = _load_spacy(self.model)
        return [
            {"text": ent.text, "label": ent.label_, "description": ""}
            for ent in nlp(text).ents
        ]

    def extract_relations(self, text: str) -> tuple[list[dict], list[dict]]:
        fb = self._fallback()
        if fb is not None:
            return fb.extract_relations(text)
        nlp = _load_spacy(self.model)
        doc = nlp(text)
        ents = [
            {"text": ent.text, "label": ent.label_, "description": ""}
            for ent in doc.ents
        ]
        relations: list[dict] = []
        for sent in doc.sents:
            spans = [e for e in doc.ents if e.start >= sent.start and e.end <= sent.end]
            for a, b in zip(spans, spans[1:]):
                between = doc[a.end : b.start]
                if any(t.pos_ in ("VERB", "AUX") for t in between):
                    relations.append(
                        {
                            "source": {"text": a.text, "label": a.label_},
                            "target": {"text": b.text, "label": b.label_},
                            "description": " ".join(
                                t.text for t in doc[a.start : b.end]
                            ),
                        }
                    )
        return ents, relations
