"""Real external-provider HTTP clients (D9/R4/D4/D17 network halves).

The reference wires each external model through msgspec-typed request/
response structs and an httpx transport (vechord/provider.py:37-254,
vechord/model/{gemini,jina,voyage}.py). The request/response shapes are
the providers' PUBLIC APIs; this module re-implements them as plain
dict builders + parsers over a pluggable transport so that

- every shape is unit-testable against canned responses with zero
  network (tests/test_providers_http.py), and
- the Spark integration is the same rate-limited Arrow-batch stage as
  everything else (providers.external_stage) — one client per
  partition, ``repartition(n)`` as the global concurrency knob.

Only the stdlib is used for live calls (``urllib.request``); no
provider SDKs. API keys come from the conventional env vars
(GEMINI_API_KEY, JINA_API_KEY, VOYAGE_API_KEY, COHERE_API_KEY,
OPENAI_API_KEY — reference vechord/provider.py:42-46). Without a key
the client raises ``ApiKeyMissing`` at construction, mirroring the
reference's APIKeyUnsetError.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field
from typing import Any, Callable, Protocol

# public, documented request rates (reference vechord/utils.py:9-16)
GEMINI_GENERATE_RPS = 16.66
GEMINI_EMBEDDING_RPS = 0.6
VOYAGE_EMBEDDING_RPS = 33.33
JINA_EMBEDDING_RPS = 8.33
JINA_RERANK_RPS = 8.33
COHERE_RERANK_RPS = 10.0


class ApiKeyMissing(RuntimeError):
    def __init__(self, env_var: str) -> None:
        super().__init__(
            f"set {env_var} to use this provider (no network fallback exists)"
        )
        self.env_var = env_var


class HttpCallError(RuntimeError):
    def __init__(self, what: str, status: int, body: str) -> None:
        super().__init__(f"{what}: HTTP {status}: {body[:500]}")
        self.status = status


class Transport(Protocol):
    """POST json, return (status_code, response_bytes). Tests inject a
    canned implementation; live calls use UrllibTransport."""

    def post(self, url: str, headers: dict[str, str], body: bytes) -> tuple[int, bytes]: ...


@dataclass
class UrllibTransport:
    """stdlib POST with token-spacing rate limit + exponential-backoff
    retry on 429/5xx (the reference's RateLimitTransport behavior,
    vechord/utils.py:38-68, in blocking form)."""

    rps: float = 5.0
    timeout_sec: float = 60.0
    max_retries: int = 3
    _next_at: float = field(default=0.0, init=False, repr=False)

    def _pace(self) -> None:
        now = time.monotonic()
        wait = self._next_at - now
        if wait > 0:
            time.sleep(wait)
            now = time.monotonic()
        self._next_at = max(self._next_at, now) + 1.0 / self.rps

    def post(self, url: str, headers: dict[str, str], body: bytes) -> tuple[int, bytes]:
        return self._request(url, headers, body, "POST")

    def get(self, url: str, headers: dict[str, str]) -> tuple[int, bytes]:
        return self._request(url, headers, None, "GET")

    def _request(
        self, url: str, headers: dict[str, str], body: bytes | None, method: str
    ) -> tuple[int, bytes]:
        delay = 1.0
        for attempt in range(self.max_retries):
            self._pace()
            req = urllib.request.Request(url, data=body, headers=headers, method=method)
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
                    return resp.status, resp.read()
            except urllib.error.HTTPError as err:
                status, payload = err.code, err.read()
                if status not in (429, 500, 502, 503, 504) or attempt == self.max_retries - 1:
                    return status, payload
            except urllib.error.URLError:
                if attempt == self.max_retries - 1:
                    raise
            time.sleep(delay)
            delay *= 2
        raise AssertionError("unreachable")


def _env_key(env_var: str, explicit: str | None) -> str:
    key = explicit or os.environ.get(env_var)
    if not key:
        raise ApiKeyMissing(env_var)
    return key


def _resolve(
    env_var: str,
    api_key: str | None,
    transport: Transport | None,
    make_default: Callable[[], Transport],
) -> tuple[str, Transport]:
    """Live transport requires a real key; an injected transport (tests,
    proxies) only uses the key if one exists."""
    if transport is None:
        return _env_key(env_var, api_key), make_default()
    return api_key or os.environ.get(env_var) or "", transport


def _decode_embedding(emb: Any) -> list[float]:
    """Provider embeddings arrive as a float list or a base64-encoded
    little-endian float32 buffer (Jina/Voyage ``embedding_type/
    encoding_format: base64``)."""
    if isinstance(emb, str):
        import numpy as np

        return [float(x) for x in np.frombuffer(base64.b64decode(emb), dtype=np.float32)]
    return [float(x) for x in emb]


def _post_json(
    transport: Transport, what: str, url: str, headers: dict[str, str], payload: dict
) -> dict:
    body = json.dumps(payload).encode()
    status, raw = transport.post(url, {"Content-Type": "application/json", **headers}, body)
    if status >= 400:
        raise HttpCallError(what, status, raw.decode(errors="replace"))
    return json.loads(raw)


# ---------------------------------------------------------------------------
# request builders / response parsers (pure — the unit-testable layer)
# ---------------------------------------------------------------------------

GEMINI_BASE = "https://generativelanguage.googleapis.com/v1beta/models"

# Gemini task types are the doc/query asymmetry switch
# (reference vechord/embedding.py:146,158)
GEMINI_DOC_TASK = "RETRIEVAL_DOCUMENT"
GEMINI_QUERY_TASK = "RETRIEVAL_QUERY"


def gemini_embed_payload(text: str, task_type: str) -> dict:
    return {"content": {"parts": [{"text": text}]}, "taskType": task_type}


def parse_gemini_embedding(resp: dict) -> list[float]:
    return _decode_embedding(resp["embedding"]["values"])


def gemini_generate_payload(
    prompt: str,
    response_schema: dict | None = None,
    inline_data: bytes | None = None,
    mime_type: str | None = None,
) -> dict:
    """``inline_data`` attaches a document/image part (OCR, multimodal
    judging — reference GeminiGenerateRequest.from_prompt_with_data);
    the REST shape carries it base64-encoded under inline_data."""
    parts: list[dict] = [{"text": prompt}]
    if inline_data is not None:
        parts.append(
            {
                "inline_data": {
                    "mime_type": mime_type or "application/pdf",
                    "data": base64.b64encode(inline_data).decode(),
                }
            }
        )
    payload: dict = {"contents": {"parts": parts}}
    if response_schema is not None:
        payload["generationConfig"] = {
            "response_mime_type": "application/json",
            "response_json_schema": response_schema,
        }
    return payload


def parse_gemini_text(resp: dict) -> str:
    candidates = resp.get("candidates") or []
    if not candidates:
        return ""
    parts = candidates[0].get("content", {}).get("parts") or []
    return parts[0].get("text", "") if parts else ""


JINA_EMBED_URL = "https://api.jina.ai/v1/embeddings"
JINA_RERANK_URL = "https://api.jina.ai/v1/rerank"
JINA_DOC_TASK = "retrieval.passage"
JINA_QUERY_TASK = "retrieval.query"


def jina_embed_payload(texts: list[str], task: str, model: str, dim: int) -> dict:
    return {
        "model": model,
        "dimensions": dim,
        "truncate": True,
        "task": task,
        "embedding_type": "base64",
        "input": [{"text": t} for t in texts],
    }


def jina_rerank_payload(query: str, documents: list[str], model: str) -> dict:
    if not query or not documents:
        raise ValueError("query and documents must be non-empty")
    return {
        "model": model,
        "query": query,
        "top_n": len(documents),
        "documents": list(documents),
        "return_documents": False,
    }


def jina_rerank_multimodal_payload(
    query: str, documents: list[str], doc_type: str, model: str = "jina-reranker-m0"
) -> dict:
    """Multimodal rerank (reference vechord/model/jina.py
    from_query_multimodal): documents wrap as {"text": ...} or
    {"image": <url-or-base64>} depending on ``doc_type``."""
    if doc_type not in ("text", "image"):
        raise ValueError("doc_type must be 'text' or 'image'")
    key = "text" if doc_type == "text" else "image"
    return {
        "model": model,
        "query": query,
        "top_n": len(documents),
        "documents": [{key: d} for d in documents],
        "return_documents": False,
    }


VOYAGE_EMBED_URL = "https://api.voyageai.com/v1/embeddings"


def voyage_embed_payload(texts: list[str], input_type: str, model: str, dim: int) -> dict:
    return {
        "model": model,
        "input": list(texts),
        "input_type": input_type,  # "document" | "query"
        "truncation": True,
        "output_dimension": dim,
        "output_dtype": "float",
        "encoding_format": "base64",
    }


OPENAI_EMBED_URL = "https://api.openai.com/v1/embeddings"


def openai_embed_payload(texts: list[str], model: str, dim: int | None) -> dict:
    payload: dict = {"model": model, "input": list(texts), "encoding_format": "float"}
    if dim is not None:
        payload["dimensions"] = dim
    return payload


def parse_indexed_embeddings(resp: dict) -> list[list[float]]:
    """OpenAI/Jina/Voyage share the ``{"data": [{"index": i,
    "embedding": ...}]}`` shape; order by index."""
    data = sorted(resp["data"], key=lambda d: d["index"])
    return [_decode_embedding(d["embedding"]) for d in data]


COHERE_RERANK_URL = "https://api.cohere.com/v2/rerank"


def cohere_rerank_payload(query: str, documents: list[str], model: str) -> dict:
    if not query or not documents:
        raise ValueError("query and documents must be non-empty")
    return {"model": model, "query": query, "documents": list(documents)}


def parse_rerank_indices(resp: dict) -> list[int]:
    """Cohere v2 and Jina rerank both answer ``{"results": [{"index":
    i, "relevance_score": s}]}`` sorted most-relevant-first; the engine
    contract is the reranked index list (reference
    vechord/rerank.py:52-58,72-78)."""
    return [r["index"] for r in resp["results"]]


# ---------------------------------------------------------------------------
# clients
# ---------------------------------------------------------------------------


@dataclass
class GeminiEmbeddingClient:
    """Gemini dense embedder over the public embedContent endpoint
    (reference vechord/provider.py:86-119, embedding.py:108-160)."""

    model: str = "gemini-embedding-001"
    dim: int = 3072
    api_key: str | None = None
    transport: Transport | None = None

    def __post_init__(self) -> None:
        self.api_key, self.transport = _resolve(
            "GEMINI_API_KEY",
            self.api_key,
            self.transport,
            lambda: UrllibTransport(rps=GEMINI_EMBEDDING_RPS),
        )

    def _call(self, text: str, task: str) -> list[float]:
        resp = _post_json(
            self.transport,
            "gemini embed",
            f"{GEMINI_BASE}/{self.model}:embedContent",
            {"x-goog-api-key": self.api_key},
            gemini_embed_payload(text, task),
        )
        return parse_gemini_embedding(resp)

    def embed_document(self, text: str) -> list[float]:
        return self._call(text, GEMINI_DOC_TASK)

    def embed_query(self, text: str) -> list[float]:
        return self._call(text, GEMINI_QUERY_TASK)


@dataclass
class GeminiGenerateClient:
    """Gemini text generation with optional structured-JSON response
    (reference vechord/provider.py:55-84)."""

    model: str = "gemini-2.5-flash"
    api_key: str | None = None
    transport: Transport | None = None

    def __post_init__(self) -> None:
        self.api_key, self.transport = _resolve(
            "GEMINI_API_KEY",
            self.api_key,
            self.transport,
            lambda: UrllibTransport(rps=GEMINI_GENERATE_RPS, timeout_sec=120.0),
        )

    def generate(
        self,
        prompt: str,
        response_schema: dict | None = None,
        inline_data: bytes | None = None,
        mime_type: str | None = None,
    ) -> str:
        resp = _post_json(
            self.transport,
            "gemini generate",
            f"{GEMINI_BASE}/{self.model}:generateContent",
            {"x-goog-api-key": self.api_key},
            gemini_generate_payload(prompt, response_schema, inline_data, mime_type),
        )
        return parse_gemini_text(resp)


@dataclass
class JinaEmbeddingClient:
    """Jina v3/v4 dense embedder (reference vechord/provider.py:122-150,
    embedding.py:163-206). Batch-capable: one request, many inputs."""

    model: str = "jina-embeddings-v4"
    dim: int = 2048
    api_key: str | None = None
    transport: Transport | None = None

    def __post_init__(self) -> None:
        self.api_key, self.transport = _resolve(
            "JINA_API_KEY",
            self.api_key,
            self.transport,
            lambda: UrllibTransport(rps=JINA_EMBEDDING_RPS),
        )

    def _call(self, texts: list[str], task: str) -> list[list[float]]:
        resp = _post_json(
            self.transport,
            "jina embed",
            JINA_EMBED_URL,
            {"Authorization": f"Bearer {self.api_key}"},
            jina_embed_payload(texts, task, self.model, self.dim),
        )
        return parse_indexed_embeddings(resp)

    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        return self._call(texts, JINA_DOC_TASK)

    def embed_query(self, text: str) -> list[float]:
        return self._call([text], JINA_QUERY_TASK)[0]


@dataclass
class VoyageEmbeddingClient:
    """Voyage dense embedder (reference vechord/provider.py:180-208,
    embedding.py:267-309)."""

    model: str = "voyage-3.5"
    dim: int = 1024
    api_key: str | None = None
    transport: Transport | None = None

    def __post_init__(self) -> None:
        self.api_key, self.transport = _resolve(
            "VOYAGE_API_KEY",
            self.api_key,
            self.transport,
            lambda: UrllibTransport(rps=VOYAGE_EMBEDDING_RPS),
        )

    def _call(self, texts: list[str], input_type: str) -> list[list[float]]:
        resp = _post_json(
            self.transport,
            "voyage embed",
            VOYAGE_EMBED_URL,
            {"Authorization": f"Bearer {self.api_key}"},
            voyage_embed_payload(texts, input_type, self.model, self.dim),
        )
        return parse_indexed_embeddings(resp)

    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        return self._call(texts, "document")

    def embed_query(self, text: str) -> list[float]:
        return self._call([text], "query")[0]


@dataclass
class OpenAIEmbeddingClient:
    """OpenAI dense embedder over the public /v1/embeddings endpoint
    (reference vechord/embedding.py:372-410 uses the SDK; the wire
    shape is the same)."""

    model: str = "text-embedding-3-large"
    dim: int | None = 3072
    api_key: str | None = None
    base_url: str = OPENAI_EMBED_URL
    transport: Transport | None = None

    def __post_init__(self) -> None:
        self.api_key, self.transport = _resolve(
            "OPENAI_API_KEY",
            self.api_key,
            self.transport,
            lambda: UrllibTransport(rps=10.0),
        )

    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        resp = _post_json(
            self.transport,
            "openai embed",
            self.base_url,
            {"Authorization": f"Bearer {self.api_key}"},
            openai_embed_payload(texts, self.model, self.dim),
        )
        return parse_indexed_embeddings(resp)

    def embed_query(self, text: str) -> list[float]:
        # OpenAI has no doc/query task asymmetry
        return self.embed_documents([text])[0]


@dataclass
class JinaRerankClient:
    """Jina reranker -> reranked index list (reference
    vechord/rerank.py:66-92, provider.py:153-177)."""

    model: str = "jina-reranker-m0"
    api_key: str | None = None
    transport: Transport | None = None

    def __post_init__(self) -> None:
        self.api_key, self.transport = _resolve(
            "JINA_API_KEY",
            self.api_key,
            self.transport,
            lambda: UrllibTransport(rps=JINA_RERANK_RPS, timeout_sec=120.0),
        )

    def rerank(self, query: str, documents: list[str]) -> list[int]:
        resp = _post_json(
            self.transport,
            "jina rerank",
            JINA_RERANK_URL,
            {"Authorization": f"Bearer {self.api_key}"},
            jina_rerank_payload(query, documents, self.model),
        )
        return parse_rerank_indices(resp)

    def rerank_multimodal(
        self, query: str, documents: list[str], doc_type: str = "text"
    ) -> list[int]:
        """Rerank text or image documents (reference
        vechord/rerank.py:80-92)."""
        resp = _post_json(
            self.transport,
            "jina rerank",
            JINA_RERANK_URL,
            {"Authorization": f"Bearer {self.api_key}"},
            jina_rerank_multimodal_payload(query, documents, doc_type, self.model),
        )
        return parse_rerank_indices(resp)


@dataclass
class SpladeEmbeddingClient:
    """Splade++ sparse embedder against a SELF-HOSTED inference service
    (reference vechord/embedding.py:412-441: POST /inference with a
    JSON list of texts, response = one {index: value} sparse map per
    text). No API key — the endpoint is the deployment's own."""

    base_url: str = "http://localhost:8080"
    dim: int = 30522
    transport: Transport | None = None

    def __post_init__(self) -> None:
        self.transport = self.transport or UrllibTransport(rps=50.0, timeout_sec=10.0)

    def embed_sparse(self, texts: list[str]) -> list[dict[int, float]]:
        body = json.dumps(list(texts)).encode()
        status, raw = self.transport.post(
            f"{self.base_url.rstrip('/')}/inference",
            {"Content-Type": "application/json"},
            body,
        )
        if status >= 400:
            raise HttpCallError("splade inference", status, raw.decode(errors="replace"))
        out = json.loads(raw)
        return [
            {int(k): float(v) for k, v in emb.items()} for emb in out
        ]


@dataclass
class CohereRerankClient:
    """Cohere v2 reranker -> reranked index list (reference
    vechord/rerank.py:28-63 uses the SDK; this is the public REST
    shape)."""

    model: str = "rerank-v3.5"
    api_key: str | None = None
    transport: Transport | None = None

    def __post_init__(self) -> None:
        self.api_key, self.transport = _resolve(
            "COHERE_API_KEY",
            self.api_key,
            self.transport,
            lambda: UrllibTransport(rps=COHERE_RERANK_RPS),
        )

    def rerank(self, query: str, documents: list[str]) -> list[int]:
        resp = _post_json(
            self.transport,
            "cohere rerank",
            COHERE_RERANK_URL,
            {"Authorization": f"Bearer {self.api_key}"},
            cohere_rerank_payload(query, documents, self.model),
        )
        return parse_rerank_indices(resp)


# ---------------------------------------------------------------------------
# LlamaCloud Parse OCR (reference vechord/provider.py:209-254,
# extract.py:137-169, model/llamacloud.py:56-71; D5)
# ---------------------------------------------------------------------------

LLAMA_CLOUD_BASE = "https://api.cloud.llamaindex.ai/api"
# reference provider.py:33-34 — 30-minute job cap, 5 s poll cadence
EXTRACT_MAX_POLLING_TIME = 1800.0
EXTRACT_CHECK_INTERVAL = 5.0


def encode_multipart(
    filename: str, content: bytes, mime_type: str, boundary: str | None = None
) -> tuple[bytes, str]:
    """RFC 2388 multipart/form-data body for a single ``file`` field
    (the upload shape httpx builds for the reference's
    ``files={"file": (...)}`` call). Returns (body, content_type)."""
    if boundary is None:
        boundary = "vechord-" + hashlib.md5(filename.encode() + content[:64]).hexdigest()
    head = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="file"; filename="{filename}"\r\n'
        f"Content-Type: {mime_type}\r\n\r\n"
    ).encode()
    tail = f"\r\n--{boundary}--\r\n".encode()
    return head + content + tail, f"multipart/form-data; boundary={boundary}"


class PollTransport(Protocol):
    """Transport that can also GET (job polling)."""

    def post(self, url: str, headers: dict[str, str], body: bytes) -> tuple[int, bytes]: ...

    def get(self, url: str, headers: dict[str, str]) -> tuple[int, bytes]: ...


@dataclass
class LlamaParseClient:
    """LlamaCloud Parse: multipart upload -> job id -> poll
    ``/result/text`` until the job completes (reference
    provider.py:226-254). Service limits (reference extract.py:139-145):
    30-min jobs, 300 MB files, 64 KB text per page."""

    api_key: str | None = None
    transport: PollTransport | None = None
    poll_interval: float = EXTRACT_CHECK_INTERVAL
    max_poll_sec: float = EXTRACT_MAX_POLLING_TIME

    def __post_init__(self) -> None:
        self.api_key, self.transport = _resolve(
            "LLAMA_CLOUD_API_KEY",
            self.api_key,
            self.transport,
            lambda: UrllibTransport(rps=2.0, timeout_sec=60.0),
        )

    def _auth(self) -> dict[str, str]:
        return {"Authorization": f"Bearer {self.api_key}"}

    def parse_upload(self, content: bytes, mime_type: str, filename: str) -> str:
        body, ctype = encode_multipart(filename, content, mime_type)
        status, raw = self.transport.post(
            f"{LLAMA_CLOUD_BASE}/parsing/upload",
            {**self._auth(), "Content-Type": ctype},
            body,
        )
        if status >= 400:
            raise HttpCallError("llamaparse upload", status, raw.decode(errors="replace"))
        return str(json.loads(raw)["id"])

    def get_text(self, job_id: str) -> str:
        """Poll the job result until success, with the 30-minute
        deadline. Permanent failures fail fast instead of burning the
        full poll window: 401/403 (bad/revoked key) and an explicit
        error-status job payload raise immediately. A 404 from the
        result endpoint is ambiguous (LlamaCloud 404s until the job
        finishes), so on the FIRST 404 the job-status endpoint is
        consulted once: unknown job or failed status raises; a pending
        job keeps the poll loop alive."""
        deadline = time.monotonic() + self.max_poll_sec
        checked_job_exists = False
        while True:
            status, raw = self.transport.get(
                f"{LLAMA_CLOUD_BASE}/parsing/job/{job_id}/result/text", self._auth()
            )
            if 200 <= status < 300:
                return str(json.loads(raw)["text"])
            if status in (401, 403):
                raise HttpCallError(
                    "llamaparse result", status, raw.decode(errors="replace")
                )
            if status == 404 and not checked_job_exists:
                checked_job_exists = True
                s2, raw2 = self.transport.get(
                    f"{LLAMA_CLOUD_BASE}/parsing/job/{job_id}", self._auth()
                )
                if s2 in (401, 403, 404):
                    raise HttpCallError(
                        "llamaparse job lookup", s2, raw2.decode(errors="replace")
                    )
                if 200 <= s2 < 300:
                    raw = raw2  # let the status check below see the job payload
            try:
                job_status = str(json.loads(raw).get("status", "")).upper()
            except (ValueError, AttributeError):
                job_status = ""
            if job_status in ("ERROR", "FAILED", "CANCELED", "CANCELLED"):
                raise HttpCallError(
                    "llamaparse job failed", status, raw.decode(errors="replace")
                )
            if time.monotonic() > deadline:
                raise TimeoutError(
                    "Polling LlamaCloud job result timed out after "
                    f"{self.max_poll_sec} seconds."
                )
            time.sleep(self.poll_interval)

    def parse_bytes(self, content: bytes, mime_type: str, filename: str) -> str:
        return self.get_text(self.parse_upload(content, mime_type, filename))


# ---------------------------------------------------------------------------
# UMBRELA LLM relevance judge (reference vechord/evaluate.py:159-231)
# ---------------------------------------------------------------------------

# Zero-shot DNA prompt from the UMBRELA paper (arXiv:2406.06519, Fig. 1;
# the reference quotes the same published prompt). Condensed wording,
# same rubric and output contract.
UMBRELA_PROMPT = """\
Given a query and a passage, you must provide a score on an integer
scale of 0 to 3 with the following meanings:
0 = the passage has nothing to do with the query,
1 = the passage seems related to the query but does not answer it,
2 = the passage has some answer for the query, but may be unclear or
hidden amongst extraneous information,
3 = the passage is dedicated to the query and contains the exact
answer.
Split this problem into steps: consider the underlying intent of the
search; measure how well the content matches a likely intent of the
query (M); measure how trustworthy the passage is (T); then decide on
a final score (O). The final score must be a single integer.

Query: {query}
Passage: {passage}
"""

UMBRELA_SCORE_SCHEMA = {
    "type": "object",
    "properties": {"score": {"type": "integer"}},
    "required": ["score"],
}


@dataclass
class UmbrelaJudge:
    """LLM relevance assessor: (query, passage) -> 0-3, via a
    structured-JSON Gemini generation. ``relevant_threshold`` mirrors
    the reference default (score >= 2 counts as relevant)."""

    client: GeminiGenerateClient
    relevant_threshold: int = 2

    def estimate(self, query: str, passage: str) -> int:
        if not passage:
            return 0
        text = self.client.generate(
            UMBRELA_PROMPT.format(query=query, passage=passage),
            response_schema=UMBRELA_SCORE_SCHEMA,
        )
        try:
            score = int(json.loads(text)["score"])
        except (json.JSONDecodeError, KeyError, TypeError, ValueError) as err:
            raise ValueError(f"undecodable UMBRELA response: {text[:200]}") from err
        return max(0, min(3, score))


class EchoTransport:
    """Deterministic OFFLINE transport: answers every provider request
    from the request itself — embeddings encode text length, reranks
    reverse the input order, UMBRELA scores 3 iff the prompt mentions
    'relevant'. For tests and no-network drives of provider-backed
    pipelines; importable on executors (unlike test-module classes).
    Never performs I/O."""

    def post(self, url: str, headers: dict[str, str], body: bytes) -> tuple[int, bytes]:
        req = json.loads(body)
        if "embedContent" in url:
            text = req["content"]["parts"][0]["text"]
            return 200, json.dumps(
                {"embedding": {"values": [float(len(text)), 1.0]}}
            ).encode()
        if "generateContent" in url:
            prompt = req["contents"]["parts"][0]["text"]
            score = 3 if "relevant" in prompt else 0
            return 200, json.dumps(
                {
                    "candidates": [
                        {"content": {"parts": [{"text": '{"score": %d}' % score}]}}
                    ]
                }
            ).encode()
        if url.endswith("/rerank"):
            n = len(req["documents"])
            return 200, json.dumps(
                {
                    "results": [
                        {"index": i, "relevance_score": 1.0 - i / n}
                        for i in reversed(range(n))
                    ]
                }
            ).encode()
        if url.endswith("/embeddings"):
            texts = [
                d["text"] if isinstance(d, dict) else d for d in req["input"]
            ]
            return 200, json.dumps(
                {
                    "data": [
                        {"index": i, "embedding": [float(len(t)), 2.0]}
                        for i, t in enumerate(texts)
                    ]
                }
            ).encode()
        return 404, b"{}"


# ---------------------------------------------------------------------------
# Spark integration: provider calls as rate-limited Arrow stages
# ---------------------------------------------------------------------------


def embedding_stage(
    make_client: Callable[[], Any],
    text_col: str = "text",
    out_col: str = "embedding",
    rps: float | None = None,
):
    """DataFrame transform: add ``out_col`` by batch-embedding
    ``text_col`` through a provider client. ``make_client`` runs once
    per partition (clients hold sockets; they must not cross the
    pickle boundary). Errors are quarantined per batch into ``_error``
    (providers.external_stage semantics)."""
    import pandas as pd
    from pyspark.sql import types as T

    from vechord_spark.providers import external_stage

    def transform(df):
        schema = T.StructType(
            list(df.schema.fields)
            + [
                T.StructField(out_col, T.ArrayType(T.FloatType())),
                T.StructField("_error", T.StringType()),
            ]
        )
        holder: dict[str, Any] = {}

        def call(pdf: pd.DataFrame) -> pd.DataFrame:
            client = holder.setdefault("c", make_client())
            out = pdf.copy()
            out[out_col] = client.embed_documents(pdf[text_col].fillna("").tolist())
            return out

        return external_stage(call, schema, rps=rps)(df)

    return transform


def umbrela_stage(
    make_judge: Callable[[], UmbrelaJudge],
    query_col: str = "query_text",
    doc_col: str = "doc_text",
    out_col: str = "score",
    rps: float | None = GEMINI_GENERATE_RPS,
):
    """DataFrame transform: add the UMBRELA 0-3 ``score`` column for
    (query, passage) rows — the live replacement for
    operators/groundtruth.umbrela_stub_scores (same output shape, so
    generate_ground_truth/evaluate_against_truth are unchanged)."""
    import pandas as pd
    from pyspark.sql import types as T

    from vechord_spark.providers import external_stage

    def transform(df):
        schema = T.StructType(
            list(df.schema.fields)
            + [
                T.StructField(out_col, T.IntegerType()),
                T.StructField("_error", T.StringType()),
            ]
        )
        holder: dict[str, Any] = {}

        def call(pdf: pd.DataFrame) -> pd.DataFrame:
            judge = holder.setdefault("j", make_judge())
            out = pdf.copy()
            out[out_col] = [
                judge.estimate(q, p)
                for q, p in zip(pdf[query_col].fillna(""), pdf[doc_col].fillna(""))
            ]
            return out

        return external_stage(call, schema, rps=rps)(df)

    return transform
