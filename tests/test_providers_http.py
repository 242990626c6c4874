"""Provider HTTP clients against canned responses (no network).

Each test verifies the exact public wire shape (URL, auth header,
request payload) and the response parsing — the testable halves of
D9/R4/D17 (reference vechord/provider.py:37-254, rerank.py:28-92,
evaluate.py:159-231)."""

from __future__ import annotations

import base64
import json

import numpy as np
import pytest

from vechord_spark.providers_http import (
    ApiKeyMissing,
    CohereRerankClient,
    GeminiEmbeddingClient,
    GeminiGenerateClient,
    HttpCallError,
    JinaEmbeddingClient,
    JinaRerankClient,
    OpenAIEmbeddingClient,
    UmbrelaJudge,
    UMBRELA_SCORE_SCHEMA,
    VoyageEmbeddingClient,
    parse_indexed_embeddings,
    parse_rerank_indices,
)


class FakeTransport:
    """Canned-response transport: records every call, replays a queue."""

    def __init__(self, *responses):
        self.queue = list(responses)
        self.calls = []

    def post(self, url, headers, body):
        self.calls.append((url, headers, json.loads(body)))
        status, payload = self.queue.pop(0)
        return status, json.dumps(payload).encode()


def b64_f32(vals):
    return base64.b64encode(np.asarray(vals, dtype=np.float32).tobytes()).decode()


# ---------------------------------------------------------------------------
# Gemini
# ---------------------------------------------------------------------------


def test_gemini_embed_doc_query_asymmetry_and_shape():
    t = FakeTransport(
        (200, {"embedding": {"values": [1.0, 2.0]}}),
        (200, {"embedding": {"values": [3.0, 4.0]}}),
    )
    c = GeminiEmbeddingClient(model="gemini-embedding-001", dim=2, api_key="k", transport=t)
    assert c.embed_document("hello") == [1.0, 2.0]
    assert c.embed_query("hello") == [3.0, 4.0]
    url, headers, body = t.calls[0]
    assert url.endswith("models/gemini-embedding-001:embedContent")
    assert headers["x-goog-api-key"] == "k"
    assert body == {"content": {"parts": [{"text": "hello"}]}, "taskType": "RETRIEVAL_DOCUMENT"}
    assert t.calls[1][2]["taskType"] == "RETRIEVAL_QUERY"


def test_gemini_generate_structured():
    t = FakeTransport(
        (200, {"candidates": [{"content": {"parts": [{"text": '{"score": 2}'}]}}]})
    )
    c = GeminiGenerateClient(api_key="k", transport=t)
    out = c.generate("judge this", response_schema=UMBRELA_SCORE_SCHEMA)
    assert out == '{"score": 2}'
    _, _, body = t.calls[0]
    assert body["generationConfig"]["response_mime_type"] == "application/json"
    assert body["generationConfig"]["response_json_schema"] == UMBRELA_SCORE_SCHEMA


def test_gemini_http_error_raises():
    t = FakeTransport((403, {"error": "denied"}))
    c = GeminiEmbeddingClient(api_key="k", transport=t)
    with pytest.raises(HttpCallError):
        c.embed_document("x")


def test_api_key_missing(monkeypatch):
    monkeypatch.delenv("GEMINI_API_KEY", raising=False)
    with pytest.raises(ApiKeyMissing):
        GeminiEmbeddingClient()


# ---------------------------------------------------------------------------
# Jina
# ---------------------------------------------------------------------------


def test_jina_embed_batch_base64_roundtrip():
    t = FakeTransport(
        (
            200,
            {
                "data": [
                    {"index": 1, "embedding": b64_f32([0.5, -0.5])},
                    {"index": 0, "embedding": b64_f32([1.5, 2.5])},
                ]
            },
        )
    )
    c = JinaEmbeddingClient(dim=2, api_key="jk", transport=t)
    out = c.embed_documents(["a", "b"])
    # out-of-order response must be re-sorted by index
    assert out == [[1.5, 2.5], [0.5, -0.5]]
    url, headers, body = t.calls[0]
    assert url == "https://api.jina.ai/v1/embeddings"
    assert headers["Authorization"] == "Bearer jk"
    assert body["task"] == "retrieval.passage"
    assert body["input"] == [{"text": "a"}, {"text": "b"}]
    assert body["embedding_type"] == "base64"


def test_jina_query_task():
    t = FakeTransport((200, {"data": [{"index": 0, "embedding": [9.0]}]}))
    c = JinaEmbeddingClient(dim=1, api_key="jk", transport=t)
    assert c.embed_query("q") == [9.0]
    assert t.calls[0][2]["task"] == "retrieval.query"


def test_jina_rerank_indices():
    t = FakeTransport(
        (
            200,
            {
                "results": [
                    {"index": 2, "relevance_score": 0.9},
                    {"index": 0, "relevance_score": 0.5},
                    {"index": 1, "relevance_score": 0.1},
                ]
            },
        )
    )
    c = JinaRerankClient(api_key="jk", transport=t)
    assert c.rerank("q", ["d0", "d1", "d2"]) == [2, 0, 1]
    _, _, body = t.calls[0]
    assert body["top_n"] == 3 and body["query"] == "q"


def test_jina_rerank_empty_raises():
    c = JinaRerankClient(api_key="jk", transport=FakeTransport())
    with pytest.raises(ValueError):
        c.rerank("", ["d"])


# ---------------------------------------------------------------------------
# Voyage / OpenAI
# ---------------------------------------------------------------------------


def test_voyage_embed_payload_and_parse():
    t = FakeTransport((200, {"data": [{"index": 0, "embedding": b64_f32([1.0, 0.0])}]}))
    c = VoyageEmbeddingClient(dim=2, api_key="vk", transport=t)
    assert c.embed_documents(["x"]) == [[1.0, 0.0]]
    url, headers, body = t.calls[0]
    assert url == "https://api.voyageai.com/v1/embeddings"
    assert body["input_type"] == "document"
    assert body["output_dimension"] == 2
    t2 = FakeTransport((200, {"data": [{"index": 0, "embedding": [2.0]}]}))
    c2 = VoyageEmbeddingClient(dim=1, api_key="vk", transport=t2)
    c2.embed_query("q")
    assert t2.calls[0][2]["input_type"] == "query"


def test_openai_embed():
    t = FakeTransport(
        (200, {"data": [{"index": 0, "embedding": [0.1, 0.2]}, {"index": 1, "embedding": [0.3, 0.4]}]})
    )
    c = OpenAIEmbeddingClient(model="text-embedding-3-small", dim=2, api_key="ok", transport=t)
    assert c.embed_documents(["a", "b"]) == [[0.1, 0.2], [0.3, 0.4]]
    url, headers, body = t.calls[0]
    assert url == "https://api.openai.com/v1/embeddings"
    assert headers["Authorization"] == "Bearer ok"
    assert body == {
        "model": "text-embedding-3-small",
        "input": ["a", "b"],
        "encoding_format": "float",
        "dimensions": 2,
    }


# ---------------------------------------------------------------------------
# Cohere
# ---------------------------------------------------------------------------


def test_cohere_rerank():
    t = FakeTransport(
        (200, {"results": [{"index": 1, "relevance_score": 0.8}, {"index": 0, "relevance_score": 0.2}]})
    )
    c = CohereRerankClient(api_key="ck", transport=t)
    assert c.rerank("q", ["d0", "d1"]) == [1, 0]
    url, _, body = t.calls[0]
    assert url == "https://api.cohere.com/v2/rerank"
    assert body == {"model": "rerank-v3.5", "query": "q", "documents": ["d0", "d1"]}


# ---------------------------------------------------------------------------
# UMBRELA judge
# ---------------------------------------------------------------------------


def test_umbrela_judge_scores_and_clamps():
    t = FakeTransport(
        (200, {"candidates": [{"content": {"parts": [{"text": '{"score": 3}'}]}}]}),
        (200, {"candidates": [{"content": {"parts": [{"text": '{"score": 7}'}]}}]}),
    )
    judge = UmbrelaJudge(GeminiGenerateClient(api_key="k", transport=t))
    assert judge.estimate("q", "relevant passage") == 3
    assert judge.estimate("q", "weird passage") == 3  # clamped to scale
    assert judge.estimate("q", "") == 0  # empty passage short-circuits, no call
    assert len(t.calls) == 2
    prompt = t.calls[0][2]["contents"]["parts"][0]["text"]
    assert "Query: q" in prompt and "relevant passage" in prompt


def test_umbrela_undecodable_raises():
    t = FakeTransport(
        (200, {"candidates": [{"content": {"parts": [{"text": "not json"}]}}]})
    )
    judge = UmbrelaJudge(GeminiGenerateClient(api_key="k", transport=t))
    with pytest.raises(ValueError):
        judge.estimate("q", "p")


# ---------------------------------------------------------------------------
# shared parsers
# ---------------------------------------------------------------------------


def test_parse_helpers():
    assert parse_rerank_indices({"results": []}) == []
    resp = {"data": [{"index": 0, "embedding": b64_f32([1.25])}]}
    assert parse_indexed_embeddings(resp) == [[1.25]]


def test_jina_rerank_multimodal_payloads():
    from vechord_spark.providers_http import (
        JinaRerankClient,
        jina_rerank_multimodal_payload,
    )

    p = jina_rerank_multimodal_payload("q", ["http://img/1", "http://img/2"], "image")
    assert p["documents"] == [{"image": "http://img/1"}, {"image": "http://img/2"}]
    p2 = jina_rerank_multimodal_payload("q", ["a"], "text")
    assert p2["documents"] == [{"text": "a"}]
    with pytest.raises(ValueError):
        jina_rerank_multimodal_payload("q", ["a"], "audio")
    t = FakeTransport(
        (200, {"results": [{"index": 1, "relevance_score": 0.9}, {"index": 0, "relevance_score": 0.1}]})
    )
    c = JinaRerankClient(api_key="jk", transport=t)
    assert c.rerank_multimodal("q", ["i1", "i2"], "image") == [1, 0]
    assert t.calls[0][2]["documents"][0] == {"image": "i1"}


def test_splade_sparse_client():
    from vechord_spark.providers_http import SpladeEmbeddingClient

    class T:
        def __init__(self):
            self.calls = []

        def post(self, url, headers, body):
            self.calls.append((url, json.loads(body)))
            return 200, json.dumps([{"5": 0.5, "11": 1.25}, {"2": 0.75}]).encode()

    t = T()
    c = SpladeEmbeddingClient(base_url="http://splade:8080/", transport=t)
    out = c.embed_sparse(["alpha", "beta"])
    assert out == [{5: 0.5, 11: 1.25}, {2: 0.75}]
    url, body = t.calls[0]
    assert url == "http://splade:8080/inference"
    assert body == ["alpha", "beta"]


def test_augmenter_prompt_variants():
    from vechord_spark.providers import GeminiAugmenter

    class T:
        def __init__(self):
            self.prompts = []

        def post(self, url, headers, body):
            req = json.loads(body)
            self.prompts.append(req["contents"]["parts"][0]["text"])
            return 200, json.dumps(
                {"candidates": [{"content": {"parts": [{"text": " answer "}]}}]}
            ).encode()

    t = T()
    aug = GeminiAugmenter(transport=t)
    assert aug.augment_query("DOC", ["c1", "c2"]) == ["answer", "answer"]
    assert "ask questions" in t.prompts[0] and "c1" in t.prompts[0]
    assert aug.summarize_doc("DOC") == "answer"
    assert "Summarize" in t.prompts[-1] and "<document>DOC</document>" in t.prompts[-1]


def test_gemini_inline_data_payload_and_ocr_extractor():
    from vechord_spark.providers import EXTRACT_PDF_PROMPT, GeminiExtractor
    from vechord_spark.providers_http import gemini_generate_payload

    p = gemini_generate_payload("ocr this", inline_data=b"\x01\x02", mime_type="image/jpeg")
    parts = p["contents"]["parts"]
    assert parts[0] == {"text": "ocr this"}
    assert parts[1]["inline_data"]["mime_type"] == "image/jpeg"
    assert base64.b64decode(parts[1]["inline_data"]["data"]) == b"\x01\x02"

    t = FakeTransport(
        (200, {"candidates": [{"content": {"parts": [{"text": " page text "}]}}]}),
        (200, {"candidates": [{"content": {"parts": [{"text": "img text"}]}}]}),
    )
    ex = GeminiExtractor(transport=t)
    assert ex.extract_pdf(b"%PDF") == "page text"
    assert ex.extract_image(b"\xff\xd8") == "img text"
    body = t.calls[0][2]
    assert body["contents"]["parts"][0]["text"] == EXTRACT_PDF_PROMPT
    assert body["contents"]["parts"][1]["inline_data"]["mime_type"] == "application/pdf"


# ---------------------------------------------------------------------------
# LlamaCloud Parse (D5)
# ---------------------------------------------------------------------------


class LlamaFakeTransport:
    """Upload returns a job id; the result endpoint returns 404 (still
    processing) a configurable number of times before the text result;
    the job-status endpoint reports the job as PENDING (the shape that
    must NOT fail fast)."""

    def __init__(self, pending_polls=2, text="parsed text", job_status="PENDING"):
        self.pending = pending_polls
        self.text = text
        self.job_status = job_status
        self.posts = []
        self.gets = []

    def post(self, url, headers, body):
        self.posts.append((url, headers, body))
        return 200, json.dumps({"id": "job-123", "status": "PENDING"}).encode()

    def get(self, url, headers):
        self.gets.append((url, headers))
        if not url.endswith("/result/text"):
            # job-status endpoint: the job exists
            return 200, json.dumps({"id": "job-123", "status": self.job_status}).encode()
        if self.pending > 0:
            self.pending -= 1
            return 404, b'{"detail": "pending"}'
        return 200, json.dumps({"text": self.text}).encode()


def test_llamaparse_upload_poll_extract():
    from vechord_spark.providers import LlamaParseExtractor

    t = LlamaFakeTransport(pending_polls=2, text="  scanned page  ")
    ex = LlamaParseExtractor(transport=t)
    client = ex._client()
    client.poll_interval = 0.0
    text = client.parse_bytes(b"%PDF-1.4 fake", "application/pdf", "document.pdf")
    assert text == "  scanned page  "
    # one multipart upload with auth + multipart content type
    url, headers, body = t.posts[0]
    assert url.endswith("/parsing/upload")
    assert headers["Content-Type"].startswith("multipart/form-data; boundary=")
    assert b'name="file"; filename="document.pdf"' in body
    assert b"%PDF-1.4 fake" in body
    # polled the result endpoint until success (2 pending + 1 final);
    # the first 404 additionally triggers ONE job-existence check
    result_polls = [u for u, _ in t.gets if u.endswith("/result/text")]
    status_polls = [u for u, _ in t.gets if not u.endswith("/result/text")]
    assert len(result_polls) == 3
    assert len(status_polls) == 1
    assert all("/parsing/job/job-123" in u for u, _ in t.gets)
    # extractor contract strips like the reference (extract.py:155-169)
    t2 = LlamaFakeTransport(pending_polls=0, text="  edge text  ")
    assert LlamaParseExtractor(transport=t2).extract_image(b"\xff\xd8") == "edge text"


def test_llamaparse_timeout():
    from vechord_spark.providers_http import LlamaParseClient

    t = LlamaFakeTransport(pending_polls=10**9)
    client = LlamaParseClient(api_key="k", transport=t, poll_interval=0.0, max_poll_sec=0.0)
    with pytest.raises(TimeoutError):
        client.get_text("job-123")


def test_llamaparse_fails_fast_on_permanent_errors():
    """Revoked key, unknown job, and failed job must raise immediately
    instead of polling out the 30-minute window (r4 ADVICE)."""
    from vechord_spark.providers_http import HttpCallError, LlamaParseClient

    class Auth401:
        def get(self, url, headers):
            return 401, b'{"detail": "invalid key"}'

    class UnknownJob:
        # result endpoint 404s AND the job-status endpoint 404s
        def get(self, url, headers):
            return 404, b'{"detail": "no such job"}'

    class FailedJob:
        def get(self, url, headers):
            if url.endswith("/result/text"):
                return 404, b'{"detail": "pending"}'
            return 200, json.dumps({"id": "j", "status": "ERROR"}).encode()

    for transport, frag in ((Auth401(), "401"), (UnknownJob(), "404"), (FailedJob(), "failed")):
        client = LlamaParseClient(
            api_key="k", transport=transport, poll_interval=0.0, max_poll_sec=3600.0
        )
        with pytest.raises(HttpCallError) as exc:
            client.get_text("job-123")
        assert frag in str(exc.value).lower() or frag in str(exc.value)


def test_llamaparse_upload_error_and_multipart_shape():
    from vechord_spark.providers_http import (
        HttpCallError,
        LlamaParseClient,
        encode_multipart,
    )

    body, ctype = encode_multipart("image.jpg", b"\xff\xd8jpeg", "image/jpeg")
    boundary = ctype.split("boundary=", 1)[1]
    assert body.startswith(f"--{boundary}\r\n".encode())
    assert body.endswith(f"\r\n--{boundary}--\r\n".encode())
    assert b"Content-Type: image/jpeg" in body

    class Failing:
        def post(self, url, headers, b):
            return 500, b'{"detail": "boom"}'

        def get(self, url, headers):
            return 200, b"{}"

    client = LlamaParseClient(api_key="k", transport=Failing())
    with pytest.raises(HttpCallError):
        client.parse_upload(b"x", "application/pdf", "document.pdf")
