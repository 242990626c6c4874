"""External-provider stage plumbing (D4/D5/D9/R4 shape): rate limiter,
retry, poison-row quarantine."""

import time

import pandas as pd
import pytest
from pyspark.sql import types as T

from vechord_spark.providers import (
    CohereReranker,
    GeminiEmbedder,
    RateLimiter,
    external_stage,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out", T.StringType()),
        T.StructField("_error", T.StringType()),
    ]
)


def test_rate_limiter_spaces_calls():
    rl = RateLimiter(rps=50.0)
    t0 = time.monotonic()
    for _ in range(4):
        rl.acquire()
    assert time.monotonic() - t0 >= 3 * (1.0 / 50.0) - 1e-3


def test_external_stage_success(docs):
    def call(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": pdf["doc_id"], "out": pdf["text"].str[:3]})

    res = external_stage(call, SCHEMA)(docs.limit(10).select("doc_id", "text")).toPandas()
    assert len(res) == 10
    assert res["_error"].isna().all()
    assert (res["out"].str.len() <= 3).all()


def test_external_stage_quarantines_poison_batches(docs):
    def bad(pdf: pd.DataFrame) -> pd.DataFrame:
        raise RuntimeError("backend down")

    res = external_stage(bad, SCHEMA, max_retries=2)(
        docs.limit(5).select("doc_id", "text")
    ).toPandas()
    # rows preserved (same count), payload nulled, error recorded —
    # a poison batch must not kill the job (vs reference raising,
    # vechord/provider.py:78-82)
    assert len(res) == 5
    assert (res["_error"] == "backend down").all()
    assert res["out"].isna().all()


def test_providers_require_api_keys(monkeypatch):
    from vechord_spark.providers import SpacyChunker
    from vechord_spark.providers_http import ApiKeyMissing

    monkeypatch.delenv("GEMINI_API_KEY", raising=False)
    monkeypatch.delenv("COHERE_API_KEY", raising=False)
    with pytest.raises(ApiKeyMissing):
        GeminiEmbedder().embed_query("x")
    with pytest.raises(ApiKeyMissing):
        CohereReranker().rerank("q", ["a"])
    # spaCy genuinely absent -> NotImplementedError, not a key error
    with pytest.raises(NotImplementedError):
        SpacyChunker().segment("One. Two.")


from vechord_spark.providers_http import EchoTransport  # noqa: E402


def test_provider_classes_with_transport():
    from vechord_spark.providers import (
        GeminiAugmenter,
        GeminiChunker,
        GeminiNER,
        JinaReranker,
    )

    t = EchoTransport()
    emb = GeminiEmbedder(dim=2, transport=t)
    assert emb.embed_documents(["abc"]) == [[3.0, 1.0]]
    assert emb.embed_query("abcd") == [4.0, 1.0]
    assert JinaReranker(transport=t).rerank("q", ["d0", "d1", "d2"]) == [2, 1, 0]
    aug = GeminiAugmenter(transport=t)
    assert aug.augment_chunk("doc", "chunk") == '{"score": 0}'
    # chunker decodes the structured list (EchoTransport returns a dict
    # -> must raise the clear decode error, proving validation runs)
    with pytest.raises(ValueError):
        GeminiChunker(transport=t).segment("text")
    with pytest.raises(ValueError):
        GeminiNER(transport=t).extract("some doc")


def test_embedding_stage_spark(spark, docs, monkeypatch):
    monkeypatch.setenv("JINA_API_KEY", "test-key")
    from vechord_spark.providers_http import JinaEmbeddingClient, embedding_stage

    def make_client():
        import os

        os.environ.setdefault("JINA_API_KEY", "test-key")
        return JinaEmbeddingClient(dim=2, transport=EchoTransport())

    out = (
        embedding_stage(make_client, text_col="text", out_col="vec")(
            docs.limit(6).select("doc_id", "text")
        )
        .toPandas()
        .sort_values("doc_id")
    )
    assert len(out) == 6
    assert out["_error"].isna().all()
    assert all(len(v) == 2 and v[1] == 2.0 for v in out["vec"])


def test_umbrela_stage_spark(spark, monkeypatch):
    monkeypatch.setenv("GEMINI_API_KEY", "test-key")
    from vechord_spark.providers_http import (
        GeminiGenerateClient,
        UmbrelaJudge,
        umbrela_stage,
    )

    pairs = spark.createDataFrame(
        [(1, "q1", "a relevant passage"), (2, "q2", "noise"), (3, "q3", "")],
        "query_id long, query_text string, doc_text string",
    )

    def make_judge():
        import os

        os.environ.setdefault("GEMINI_API_KEY", "test-key")
        return UmbrelaJudge(GeminiGenerateClient(transport=EchoTransport()))

    out = (
        umbrela_stage(make_judge, rps=None)(pairs).toPandas().sort_values("query_id")
    )
    assert out["score"].tolist() == [3, 0, 0]
    assert out["_error"].isna().all()
