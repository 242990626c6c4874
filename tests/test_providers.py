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
    # spaCy genuinely absent -> strict mode raises; default mode falls
    # back to the rule-based splitter
    with pytest.raises(NotImplementedError):
        SpacyChunker(require_spacy=True).segment("One. Two.")
    assert SpacyChunker().segment("Alpha one. Beta two.") == [
        "Alpha one.",
        "Beta two.",
    ]


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


# ---------------------------------------------------------------------------
# G6 fallback: rule-based NER/relations without spaCy
# ---------------------------------------------------------------------------


def test_rule_based_entities_and_relations():
    from vechord_spark.providers import RuleBasedRelationMatcher

    m = RuleBasedRelationMatcher()
    text = "Alice Johnson founded Acme Corp. The company grew. Bob visited Paris."
    ents = [e["text"] for e in m.extract(text)]
    assert ents == ["Alice Johnson", "Acme Corp", "Bob", "Paris"]

    ents2, rels = m.extract_relations(text)
    assert [e["text"] for e in ents2] == ents
    pairs = [(r["source"]["text"], r["target"]["text"]) for r in rels]
    assert ("Alice Johnson", "Acme Corp") in pairs
    assert ("Bob", "Paris") in pairs
    # sentence-initial stopword is not an entity; no cross-sentence pairs
    assert all("The" != s for s, _ in pairs)
    founded = next(r for r in rels if r["source"]["text"] == "Alice Johnson")
    assert founded["description"] == "Alice Johnson founded Acme Corp"


def test_spacy_relation_matcher_falls_back():
    from vechord_spark.providers import SpacyRelationMatcher

    m = SpacyRelationMatcher()  # spaCy absent in this container
    ents, rels = m.extract_relations("Carol met Dave in Berlin.")
    assert [e["text"] for e in ents] == ["Carol", "Dave", "Berlin"]
    assert [(r["source"]["text"], r["target"]["text"]) for r in rels] == [
        ("Carol", "Dave")
    ]
