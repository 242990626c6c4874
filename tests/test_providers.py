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


def test_stubs_raise_not_implemented():
    with pytest.raises(NotImplementedError):
        GeminiEmbedder().embed_query("x")
    with pytest.raises(NotImplementedError):
        CohereReranker().rerank("q", ["a"])
