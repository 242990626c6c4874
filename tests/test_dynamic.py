"""Config-driven DynamicPipeline (D15): validation + ingest + search."""

import pytest

from vechord_spark.errors import SchemaError
from vechord_spark.plans.dynamic import DynamicPipeline
from vechord_spark.registry import VechordRegistry

STEPS = [
    {"kind": "chunker", "provider": "regex", "args": {"size": 64, "overlap": 8}},
    {"kind": "embedder", "provider": "hash", "args": {"dim": 16}},
    {"kind": "keyword", "provider": "bm25"},
]


@pytest.fixture()
def registry(spark, tmp_path):
    return VechordRegistry("dyn", str(tmp_path), spark)


def test_from_steps_validation(registry):
    with pytest.raises(SchemaError, match="unknown step kind"):
        DynamicPipeline.from_steps(registry, [{"kind": "nope", "provider": "x"}])
    with pytest.raises(SchemaError, match="unknown provider"):
        DynamicPipeline.from_steps(
            registry, [{"kind": "embedder", "provider": "nope"}]
        )
    with pytest.raises(SchemaError, match="missing required steps"):
        DynamicPipeline.from_steps(
            registry, [{"kind": "embedder", "provider": "hash"}]
        )
    with pytest.raises(SchemaError, match="duplicate step kind"):
        DynamicPipeline.from_steps(
            registry,
            [
                {"kind": "embedder", "provider": "hash"},
                {"kind": "embedder", "provider": "hash"},
            ],
        )


def test_index_then_search(registry, docs):
    pipe = DynamicPipeline.from_steps(registry, STEPS)
    counts = pipe.run_index(docs.limit(20))
    assert counts["document"] == 20
    assert counts["chunk"] >= 20  # size=64 splits every testdata doc

    hits = pipe.run_search("data spark query", topk=5).collect()
    assert len(hits) == 5
    assert [r.rank for r in hits] == [1, 2, 3, 4, 5]
    # deterministic across runs (hash embedder + fixed tokenizer)
    again = pipe.run_search("data spark query", topk=5).collect()
    assert [r.uid for r in again] == [r.uid for r in hits]


def test_vector_only_search(registry, docs):
    pipe = DynamicPipeline.from_steps(
        registry,
        [
            {"kind": "chunker", "provider": "regex", "args": {"size": 128}},
            {"kind": "embedder", "provider": "hash", "args": {"dim": 8}},
        ],
    )
    pipe.run_index(docs.limit(10))
    hits = pipe.run_search("anything", topk=3).collect()
    assert len(hits) == 3
    assert all(hasattr(r, "distance") for r in hits)


def test_mmr_reranked_search(registry, docs):
    """reranker: mmr — the fused top-k is reordered by the in-engine
    MMR over the candidates' stored embeddings; the result is a
    permutation of the unreranked hits and the reranked frame carries
    a clean 1..k rank."""
    steps = STEPS + [
        {"kind": "reranker", "provider": "mmr", "args": {"lam": 0.5}}
    ]
    pipe = DynamicPipeline.from_steps(registry, steps)
    pipe.run_index(docs.limit(20))

    plain = DynamicPipeline.from_steps(registry, STEPS)
    base = plain.run_search("data spark query", topk=6).collect()
    got = pipe.run_search("data spark query", topk=6).collect()
    assert len(got) == 6
    assert [r.rank for r in got] == [1, 2, 3, 4, 5, 6]
    assert {r.uid for r in got} == {r.uid for r in base}  # permutation
    # pick 0 must be the max-relevance candidate (rank-1 of the fusion)
    assert got[0].uid == base[0].uid
    # deterministic
    again = pipe.run_search("data spark query", topk=6).collect()
    assert [r.uid for r in again] == [r.uid for r in got]


def test_mmr_rerank_vector_only_path(registry, docs):
    steps = [
        {"kind": "chunker", "provider": "regex", "args": {"size": 128}},
        {"kind": "embedder", "provider": "hash", "args": {"dim": 8}},
        {"kind": "reranker", "provider": "mmr", "args": {}},
    ]
    pipe = DynamicPipeline.from_steps(registry, steps)
    pipe.run_index(docs.limit(10))
    hits = pipe.run_search("anything", topk=4).collect()
    assert len(hits) == 4
    assert [r.rank for r in hits] == [1, 2, 3, 4]


def test_mmr_reranker_lam_validation(registry):
    import pytest as _pytest

    from vechord_spark.errors import SchemaError
    from vechord_spark.operators.mmr import MmrReranker

    with _pytest.raises(ValueError):
        MmrReranker(lam=1.5)


def test_tri_hybrid_search_from_steps(registry, docs):
    """Round-12 verdict ask #8: dense + BM25 + sparse tri-hybrid RRF
    driveable from a JSON step list — the config surface for what the
    suite's hybrid_rrf_tri query pins. The sparse leg queries the
    persisted postings index run_index keeps current at ingest."""
    from pyspark.sql import functions as F

    from vechord_spark.functions.embed import sparse_query_vector
    from vechord_spark.operators.fusion import rrf_topk
    from vechord_spark.operators.topk import ranked_topk

    steps = STEPS + [
        {"kind": "sparse", "provider": "hash", "args": {"dim": 256}}
    ]
    pipe = DynamicPipeline.from_steps(registry, steps)
    counts = pipe.run_index(docs.limit(20))
    assert counts["document"] == 20
    st = registry.index_stats("chunk")
    assert "sparse" in st and st["sparse"]["ledger_fresh"]

    q = "data spark query"
    hits = pipe.run_search(q, topk=5).collect()
    assert [r.rank for r in hits] == [1, 2, 3, 4, 5]

    # the fused list equals a hand-built tri-RRF over the registry's
    # three retrieval surfaces — proves all three legs participate
    vec = registry.search_by_vector("chunk", pipe.embedder.embed_query(q), topk=5)
    kw = registry.search_by_keyword("chunk", q, topk=5)
    sv = registry.search_by_sparse("chunk", sparse_query_vector(q, 256), topk=5)
    legs = [
        ranked_topk(vec, [F.col("distance").asc(), F.col("uid").asc()], 5)
        .select("uid", "rank"),
        kw.select("uid", "rank")
        if "rank" in kw.columns
        else ranked_topk(kw, [F.col("score").desc(), F.col("uid").asc()], 5)
        .select("uid", "rank"),
        ranked_topk(sv, [F.col("score").desc(), F.col("uid").asc()], 5)
        .select("uid", "rank"),
    ]
    manual = rrf_topk(legs, "uid", topk=5).collect()
    assert [(r.uid, r.rank) for r in hits] == [(r.uid, r.rank) for r in manual]
    # deterministic across runs
    again = pipe.run_search(q, topk=5).collect()
    assert [r.uid for r in again] == [r.uid for r in hits]
