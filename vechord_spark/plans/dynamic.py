"""Config-driven pipeline (D15): build ingest + search jobs from a
JSON-able step list.

Reference: ``DynamicPipeline`` (vechord/pipeline.py:163-487) resolves
``ResourceRequest{kind, provider, args}`` steps through a
``PROVIDER_MAP`` registry (vechord/pipeline.py:112-134), validates the
combination (``__post_init__`` vechord/pipeline.py:174-184), then
dispatches ``run_index`` (OCR -> chunk -> embed -> insert,
vechord/pipeline.py:249-343) or ``run_search`` (vector ∪ keyword ->
dedup -> rerank, vechord/pipeline.py:394-442).

Spark rendition: the same config resolves to DataFrame stage builders;
``run_index`` is one staged-write pipeline (plans/pipeline.py gives the
all-or-nothing publish), ``run_search`` is a composed top-k DataFrame.
The chunk table is declared *at run time* with the provider's embedding
dimension — the reference does the same with msgspec.defstruct
(vechord/pipeline.py:259-266).

Only local providers are runnable in this environment (hash embedder,
regex chunker, simple extractor); external ones resolve to the clearly
marked stubs in providers.py and fail at call time, not config time —
matching the reference, whose provider objects are constructed eagerly
but only hit the network per call.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

from vechord_spark.errors import SchemaError
from vechord_spark.functions.embed import SPARSE_DIM, HashEmbedder
from vechord_spark.operators.chunk import DEFAULT_OVERLAP, DEFAULT_SIZE
from vechord_spark.registry import VechordRegistry
from vechord_spark.spec import Column, Keyword, TableSpec, Vector


@dataclass(frozen=True)
class ResourceRequest:
    """One pipeline step: {kind, provider, args} (reference
    vechord/model/web.py ResourceRequest)."""

    kind: str
    provider: str
    args: Mapping[str, Any] = field(default_factory=dict)


def _gemini_embedder(**args):
    from vechord_spark.providers import GeminiEmbedder

    return GeminiEmbedder(**args)


def _cohere_reranker(**args):
    from vechord_spark.providers import CohereReranker

    return CohereReranker(**args)


def _mmr_reranker(**args):
    from vechord_spark.operators.mmr import MmrReranker

    return MmrReranker(lam=float(args.get("lam", 0.5)))


# kind -> provider name -> factory (reference PROVIDER_MAP,
# vechord/pipeline.py:112-134)
PROVIDER_MAP: dict[str, dict[str, Any]] = {
    "chunker": {
        "regex": lambda **args: dict(
            size=args.get("size", DEFAULT_SIZE),
            overlap=args.get("overlap", DEFAULT_OVERLAP),
        ),
    },
    "embedder": {
        "hash": lambda **args: HashEmbedder(dim=args.get("dim", 64)),
        "gemini": _gemini_embedder,
    },
    "keyword": {
        "bm25": lambda **args: dict(args),
    },
    # third retrieval leg: Splade-shaped sparse lexical vectors over a
    # persisted inverted-postings index (registry.build_sparse_index) —
    # the reference PRODUCES SparseEmbedding values but cannot store or
    # search them (vechord/embedding.py:413-441, SURVEY §1.2); here the
    # config-driven pipeline composes dense + BM25 + sparse tri-hybrid
    # RRF the way the suite's hybrid_rrf_tri query does
    "sparse": {
        "hash": lambda **args: dict(dim=int(args.get("dim", SPARSE_DIM))),
    },
    "reranker": {
        "cohere": _cohere_reranker,
        "mmr": _mmr_reranker,
    },
}

_REQUIRED = ("chunker", "embedder")


class DynamicPipeline:
    """Validated, config-built ingest/search pipeline over a registry."""

    def __init__(
        self,
        registry: VechordRegistry,
        chunker: Mapping[str, Any],
        embedder,
        keyword: Mapping[str, Any] | None = None,
        reranker=None,
        sparse: Mapping[str, Any] | None = None,
    ) -> None:
        self.registry = registry
        self.chunker = chunker
        self.embedder = embedder
        self.keyword = keyword
        self.reranker = reranker
        self.sparse = sparse
        self._declare_tables()

    # -- config resolution -------------------------------------------------
    @classmethod
    def from_steps(
        cls, registry: VechordRegistry, steps: Sequence[Mapping[str, Any]]
    ) -> "DynamicPipeline":
        """Resolve a JSON step list through PROVIDER_MAP with the
        reference's validation behavior (unknown kind/provider and
        missing required steps are config-time errors,
        vechord/pipeline.py:174-206)."""
        resolved: dict[str, Any] = {}
        for raw in steps:
            req = ResourceRequest(
                kind=raw["kind"], provider=raw["provider"], args=raw.get("args", {})
            )
            kinds = PROVIDER_MAP.get(req.kind)
            if kinds is None:
                raise SchemaError(f"unknown step kind {req.kind!r}")
            factory = kinds.get(req.provider)
            if factory is None:
                raise SchemaError(
                    f"unknown provider {req.provider!r} for kind {req.kind!r}"
                )
            if req.kind in resolved:
                raise SchemaError(f"duplicate step kind {req.kind!r}")
            resolved[req.kind] = factory(**req.args)
        missing = [k for k in _REQUIRED if k not in resolved]
        if missing:
            raise SchemaError(f"missing required steps: {missing}")
        return cls(
            registry,
            chunker=resolved["chunker"],
            embedder=resolved["embedder"],
            keyword=resolved.get("keyword"),
            reranker=resolved.get("reranker"),
            sparse=resolved.get("sparse"),
        )

    # -- schema ------------------------------------------------------------
    def _declare_tables(self) -> None:
        """Declare document + chunk tables; the chunk table's vector
        dimension comes from the embedder (runtime schema, reference
        vechord/pipeline.py:259-266)."""
        cols = [
            Column("uid", "string", primary_key=True),
            Column("doc_id", "long", foreign_key=("document", "doc_id")),
            Column("seq_id", "int"),
            Column("text", "string"),
            Column("vec", Vector(self.embedder.dim)),
        ]
        if self.keyword is not None:
            cols.append(Column("kw", Keyword()))
        if self.sparse is not None:
            from vechord_spark.spec import SparseVector

            cols.append(Column("sv", SparseVector(self.sparse["dim"])))
        self.registry.register(
            TableSpec("document", [Column("doc_id", "long", primary_key=True),
                                  Column("text", "string")])
        )
        self.registry.register(TableSpec("chunk", cols))

    # -- jobs --------------------------------------------------------------
    def run_index(self, docs: DataFrame, doc_id: str = "doc_id",
                  text_col: str = "text") -> dict[str, int]:
        """Ingest: docs -> chunk -> embed -> staged write -> atomic
        publish of BOTH tables (all-or-nothing, reference one-txn
        semantics vechord/pipeline.py:331-342)."""
        from vechord_spark.operators.chunk import chunk_documents
        from vechord_spark.plans.pipeline import PipelineRun

        run = PipelineRun(self.registry)
        try:
            staged_docs = run.stage(
                "document",
                docs.select(F.col(doc_id).alias("doc_id"),
                            F.col(text_col).alias("text")),
            )
            chunks = chunk_documents(
                staged_docs, "doc_id", "text",
                size=self.chunker["size"], overlap=self.chunker["overlap"],
            )
            embedded = chunks.select(
                F.concat_ws("-", F.col("doc_id"), F.col("seq_id")).alias("uid"),
                "doc_id",
                "seq_id",
                F.col("chunk_text").alias("text"),
                self.embedder.embed_documents(F.col("chunk_text")).alias("vec"),
            )
            if self.keyword is not None:
                embedded = embedded.withColumn("kw", F.col("text"))
            if self.sparse is not None:
                from vechord_spark.functions.embed import sparse_embedding

                embedded = embedded.withColumn(
                    "sv", sparse_embedding(F.col("text"), self.sparse["dim"])
                )
            staged_chunks = run.stage("chunk", embedded)
            counts = {"document": staged_docs.count(),
                      "chunk": staged_chunks.count()}
        except Exception:
            run.abort()
            raise
        run.commit()
        if self.sparse is not None:
            # sparse retrieval has no unindexed fallback on the stored
            # struct (dense brute-forces the table, BM25 one-shots the
            # text; the sparse leg queries postings): keep the persisted
            # index current at ingest — CREATE INDEX semantics, extended
            # O(appended) on every later batch
            try:
                self.registry.extend_sparse_index("chunk")
            except SchemaError:
                self.registry.build_sparse_index("chunk")
        return counts

    def run_search(self, query: str, topk: int = 10) -> DataFrame:
        """Search: embed query -> vector k-NN (∪ BM25 when a keyword
        step is configured, ∪ sparse postings when a sparse step is) ->
        RRF fuse -> optional rerank -> top-k (reference run_search,
        vechord/pipeline.py:394-442; the reference composes two legs
        and applies the configured reranker to the fused list — the
        sparse third leg is the tri-hybrid extension the suite's
        hybrid_rrf_tri query pins, here driveable from a JSON step
        list)."""
        from vechord_spark.operators.topk import ranked_topk

        vec = self.registry.search_by_vector(
            "chunk", self.embedder.embed_query(query), topk=topk
        )
        if self.keyword is None and self.sparse is None:
            if self.reranker is None:
                return vec
            ranked_vec = ranked_topk(
                vec, [F.col("distance").asc(), F.col("uid").asc()], topk
            ).select("uid", "rank")
            return self._apply_reranker(query, ranked_vec)
        from vechord_spark.operators.fusion import rrf_topk

        legs = [
            ranked_topk(
                vec, [F.col("distance").asc(), F.col("uid").asc()], topk
            ).select("uid", "rank")
        ]
        if self.keyword is not None:
            kw = self.registry.search_by_keyword("chunk", query, topk=topk)
            legs.append(
                kw.select("uid", "rank")
                if "rank" in kw.columns
                else ranked_topk(
                    kw, [F.col("score").desc(), F.col("uid").asc()], topk
                ).select("uid", "rank")
            )
        if self.sparse is not None:
            from vechord_spark.functions.embed import sparse_query_vector

            sv = self.registry.search_by_sparse(
                "chunk",
                sparse_query_vector(query, self.sparse["dim"]),
                topk=topk,
            )
            legs.append(
                ranked_topk(
                    sv, [F.col("score").desc(), F.col("uid").asc()], topk
                ).select("uid", "rank")
            )
        fused = rrf_topk(legs, "uid", topk=topk)
        if self.reranker is None:
            return fused
        return self._apply_reranker(query, fused)

    def _apply_reranker(self, query: str, ranked: DataFrame) -> DataFrame:
        """Apply the configured reranker to a ranked candidate frame
        (columns incl. ``uid`` + ``rank``): a BOUNDED driver read of
        the top-k candidates' payloads (texts + stored vectors, k rows
        — the same per-request shape as the reference, whose reranker
        call is a driver-side HTTP round over the top-k list), the
        provider picks the order, and the new ranking rides back as a
        broadcast order map (operators/fusion.reorder_by semantics,
        with the rank column rebuilt). Dispatch: in-engine rerankers
        expose ``rerank_with_vectors(ids, rels, vecs)``; HTTP
        rerankers expose ``rerank(query, texts) -> index order``."""
        chunk = self.registry.load("chunk")
        rows = (
            ranked.join(chunk.select("uid", "text", "vec"), "uid")
            .orderBy("rank")
            .collect()
        )
        if not rows:
            return ranked
        ids = [r["uid"] for r in rows]
        if hasattr(self.reranker, "rerank_with_vectors"):
            # RRF-shaped relevance from the incoming rank (k=60, the
            # fusion constant) so rel and diversity share a scale
            rels = [1.0 / (60.0 + r["rank"]) for r in rows]
            order = self.reranker.rerank_with_vectors(
                ids, rels, [list(r["vec"]) for r in rows]
            )
        else:
            idx = self.reranker.rerank(query, [r["text"] for r in rows])
            order = [ids[i] for i in idx]
        spark = ranked.sparkSession
        # uid type follows the candidate frame, not a hardcoded string
        # (a bigint uid would otherwise coerce through the join)
        uid_type = ranked.schema["uid"].dataType.simpleString()
        order_df = spark.createDataFrame(
            [(u, i + 1) for i, u in enumerate(order)],
            f"uid {uid_type}, rank int",
        )
        return (
            ranked.drop("rank")
            .join(F.broadcast(order_df), "uid", "inner")
            .orderBy("rank")
        )
