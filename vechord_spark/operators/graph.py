"""Graph (entity / relation) operators as DataFrame programs.

The reference's "graph" is two ordinary tables (Entity, Relation —
vechord/pipeline.py:95-109) maintained by merge-on-text upserts and
traversed with sequential point lookups. Spark renditions:

- G1 entity merge (vechord/pipeline.py:345-373): group extracted
  entities by ``text``; union chunk id lists; newline-concat
  descriptions -> one groupBy.
- G2 relation merge (vechord/pipeline.py:375-392): key = sorted
  (source, target) pair -> same pattern with ``array_sort``.
- G3 graph search (vechord/pipeline.py:444-487): relation k-NN ->
  endpoint entities -> entity k-NN -> chunk expansion. Point lookups
  become semi-joins; the 2-hop traversal is 2 joins.

Determinism: all collected lists are sorted so merge output is
hash-stable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def merge_entities(entities: DataFrame) -> DataFrame:
    """Merge duplicate entity mentions by exact ``text``.

    Input columns: text, label, description, chunk_uuids (array).
    Output: one row per text with unioned chunk ids (sorted, distinct)
    and descriptions concatenated with "\\n" in deterministic
    (description-sorted) order. Reference: graph_insert
    vechord/pipeline.py:345-373.
    """
    return entities.groupBy("text").agg(
        F.min("label").alias("label"),
        F.concat_ws("\n", F.array_sort(F.collect_list("description"))).alias(
            "description"
        ),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("chunk_uuids")))
        ).alias("chunk_uuids"),
    )


def merge_relations(relations: DataFrame) -> DataFrame:
    """Merge relations keyed by the *unordered* endpoint pair.

    Input columns: source, target, description. The key is the sorted
    (source, target) pair (reference vechord/pipeline.py:375-392).
    """
    keyed = relations.withColumn(
        "__pair", F.array_sort(F.array(F.col("source"), F.col("target")))
    )
    return (
        keyed.groupBy("__pair")
        .agg(
            F.concat_ws("\n", F.array_sort(F.collect_list("description"))).alias(
                "description"
            ),
        )
        .select(
            F.col("__pair")[0].alias("source"),
            F.col("__pair")[1].alias("target"),
            "description",
        )
    )


def graph_search(
    relations: DataFrame,
    entities: DataFrame,
    chunks: DataFrame,
    query_vec: Sequence[float],
    topk_relations: int = 10,
    topk_entities: int = 10,
    topk: int = 10,
    chunk_id: str = "uid",
    rel_tie: str = "source",
    ent_tie: str = "uid",
) -> DataFrame:
    """2-hop graph expansion search (reference graph_search,
    vechord/pipeline.py:444-487):

    1. k-NN over relation embeddings (``vec``).
    2. Collect endpoint entity ids -> semi-join entities.
    3. k-NN over those entities' embeddings.
    4. Union the entities' chunk_uuids -> explode -> dedup -> fetch
       chunks, truncated to ``topk`` by first-seen order.

    Entity table columns: uid, chunk_uuids, vec. Relation: source,
    target, vec. Chunk: ``chunk_id`` + payload.
    """
    from vechord_spark.operators.knn import knn

    top_rel = knn(
        relations,
        "vec",
        list(query_vec),
        k=topk_relations,
        distance="cos",
        select=["source", "target"],
        tie_break=rel_tie,
    )
    endpoint_ids = (
        top_rel.select(F.explode(F.array("source", "target")).alias("uid")).distinct()
    )
    candidate_entities = entities.join(F.broadcast(endpoint_ids), "uid", "left_semi")
    top_ent = knn(
        candidate_entities,
        "vec",
        list(query_vec),
        k=topk_entities,
        distance="cos",
        select=["uid", "chunk_uuids"],
        tie_break=ent_tie,
    )
    chunk_ids = (
        top_ent.select(
            F.posexplode("chunk_uuids").alias("seq", "cid"),
            F.col("distance"),
        )
        .groupBy("cid")
        .agg(F.min(F.struct("distance", "seq")).alias("first_seen"))
        .orderBy("first_seen")
        .limit(topk)
        .select(F.col("cid").alias(chunk_id))
    )
    return chunks.join(F.broadcast(chunk_ids), chunk_id, "left_semi")
