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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    checkpoint_every: int = 5,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list, in exact fixed-point
    arithmetic.

    The reference's graph layer stops at 2-hop expansion
    (vechord/pipeline.py:444-487); PageRank is the natural next step for
    ranking entities in the extracted graph (GraphRAG-style importance
    weighting) and is the canonical iterative-join workload, so it gets
    the same oracle-checkable treatment as the rest of the suite.

    Numerics: rank mass is carried as BIGINT "units" (``scale`` units =
    total mass 1.0) and every step uses floor division, so the result is
    bit-identical across engines and partitionings — no floating-point
    summation-order sensitivity. Per node and iteration::

        contrib(u -> v) = units(u) div outdeg(u)
        units'(v) = base + (sum_v contrib * damping_num) div damping_den
        base      = (scale * (den - num)) div (den * N)

    Dangling nodes (no out-edges) leak their mass — the standard
    simplified formulation; total mass shrinks slightly per round, which
    is fine for ranking.

    Scale: per iteration, ONE join (ranks ⋈ edges on src) and ONE
    aggregation. The edge table is repartitioned by src and persisted
    once, so the join's edge side never re-shuffles — only the (small)
    rank state moves each round — and the dangling-node fill is FUSED
    into the aggregation: per-node base rows union with the contribs
    and a single groupBy computes ``max(base) + damp(sum(contrib))``,
    instead of a separate left join back to the node table. Lineage is
    truncated with localCheckpoint every ``checkpoint_every`` rounds so
    50-iteration runs don't compound plan depth.

    With ``seeds`` (a one-column DataFrame of node ids), teleport mass
    restricts to the seed set — PERSONALIZED PageRank, the GraphRAG
    entity-importance shape: ranks measure proximity to the query's
    seed entities instead of global centrality.

    Returns (node, units BIGINT) — divide by ``scale`` for the float
    rank.
    """
    # the caller's edge subtree (often a tokenize+distinct scan) feeds
    # four consumers — both node-set branches, the out-degree
    # aggregate, and the per-round join table — so persist ONE narrow
    # (node, dst_node) projection and derive everything from it; the
    # node set itself is consumed by the count action, the base rows
    # and the initial rank state (plus the seed join when personalized),
    # so it is persisted too. Both are released before returning.
    ep = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("dst_node"))
        .persist()
    )
    nodes = (
        ep.select("node")
        .union(ep.select(F.col("dst_node").alias("node")))
        .distinct()
        .persist()
    )
    outdeg = ep.groupBy("node").agg(F.count(F.lit(1)).alias("outdeg"))
    # repartition by the join key BEFORE persisting: the cached edge
    # blocks then already satisfy the per-round join's distribution
    # requirement, so only the (much smaller) rank state shuffles each
    # iteration
    edges_deg = (
        ep.join(outdeg, "node")
        .repartition(F.col("node"))
        .persist()
    )
    if seeds is None:
        n = nodes.count()
        base_val = (scale * (damping_den - damping_num)) // (damping_den * n)
        base_rows = nodes.select(
            "node",
            F.lit(0).cast("bigint").alias("contrib"),
            F.lit(base_val).cast("bigint").alias("base"),
        )
        ranks = nodes.withColumn("units", F.lit(scale // n).cast("bigint"))
    else:
        # personalized: teleport mass restricts to the seed set (the
        # GraphRAG shape — importance relative to the query's entities).
        # Non-seed nodes start at 0 and receive no base mass; otherwise
        # identical fixed-point arithmetic.
        seed_nodes = (
            seeds.select(F.col(seeds.columns[0]).alias("node"))
            .distinct()
            .join(nodes, "node", "left_semi")
            .persist()
        )
        n_seed = seed_nodes.count()
        if n_seed == 0:
            raise ValueError("personalized pagerank needs seeds present in the graph")
        seed_base = (scale * (damping_den - damping_num)) // (damping_den * n_seed)
        flagged = nodes.join(
            seed_nodes.withColumn("__seed", F.lit(1)), "node", "left"
        )
        base_rows = flagged.select(
            "node",
            F.lit(0).cast("bigint").alias("contrib"),
            F.when(F.col("__seed") == 1, F.lit(seed_base))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("base"),
        )
        ranks = flagged.select(
            "node",
            F.when(F.col("__seed") == 1, F.lit(scale // n_seed))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("units"),
        )
    base_rows = base_rows.persist()
    for i in range(iterations):
        contrib = edges_deg.join(ranks, "node").select(
            F.col("dst_node").alias("node"),
            F.expr("units div outdeg").alias("contrib"),
            F.lit(0).cast("bigint").alias("base"),
        )
        # dangling/zero-inflow fill fused into the aggregation: every
        # node has exactly one base row (contrib=0), so one groupBy
        # replaces the agg + left-join-back-to-nodes pair
        ranks = (
            contrib.unionByName(base_rows)
            .groupBy("node")
            .agg(
                (
                    F.max("base")
                    + F.expr(
                        f"(sum(contrib) * {damping_num}) div {damping_den}"
                    )
                ).cast("bigint").alias("units")
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    # materialize the final ranks, then release the per-call caches —
    # a long-lived session calling pagerank repeatedly must not leak
    # executor storage blocks (the checkpoint blocks are tied to the
    # returned frame's lineage and go away with it)
    from vechord_spark.plans import plandump

    plandump.note("pagerank_final", ranks)
    ranks = ranks.localCheckpoint(eager=True)
    edges_deg.unpersist()
    base_rows.unpersist()
    nodes.unpersist()
    ep.unpersist()
    if seeds is not None:
        seed_nodes.unpersist()
    return ranks


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count over the undirected graph, via degree
    orientation — the join-based formulation that bounds work at scale.

    Naive triangle counting (three-way self-join on the raw edge list)
    enumerates every wedge at every node: a single hub of degree d
    contributes d^2 wedge rows. Orienting each edge from its lower
    (degree, id) endpoint to the higher makes every out-degree
    O(sqrt(m)) in the worst case, so the wedge join materializes at
    most O(m^1.5) rows total and each triangle is counted exactly once
    (at its lowest-ordered vertex). Two shuffled equi-joins; no
    nested loop.

    Returns one row: (n_nodes, n_edges, n_triangles) — BIGINTs, so the
    result is hash-exact against a SQL oracle running the same
    orientation.
    """
    # und is consumed four times (degree table, orientation join, edge
    # count, closing-edge probe) and deg three times (both orientation
    # sides, node count); without materialization each consumer re-runs
    # the distinct / union-aggregate subtree — persist both, release
    # before returning (same storage-size class as the oriented cache
    # below).
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    with_deg = und.join(da, "a").join(db, "b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).persist()
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .where(F.col("e1.v") < F.col("e2.v"))
        .select(F.col("e1.v").alias("x"), F.col("e2.v").alias("y"))
    )
    # the closing-edge set IS und: orientation only permutes (a, b)
    # within each row (und has a < b, so least/greatest recovers the
    # original pair) and und is already distinct — reusing it drops a
    # full distinct exchange + aggregate pass over the edge set
    closing = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    nn = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    ne = und.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    # three 1-row aggregates -> one result row; materialize it eagerly
    # (it is a single row) so the oriented-edge cache can be released
    # before returning — no leaked storage blocks across calls
    from vechord_spark.plans import plandump

    out = plandump.note(
        "triangles_final", nn.crossJoin(ne).crossJoin(tri)
    ).localCheckpoint(eager=True)
    oriented.unpersist()
    und.unpersist()
    deg.unpersist()
    return out
