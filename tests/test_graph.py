"""Graph merge + 2-hop search (reference vechord/pipeline.py:345-487)."""

import pytest
from pyspark.sql import functions as F

from vechord_spark.operators.graph import graph_search, merge_entities, merge_relations


def test_merge_entities_unions_chunks_and_descriptions(spark):
    ents = spark.createDataFrame(
        [
            ("apple", "org", "a fruit company", ["c1", "c2"]),
            ("apple", "org", "makes phones", ["c2", "c3"]),
            ("orange", "category", "a color", ["c9"]),
        ],
        "text string, label string, description string, chunk_uuids array<string>",
    )
    got = {r.text: r for r in merge_entities(ents).collect()}
    assert got["apple"].chunk_uuids == ["c1", "c2", "c3"]
    assert got["apple"].description == "a fruit company\nmakes phones"
    assert got["orange"].chunk_uuids == ["c9"]


def test_merge_relations_unordered_pair_key(spark):
    rels = spark.createDataFrame(
        [
            ("a", "b", "a owns b"),
            ("b", "a", "b owned by a"),
            ("a", "c", "a near c"),
        ],
        "source string, target string, description string",
    )
    got = merge_relations(rels).collect()
    pairs = {(r.source, r.target): r.description for r in got}
    assert pairs[("a", "b")] == "a owns b\nb owned by a"
    assert ("b", "a") not in pairs
    assert pairs[("a", "c")] == "a near c"


def test_graph_search_two_hop(spark):
    dim = 4
    ents = spark.createDataFrame(
        [
            ("e1", ["c1", "c2"], [1.0, 0.0, 0.0, 0.0]),
            ("e2", ["c3"], [0.9, 0.1, 0.0, 0.0]),
            ("e3", ["c4"], [0.0, 0.0, 1.0, 0.0]),
        ],
        "uid string, chunk_uuids array<string>, vec array<float>",
    )
    rels = spark.createDataFrame(
        [
            ("e1", "e2", [1.0, 0.0, 0.0, 0.0]),
            ("e3", "e3", [0.0, 0.0, 1.0, 0.0]),
        ],
        "source string, target string, vec array<float>",
    )
    chunks = spark.createDataFrame(
        [("c1", "t1"), ("c2", "t2"), ("c3", "t3"), ("c4", "t4")],
        "uid string, text string",
    )
    out = graph_search(
        rels, ents, chunks, [1.0, 0.0, 0.0, 0.0],
        topk_relations=1, topk_entities=2, topk=10,
    )
    got = sorted(r.uid for r in out.collect())
    # top relation (e1,e2) -> entities e1,e2 -> chunks c1,c2,c3; e3 excluded
    assert got == ["c1", "c2", "c3"]


def test_pagerank_star_graph(spark):
    """Hub of a star receives all mass: spokes -> hub edges."""
    from vechord_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")],
        "src string, dst string",
    )
    got = {r.node: r.units for r in pagerank(edges, iterations=20).collect()}
    # (hub <-> s1 oscillation has converged by 20 rounds; spokes keep
    # only the teleport base)
    assert got["hub"] > got["s1"] > got["s2"] == got["s3"]


def test_pagerank_matches_reference_float_impl(spark):
    """Fixed-point result tracks a plain-float PageRank to ~1e-9."""
    import random

    from vechord_spark.operators.graph import pagerank

    rng = random.Random(3)
    nodes = [f"n{i}" for i in range(30)]
    edges = sorted({(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)})

    # driver-side float reference with the same simplified (leaky
    # dangling-mass) formulation
    allnodes = sorted({n for e in edges for n in e})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(allnodes)
    pr = {v: 1.0 / n for v in allnodes}
    for _ in range(5):
        inflow = {v: 0.0 for v in allnodes}
        for s, d in edges:
            inflow[d] += pr[s] / outdeg[s]
        pr = {v: 0.15 / n + 0.85 * inflow[v] for v in allnodes}

    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.units / 1e12 for r in pagerank(edf, iterations=5).collect()}
    assert set(got) == set(allnodes)
    for v in allnodes:
        assert abs(got[v] - pr[v]) < 1e-8, (v, got[v], pr[v])


def test_pagerank_partitioning_invariant(spark):
    """BIGINT floor-division arithmetic: identical to the last unit
    regardless of partition count (the whole point of fixed-point)."""
    from vechord_spark.operators.graph import pagerank

    edges = [(f"a{i}", f"a{(i * 7 + 1) % 40}") for i in range(40)]
    one = spark.createDataFrame(edges, "src string, dst string").coalesce(1)
    many = spark.createDataFrame(edges, "src string, dst string").repartition(13)
    r1 = sorted((r.node, r.units) for r in pagerank(one, iterations=4).collect())
    r2 = sorted((r.node, r.units) for r in pagerank(many, iterations=4).collect())
    assert r1 == r2


def test_personalized_pagerank_concentrates_on_seed_neighborhood(spark):
    """Two disconnected communities: seeding in community A must give
    community B exactly zero mass, and the seed must outrank its
    neighbors."""
    from vechord_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [
            ("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
            ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
        ],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a1",)], "node string")
    # 24 rounds: the 3-cycle's oscillation decays by 0.85^24 ~= 2%,
    # far under the stationary a1-a3 gap (~0.11)
    got = {r.node: r.units for r in pagerank(edges, iterations=24, seeds=seeds).collect()}
    assert got["b1"] == got["b2"] == got["b3"] == 0
    assert got["a1"] > got["a3"] > 0  # a1 keeps teleport mass; a3 feeds it


def test_personalized_pagerank_rejects_unknown_seeds(spark):
    import pytest as _pytest

    from vechord_spark.operators.graph import pagerank

    edges = spark.createDataFrame([("x", "y")], "src string, dst string")
    seeds = spark.createDataFrame([("zzz",)], "node string")
    with _pytest.raises(ValueError):
        pagerank(edges, iterations=2, seeds=seeds)


def test_triangle_count_known_graphs(spark):
    from vechord_spark.operators.graph import triangle_count

    # K4 has 4 triangles; edge directions/duplicates/self-loops ignored
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d"), ("b", "a"), ("c", "c")]
    row = triangle_count(
        spark.createDataFrame(k4, "src string, dst string")
    ).first()
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 6, 4)

    # a 5-cycle has none
    cyc = [(f"n{i}", f"n{(i + 1) % 5}") for i in range(5)]
    assert triangle_count(
        spark.createDataFrame(cyc, "src string, dst string")
    ).first().n_triangles == 0


def test_triangle_count_matches_bruteforce_random(spark):
    import itertools
    import random

    from vechord_spark.operators.graph import triangle_count

    rng = random.Random(11)
    nodes = list(range(25))
    und = {tuple(sorted(rng.sample(nodes, 2))) for _ in range(90)}
    want = sum(
        1
        for a, b, c in itertools.combinations(sorted(nodes), 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    )
    got = triangle_count(
        spark.createDataFrame([(a, b) for a, b in und], "src int, dst int")
    ).first()
    assert got.n_triangles == want and want > 0
