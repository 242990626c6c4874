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
