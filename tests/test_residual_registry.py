"""Registry-level RESIDUAL IVF-PQ layouts (round 13): the FAISS IVFPQ
default as a persisted, MAINTAINABLE layout.

Round 12 shipped residual PQ at the operator level only and kept the
registry layouts raw-PQ on purpose — recluster/merge moved rows
between cells by pure hardlink, which is only sound when codes are
cell-independent. This round closes that documented tradeoff:
residual layouts re-encode exactly the rows whose reconstruction base
moved (split cells on recluster, folded cells on merge, deltas on
extend), and merge keeps the surviving centroid UNCHANGED so the
target cell's existing codes stay valid.

The load-bearing invariant, pinned across the full lifecycle: the
persisted ``__pq`` codes always equal a fresh re-encode of each row
against the CURRENT centroid table — no stale codes, ever.
"""

import random

import numpy as np
import pytest

from vechord_spark.errors import SchemaError
from vechord_spark.registry import VechordRegistry
from vechord_spark.spec import AnyOf, Column, TableSpec, Vector

DIM = 8


def _registry(spark, tmp_path, ns):
    r = VechordRegistry(ns, str(tmp_path), spark)
    r.register(
        TableSpec(
            "t",
            [Column("uid", "long", primary_key=True), Column("v", Vector(DIM))],
        )
    )
    return r


def _blob_rows(rng, ids, center, spread=0.4):
    return [
        {"uid": i, "v": [c + rng.uniform(-spread, spread) for c in center]}
        for i in ids
    ]


def _assert_codes_fresh(reg, name="t"):
    """The no-stale-codes invariant: stored __pq == re-encode of the
    stored vector against the CURRENT centroid of its CURRENT cell."""
    from vechord_spark.operators.pq import encode_pq

    ipath = reg._index_path(name)
    book = reg._load_codebooks(ipath)
    cents = np.array(
        [
            r.vec
            for r in reg.spark.read.parquet(str(ipath / "centroids"))
            .orderBy("centroid_id")
            .collect()
        ]
    )
    data = reg.spark.read.parquet(str(ipath / "data"))
    expect = encode_pq(
        data.drop("__pq"), "v", book, centroids=cents
    ).select("uid", "centroid_id", "__pq")
    got = data.select("uid", "centroid_id", "__pq")
    g = {(r["uid"], r["centroid_id"]): list(r["__pq"]) for r in got.collect()}
    e = {(r["uid"], r["centroid_id"]): list(r["__pq"]) for r in expect.collect()}
    assert g == e, "stale residual codes found"
    return len(g)


def test_residual_build_validations(spark, tmp_path):
    r = _registry(spark, tmp_path, "resv")
    rng = random.Random(1)
    r.insert_rows("t", _blob_rows(rng, range(16), [0.0] * DIM))
    with pytest.raises(SchemaError, match="requires pq_m"):
        r.build_vector_index("t", lists=2, residual=True)
    with pytest.raises(SchemaError, match="excludes opq"):
        r.build_vector_index("t", lists=2, pq_m=4, opq=True, residual=True)
    with pytest.raises(SchemaError, match="excludes spherical"):
        r.build_vector_index("t", lists=2, pq_m=4, spherical=True, residual=True)


def test_residual_layout_searches_exactly_under_full_refine(spark, tmp_path):
    """With refine >= corpus the two-phase search must equal exact
    brute force regardless of code quality — and the estimate pass
    runs on RESIDUAL codes (meta + stats flags pinned)."""
    rng = random.Random(3)
    r = _registry(spark, tmp_path, "resq")
    centers = [[rng.uniform(-3, 3) for _ in range(DIM)] for _ in range(4)]
    for b, c in enumerate(centers):
        r.insert_rows("t", _blob_rows(rng, range(b * 50, b * 50 + 50), c))
    r.build_vector_index("t", lists=4, pq_m=4, residual=True)
    st = r.index_stats("t")["ivf"]
    assert st["pq"] and st["residual"] and not st["opq"]
    _assert_codes_fresh(r)

    q = [c + 0.05 for c in centers[1]]
    approx = [
        (x.uid, round(x.distance, 6))
        for x in r.search_by_vector(
            "t", q, topk=5, probes=4, refine=10_000
        ).collect()
    ]
    exact = [
        (x.uid, round(x.distance, 6))
        for x in r.search_by_vector("t", q, topk=5).collect()
    ]
    assert approx == exact


def test_residual_codes_stay_fresh_across_lifecycle(spark, tmp_path):
    """build -> extend (drift) -> recluster -> delete -> prune ->
    merge -> compact_index: after every maintenance step the stored
    codes re-derive exactly from the current centroids."""
    rng = random.Random(7)
    r = _registry(spark, tmp_path, "reslc")
    centers = [[rng.uniform(-3, 3) for _ in range(DIM)] for _ in range(4)]
    for b, c in enumerate(centers):
        r.insert_rows("t", _blob_rows(rng, range(b * 40, b * 40 + 40), c))
    r.build_vector_index("t", lists=4, pq_m=4, residual=True)
    n0 = _assert_codes_fresh(r)
    assert n0 == 160

    # drift append into one region -> extend encodes deltas as
    # residuals of their assigned centroid
    far = [6.0] * DIM
    r.insert_rows("t", _blob_rows(rng, range(1000, 1080), far, spread=0.2))
    assert r.extend_vector_index("t") == 80
    _assert_codes_fresh(r)

    # the drifted cell splits; its rows re-encode against the children
    rep = r.recluster_vector_index("t", max_cell_factor=1.5)
    assert rep["split_cells"] >= 1 and rep["moved_rows"] > 0
    _assert_codes_fresh(r)

    # starve a cell, prune the ghosts, then fold it into its sibling:
    # folded rows re-encode, the surviving centroid must NOT move
    r.remove_by("t", {"uid": AnyOf([i for i in range(0, 40) if i % 40 > 2])})
    assert r.prune_vector_index("t")["pruned_rows"] > 0
    _assert_codes_fresh(r)
    ipath = r._index_path("t")
    cents_before = {
        r2.centroid_id: list(r2.vec)
        for r2 in r.spark.read.parquet(str(ipath / "centroids")).collect()
    }
    fold = r.merge_vector_index("t", min_cell_factor=2.0)
    assert fold["merged_cells"] >= 1
    _assert_codes_fresh(r)
    cents_after = [
        list(r2.vec)
        for r2 in r.spark.read.parquet(str(ipath / "centroids")).collect()
    ]
    # every surviving centroid VALUE existed before the merge (no
    # count-weighted drift on residual layouts)
    before_vals = list(cents_before.values())
    for v in cents_after:
        assert any(np.allclose(v, b) for b in before_vals)

    r.compact_index("t")
    _assert_codes_fresh(r)

    # and the healed layout still answers: a query at the drifted
    # region returns drifted rows, exact under full refine
    q = [c + 0.01 for c in far]
    hits = [
        x.uid
        for x in r.search_by_vector(
            "t", q, topk=5, probes=8, refine=10_000
        ).collect()
    ]
    assert set(hits) <= set(range(1000, 1080))
    exact = [x.uid for x in r.search_by_vector("t", q, topk=5).collect()]
    assert hits == exact


def test_maintain_composes_on_residual_layout(spark, tmp_path):
    """The one-call policy heals a drifted residual layout through the
    same gates, with codes fresh at the end and the second call a
    no-op."""
    rng = random.Random(11)
    r = _registry(spark, tmp_path, "resmt")
    centers = [[rng.uniform(-3, 3) for _ in range(DIM)] for _ in range(4)]
    for b, c in enumerate(centers):
        r.insert_rows("t", _blob_rows(rng, range(b * 40, b * 40 + 40), c))
    r.build_vector_index("t", lists=4, pq_m=4, residual=True)
    r.insert_rows("t", _blob_rows(rng, range(1000, 1100), [6.0] * DIM, 0.2))
    r.remove_by("t", {"uid": AnyOf(list(range(0, 35)))})
    rep = r.maintain("t")
    ops = [a["op"] for a in rep["actions"]]
    assert "extend" in ops and "prune" in ops
    _assert_codes_fresh(r)
    assert r.maintain("t")["actions"] == []


def test_declared_index_config_drives_build(spark, tmp_path):
    """VectorIndex carries quantization in the DECLARED schema (the
    reference's DDL emits residual_quantization from the index spec,
    vechord/spec.py:437-444): build_vector_index(name) with no
    arguments builds the declared residual PQ layout, and the l2
    default policy resolves residual=True exactly when PQ is on."""
    from vechord_spark.spec import VectorIndex

    assert VectorIndex(distance="l2", pq_m=4).resolved_residual
    assert not VectorIndex(distance="cos", pq_m=4).resolved_residual
    assert not VectorIndex(distance="l2").resolved_residual
    assert VectorIndex(distance="cos", pq_m=4, residual=True).resolved_residual
    with pytest.raises(SchemaError, match="declare pq_m"):
        VectorIndex(residual=True)
    with pytest.raises(SchemaError, match="excludes opq"):
        VectorIndex(pq_m=4, residual=True, opq=True)

    rng = random.Random(5)
    r = VechordRegistry("resdecl", str(tmp_path), spark)
    r.register(
        TableSpec(
            "t",
            [
                Column("uid", "long", primary_key=True),
                Column(
                    "v",
                    Vector(DIM),
                    index=VectorIndex(distance="l2", lists=4, pq_m=4),
                ),
            ],
        )
    )
    centers = [[rng.uniform(-3, 3) for _ in range(DIM)] for _ in range(4)]
    for b, c in enumerate(centers):
        r.insert_rows("t", _blob_rows(rng, range(b * 30, b * 30 + 30), c))
    r.build_vector_index("t")  # no args: the declaration decides
    st = r.index_stats("t")["ivf"]
    assert st["pq"] and st["residual"] and st["lists"] == 4
    _assert_codes_fresh(r)
