"""Two-phase MaxSim (refine budget)."""

import pyspark.sql.functions as F

from vechord_spark.operators.maxsim import maxsim_topk, maxsim_topk_refined


def _mv(emb):
    return emb.groupBy(
        F.floor(F.col("vec_id") / 5).cast("long").alias("mv_id")
    ).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("vec_id", "embedding"))),
            lambda s: s["embedding"],
        ).alias("vecs")
    )


def test_big_budget_equals_exact(emb):
    mv = _mv(emb)
    q = [[0.3] * 64, [-0.2] * 64]
    exact = [r.mv_id for r in maxsim_topk(mv, "vecs", q, k=5, select=["mv_id"], tie_break="mv_id").collect()]
    refined = [
        r.mv_id
        for r in maxsim_topk_refined(
            mv, "vecs", q, k=5, refine=10_000, select=["mv_id"], tie_break="mv_id"
        ).collect()
    ]
    assert refined == exact


def test_small_budget_good_recall(emb):
    mv = _mv(emb)
    q = [[0.3] * 64]
    exact = {r.mv_id for r in maxsim_topk(mv, "vecs", q, k=5, select=["mv_id"], tie_break="mv_id").collect()}
    refined = {
        r.mv_id
        for r in maxsim_topk_refined(
            mv, "vecs", q, k=5, refine=20, select=["mv_id"], tie_break="mv_id"
        ).collect()
    }
    assert len(refined & exact) >= 3


def test_multivec_ivf_recall_vs_exact(emb):
    # the MultiVectorIndex analog: probe-pruned MaxSim must keep high
    # recall vs the exact scan (reference vechord/spec.py:447-464)
    from vechord_spark.operators.ivf import build_multivec_ivf

    mv = _mv(emb)
    q = [[0.3] * 64, [-0.2] * 64]
    exact = {
        r.mv_id
        for r in maxsim_topk(
            mv, "vecs", q, k=10, select=["mv_id"], tie_break="mv_id"
        ).collect()
    }
    index = build_multivec_ivf(mv, "vecs", lists=8, seed=42)
    got = {
        r.mv_id
        for r in index.search(
            q, k=10, probes=4, select=["mv_id"], tie_break="mv_id"
        ).collect()
    }
    assert len(exact & got) / 10 >= 0.5
    # full-probe search IS the exact scan
    all_probes = {
        r.mv_id
        for r in index.search(
            q, k=10, probes=8, select=["mv_id"], tie_break="mv_id"
        ).collect()
    }
    assert all_probes == exact


def test_registry_multivec_index_roundtrip(spark, tmp_path):
    # build_multivec_index persists partitionBy(centroid_id); probes =
    # lists searches everything, so it must equal the exact scan
    import pytest

    from vechord_spark.errors import SchemaError
    from vechord_spark.registry import VechordRegistry
    from vechord_spark.spec import Column, MultiVector, TableSpec

    spec = TableSpec(
        "mvt",
        [
            Column("id", "long", primary_key=True),
            Column("vecs", MultiVector(4)),
        ],
    )
    reg = VechordRegistry("t_mvivf", str(tmp_path), spark)
    reg.register(spec)
    rows = [
        {"id": i, "vecs": [[float(i), 1.0, 0.0, 0.5], [0.0, float(i % 3), 1.0, -0.5]]}
        for i in range(40)
    ]
    reg.insert_rows("mvt", rows)
    # probed search before the index exists must fail loudly
    with pytest.raises(SchemaError):
        reg.search_by_multivec("mvt", [[1.0, 0.0, 0.0, 0.0]], probes=2)
    lists = reg.build_multivec_index("mvt", lists=4)
    assert lists == 4
    got = reg.search_by_multivec(
        "mvt", [[1.0, 0.0, 0.0, 0.0]], topk=5, probes=4
    ).collect()
    exact = reg.search_by_multivec("mvt", [[1.0, 0.0, 0.0, 0.0]], topk=5).collect()
    assert [r.id for r in got] == [r.id for r in exact]
