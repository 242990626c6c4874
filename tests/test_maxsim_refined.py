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

def test_centroid_interaction_full_budget_equals_exact(emb):
    """Correctness gate for the PLAID-style phase-1 estimate: with the
    refine budget >= row count the centroid-interaction path must
    produce exactly the exact-MaxSim ranking (the estimator only
    orders candidates; it must never change the final scores)."""
    from vechord_spark.operators.ivf import build_multivec_ivf

    mv = _mv(emb)
    q = [[0.3] * 64, [-0.2] * 64]
    exact = [
        r.mv_id
        for r in maxsim_topk(
            mv, "vecs", q, k=10, select=["mv_id"], tie_break="mv_id"
        ).collect()
    ]
    index = build_multivec_ivf(mv, "vecs", lists=8, seed=42, token_lists=16)
    assert index.token_centroids is not None
    got = [
        r.mv_id
        for r in maxsim_topk_refined(
            index.inner.assigned.drop("centroid_id", "__mean"),
            "vecs", q, k=10, refine=10_000,
            select=["mv_id"], tie_break="mv_id",
            centroids=index.token_centroids, centroid_ids_col="__centroid_ids",
        ).collect()
    ]
    assert got == exact


def test_centroid_interaction_small_budget_recall_floor(emb):
    """At a small budget the token-centroid estimate must keep useful
    recall (measured 0.5-0.7 at token_lists=16-32 on this corpus; the
    floor leaves slack for KMeans re-seeding across environments)."""
    from vechord_spark.operators.ivf import build_multivec_ivf

    mv = _mv(emb)
    q = [[0.3] * 64, [-0.2] * 64]
    exact = {
        r.mv_id
        for r in maxsim_topk(
            mv, "vecs", q, k=10, select=["mv_id"], tie_break="mv_id"
        ).collect()
    }
    index = build_multivec_ivf(mv, "vecs", lists=8, seed=42, token_lists=32)
    got = {
        r.mv_id
        for r in maxsim_topk_refined(
            index.inner.assigned.drop("centroid_id", "__mean"),
            "vecs", q, k=10, refine=50,
            select=["mv_id"], tie_break="mv_id",
            centroids=index.token_centroids, centroid_ids_col="__centroid_ids",
        ).collect()
    }
    assert len(got & exact) >= 4


def test_registry_multivec_token_index_roundtrip(spark, tmp_path):
    """token_lists centroids + __centroid_ids round-trip through the
    partitioned parquet layout; refined probe search at a full budget
    agrees with exact, and without token_lists nothing is persisted."""
    from vechord_spark.registry import VechordRegistry
    from vechord_spark.spec import Column, MultiVector, TableSpec

    spec = TableSpec(
        "mvt",
        [Column("id", "long", primary_key=True), Column("vecs", MultiVector(4))],
    )
    reg = VechordRegistry("t_mvrefine", str(tmp_path), spark)
    reg.register(spec)
    reg.insert_rows(
        "mvt",
        [
            {"id": i, "vecs": [[float(i), 1.0, 0.0, 0.5], [0.0, float(i % 3), 1.0, -0.5]]}
            for i in range(40)
        ],
    )
    reg.build_multivec_index("mvt", lists=4, token_lists=8)
    idx = reg._load_multivec_index("mvt")
    assert idx.token_centroids is not None and len(idx.token_centroids) == 8
    assert "__centroid_ids" in idx.inner.assigned.columns
    got = reg.search_by_multivec(
        "mvt", [[1.0, 0.0, 0.0, 0.0]], topk=5, probes=4, maxsim_refine=40
    ).collect()
    exact = reg.search_by_multivec("mvt", [[1.0, 0.0, 0.0, 0.0]], topk=5).collect()
    assert [r.id for r in got] == [r.id for r in exact]

    reg.build_multivec_index("mvt", lists=4)  # rebuild without tokens
    idx2 = reg._load_multivec_index("mvt")
    assert idx2.token_centroids is None
    got2 = reg.search_by_multivec(
        "mvt", [[1.0, 0.0, 0.0, 0.0]], topk=5, probes=4, maxsim_refine=40
    ).collect()
    assert [r.id for r in got2] == [r.id for r in exact]


def test_multivec_batch_matches_per_query(spark, tmp_path):
    """search_by_multivec_batch: both the probed path (one pass over
    the unioned probes) and the exact batch scan return, per query,
    exactly what the single-query search returns."""
    import random

    from vechord_spark.registry import VechordRegistry
    from vechord_spark.spec import Column, MultiVector, TableSpec

    rng = random.Random(37)
    r = VechordRegistry("mvb", str(tmp_path), spark)
    r.register(
        TableSpec(
            "late",
            [Column("uid", "int", primary_key=True), Column("mv", MultiVector(4))],
        )
    )

    def rows(ids, center):
        return [
            {
                "uid": i,
                "mv": [
                    [c + rng.uniform(-0.2, 0.2) for c in center]
                    for _ in range(3)
                ],
            }
            for i in ids
        ]

    r.insert_rows("late", rows(range(30), [0, 0, 0, 0]))
    r.insert_rows("late", rows(range(30, 60), [5, 5, 5, 5]))
    r.build_multivec_index("late", lists=2)
    queries = [
        [[0.1, 0.0, 0.1, 0.0], [0.0, 0.2, 0.0, 0.1]],
        [[5.0, 5.0, 5.0, 5.0]],
        [[2.5, 2.5, 2.5, 2.5], [0.0, 5.0, 0.0, 5.0]],
    ]

    for probes in (2, None):
        batch = r.search_by_multivec_batch(
            "late", queries, topk=5, probes=probes
        ).collect()
        by_q: dict[int, list] = {}
        for row in batch:
            by_q.setdefault(row["query_id"], []).append(row)
        assert sorted(by_q) == [0, 1, 2]
        for qi, q in enumerate(queries):
            single = r.search_by_multivec(
                "late", q, topk=5, probes=probes
            ).collect()
            assert [x["uid"] for x in by_q[qi]] == [x["uid"] for x in single]
            for g, s in zip(by_q[qi], single):
                assert abs(g["maxsim_distance"] - s["maxsim_distance"]) < 1e-9


def test_multivec_conditions_prefilter(spark, tmp_path):
    """conditions on MaxSim search = the PRE-filter contract of the
    vector path, on the probed, brute, refined, and batched paths —
    and batch-with-conditions equals the filtered singles."""
    import random

    from vechord_spark.registry import VechordRegistry
    from vechord_spark.spec import Column, MultiVector, TableSpec

    rng = random.Random(37)
    r = VechordRegistry("mvc", str(tmp_path), spark)
    r.register(
        TableSpec(
            "doc",
            [
                Column("uid", "int", primary_key=True),
                Column("tag", "string"),
                Column("mv", MultiVector(4)),
            ],
        )
    )
    r.insert_rows(
        "doc",
        [
            {
                "uid": i,
                "tag": "hot" if i % 3 == 0 else "cold",
                "mv": [
                    [rng.uniform(-1, 1) for _ in range(4)] for _ in range(3)
                ],
            }
            for i in range(120)
        ],
    )
    r.build_multivec_index("doc", lists=4)
    cond = {"tag": "hot"}
    qs = [
        [[rng.uniform(-1, 1) for _ in range(4)] for _ in range(2)]
        for _ in range(6)
    ]

    for kwargs in (
        {"probes": 4},
        {},
        {"maxsim_refine": 50},
    ):
        hits = r.search_by_multivec("doc", qs[0], topk=5, conditions=cond, **kwargs).collect()
        assert len(hits) == 5
        assert all(x.uid % 3 == 0 for x in hits), kwargs

    batch = r.search_by_multivec_batch("doc", qs, topk=5, probes=4, conditions=cond)
    got = {}
    for row in batch.collect():
        got.setdefault(row.query_id, []).append(
            (row.uid, round(row.maxsim_distance, 9))
        )
    for qi, q in enumerate(qs):
        single = [
            (x.uid, round(x.maxsim_distance, 9))
            for x in r.search_by_multivec(
                "doc", q, topk=5, probes=4, conditions=cond
            ).collect()
        ]
        assert got.get(qi, []) == single, f"query {qi} diverged"
        assert all(uid % 3 == 0 for uid, _ in single)
