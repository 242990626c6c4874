"""Batch search == N individual searches, pinned at N=64 for every
modality (round-12 verdict ask #1).

The batch family's design claim is "N queries from ONE scan"; these
tests pin the CORRECTNESS half of that claim at a stream-sized N (the
prior parity tests used toy N=2-4): the batched result must reproduce
all 64 individual searches exactly — same rows, same scores, same
per-query order. The wall-clock half (>=5x batch-over-loop at N=64)
is measured at sf0.1 by benchmarks/batch_sweep.py and recorded in
BASELINE.md.
"""

import random

import pytest

from vechord_spark.registry import VechordRegistry
from vechord_spark.spec import (
    AnyOf,
    Column,
    Keyword,
    MultiVector,
    SparseVector,
    TableSpec,
    Vector,
)

N_QUERIES = 64


def _queries_from(words, rng, n=N_QUERIES):
    return [
        " ".join(rng.choice(words) for _ in range(rng.randint(1, 3)))
        for _ in range(n)
    ]


def test_vector_batch_equals_64_searches(spark, tmp_path):
    rng = random.Random(13)
    r = VechordRegistry("b64v", str(tmp_path), spark)
    r.register(
        TableSpec(
            "doc",
            [Column("uid", "int", primary_key=True), Column("vec", Vector(8))],
        )
    )
    r.insert_rows(
        "doc",
        [
            {"uid": i, "vec": [rng.uniform(-1, 1) for _ in range(8)]}
            for i in range(400)
        ],
    )
    r.build_vector_index("doc", lists=8)
    qs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(N_QUERIES)]

    batch = r.search_by_vector_batch("doc", qs, topk=5, probes=3)
    got = {}
    for row in batch.collect():
        got.setdefault(row.query_id, []).append((row.uid, round(row.distance, 9)))

    for qi, q in enumerate(qs):
        single = [
            (x.uid, round(x.distance, 9))
            for x in r.search_by_vector("doc", q, topk=5, probes=3).collect()
        ]
        assert got.get(qi, []) == single, f"query {qi} diverged"


def test_multivec_batch_equals_64_searches(spark, tmp_path):
    rng = random.Random(17)
    r = VechordRegistry("b64m", str(tmp_path), spark)
    r.register(
        TableSpec(
            "doc",
            [
                Column("uid", "int", primary_key=True),
                Column("mv", MultiVector(4)),
            ],
        )
    )
    r.insert_rows(
        "doc",
        [
            {
                "uid": i,
                "mv": [
                    [rng.uniform(-1, 1) for _ in range(4)]
                    for _ in range(rng.randint(2, 4))
                ],
            }
            for i in range(120)
        ],
    )
    r.build_multivec_index("doc", lists=4)
    qs = [
        [[rng.uniform(-1, 1) for _ in range(4)] for _ in range(2)]
        for _ in range(N_QUERIES)
    ]

    batch = r.search_by_multivec_batch("doc", qs, topk=5, probes=2)
    got = {}
    for row in batch.collect():
        got.setdefault(row.query_id, []).append(
            (row.uid, round(row.maxsim_distance, 9))
        )

    for qi, q in enumerate(qs):
        single = [
            (x.uid, round(x.maxsim_distance, 9))
            for x in r.search_by_multivec("doc", q, topk=5, probes=2).collect()
        ]
        assert got.get(qi, []) == single, f"query {qi} diverged"


def test_keyword_batch_equals_64_searches(spark, tmp_path):
    rng = random.Random(19)
    words = [
        "spark", "engine", "query", "batch", "merge", "window", "scan",
        "join", "sort", "shuffle", "vector", "index",
    ]
    r = VechordRegistry("b64k", str(tmp_path), spark)
    r.register(
        TableSpec(
            "doc",
            [Column("uid", "int", primary_key=True), Column("body", Keyword())],
        )
    )
    r.insert_rows(
        "doc",
        [
            {
                "uid": i,
                "body": " ".join(rng.choice(words) for _ in range(12)),
            }
            for i in range(300)
        ],
    )
    r.build_keyword_index("doc")
    qs = _queries_from(words, rng)

    batch = r.search_by_keyword_batch("doc", qs, topk=5)
    got = {}
    for row in batch.collect():
        got.setdefault(row.query_id, []).append((row.uid, row.score))

    for qi, q in enumerate(qs):
        single = [
            (x.uid, x.score)
            for x in r.search_by_keyword("doc", q, topk=5).collect()
        ]
        assert got.get(qi, []) == single, f"query {qi!r} diverged"


def test_sparse_batch_equals_64_searches(spark, tmp_path):
    from vechord_spark.functions.embed import sparse_query_vector

    rng = random.Random(23)
    words = [
        "alpha", "beta", "gamma", "delta", "omega", "theta", "sigma",
        "kappa", "lambda", "zeta",
    ]
    r = VechordRegistry("b64s", str(tmp_path), spark)
    r.register(
        TableSpec(
            "doc",
            [
                Column("uid", "int", primary_key=True),
                Column("body", "string"),
                Column("sv", SparseVector(512)),
            ],
        )
    )
    from pyspark.sql import functions as F

    from vechord_spark.functions.embed import sparse_embedding

    rows = [
        {"uid": i, "body": " ".join(rng.choice(words) for _ in range(10))}
        for i in range(300)
    ]
    df = spark.createDataFrame(
        [(x["uid"], x["body"]) for x in rows], "uid int, body string"
    ).withColumn("sv", sparse_embedding(F.col("body"), 512))
    r.append("doc", df)
    r.build_sparse_index("doc")
    qs = [sparse_query_vector(q, 512) for q in _queries_from(words, rng)]

    batch = r.search_by_sparse_batch("doc", qs, topk=5)
    got = {}
    for row in batch.collect():
        got.setdefault(row.query_id, []).append((row.uid, row.score))

    for qi, q in enumerate(qs):
        single = [
            (x.uid, x.score)
            for x in r.search_by_sparse("doc", q, topk=5).collect()
        ]
        assert got.get(qi, []) == single, f"query {qi} diverged"


def test_sparse_batch_requires_index_and_queries(spark, tmp_path):
    from vechord_spark.errors import SchemaError

    r = VechordRegistry("b64e", str(tmp_path), spark)
    r.register(
        TableSpec(
            "doc",
            [
                Column("uid", "int", primary_key=True),
                Column("sv", SparseVector(64)),
            ],
        )
    )
    with pytest.raises(SchemaError, match="no sparse index"):
        r.search_by_sparse_batch("doc", [{1: 1.0}])


@pytest.mark.parametrize("residual", [False, True], ids=["raw-pq", "residual-pq"])
def test_pq_batch_equals_64_searches(spark, tmp_path, residual):
    """The PQ layout's batched two-phase search (estimate over codes ->
    per-query refine -> exact) must equal 64 individual searches at
    the same refine budget — for both raw-vector and residual codes."""
    rng = random.Random(29)
    r = VechordRegistry(f"b64pq{int(residual)}", str(tmp_path), spark)
    r.register(
        TableSpec(
            "doc",
            [Column("uid", "int", primary_key=True), Column("vec", Vector(8))],
        )
    )
    centers = [[rng.uniform(-3, 3) for _ in range(8)] for _ in range(6)]
    r.insert_rows(
        "doc",
        [
            {
                "uid": i,
                "vec": [c + rng.uniform(-0.5, 0.5) for c in centers[i % 6]],
            }
            for i in range(360)
        ],
    )
    r.build_vector_index("doc", lists=6, pq_m=4, residual=residual)
    st = r.index_stats("doc")["ivf"]
    assert st["pq"] and st["residual"] == residual
    qs = [
        [c + rng.uniform(-0.3, 0.3) for c in centers[i % 6]]
        for i in range(N_QUERIES)
    ]

    batch = r.search_by_vector_batch("doc", qs, topk=5, probes=3, refine=40)
    got = {}
    for row in batch.collect():
        got.setdefault(row.query_id, []).append((row.uid, round(row.distance, 9)))

    for qi, q in enumerate(qs):
        single = [
            (x.uid, round(x.distance, 9))
            for x in r.search_by_vector(
                "doc", q, topk=5, probes=3, refine=40
            ).collect()
        ]
        assert got.get(qi, []) == single, f"query {qi} diverged ({'res' if residual else 'raw'})"


def test_rabitq_batch_equals_64_searches(spark, tmp_path):
    """The RaBitQ layout's batched search (bit estimate -> per-query
    refine -> exact) must equal 64 individual searches at the same
    refine budget — the quantized batch family's bit member."""
    rng = random.Random(31)
    r = VechordRegistry("b64rq", str(tmp_path), spark)
    r.register(
        TableSpec(
            "doc",
            [Column("uid", "int", primary_key=True), Column("vec", Vector(8))],
        )
    )
    centers = [[rng.uniform(-3, 3) for _ in range(8)] for _ in range(6)]
    r.insert_rows(
        "doc",
        [
            {
                "uid": i,
                "vec": [c + rng.uniform(-0.5, 0.5) for c in centers[i % 6]],
            }
            for i in range(360)
        ],
    )
    r.build_vector_index("doc", lists=6, rabitq=True)
    assert r.index_stats("doc")["ivf"]["rabitq"]
    qs = [
        [c + rng.uniform(-0.3, 0.3) for c in centers[i % 6]]
        for i in range(N_QUERIES)
    ]

    batch = r.search_by_vector_batch("doc", qs, topk=5, probes=3, refine=40)
    got = {}
    for row in batch.collect():
        got.setdefault(row.query_id, []).append((row.uid, round(row.distance, 9)))

    for qi, q in enumerate(qs):
        single = [
            (x.uid, round(x.distance, 9))
            for x in r.search_by_vector(
                "doc", q, topk=5, probes=3, refine=40
            ).collect()
        ]
        assert got.get(qi, []) == single, f"query {qi} diverged"


def test_batch_conditions_equal_filtered_singles(spark, tmp_path):
    """conditions on the batch wrappers = the single path's PRE-filter
    applied once to the whole query stream: per query, the batch
    result equals the filtered single search exactly, for the IVF,
    brute-force, keyword, and sparse paths."""
    from pyspark.sql import functions as F

    from vechord_spark.errors import SchemaError
    from vechord_spark.functions.embed import sparse_embedding, sparse_query_vector

    rng = random.Random(31)
    r = VechordRegistry("b64c", str(tmp_path), spark)
    r.register(
        TableSpec(
            "doc",
            [
                Column("uid", "int", primary_key=True),
                Column("tag", "string"),
                Column("body", Keyword()),
                Column("vec", Vector(8)),
                Column("sv", SparseVector(256)),
            ],
        )
    )
    words = ["spark", "engine", "query", "merge", "window", "scan"]
    rows = [
        (
            i,
            "hot" if i % 3 == 0 else "cold",
            " ".join(rng.choice(words) for _ in range(8)),
            [rng.uniform(-1, 1) for _ in range(8)],
        )
        for i in range(240)
    ]
    df = spark.createDataFrame(
        rows, "uid int, tag string, body string, vec array<float>"
    ).withColumn("sv", sparse_embedding(F.col("body"), 256))
    r.append("doc", df)
    r.build_vector_index("doc", lists=4)
    r.build_keyword_index("doc")
    r.build_sparse_index("doc")
    cond = {"tag": "hot"}
    n = 16
    vqs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(n)]
    tqs = [" ".join(rng.choice(words) for _ in range(2)) for _ in range(n)]
    sqs = [sparse_query_vector(q, 256) for q in tqs]

    def per_query(df_out, val_col):
        got = {}
        for row in df_out.collect():
            # round to 9: the single path scores via the SQL fold
            # expression, the batch via numpy — equal up to float tails
            got.setdefault(row.query_id, []).append(
                (row.uid, round(row[val_col], 9))
            )
        return got

    # IVF path
    got = per_query(
        r.search_by_vector_batch("doc", vqs, topk=4, probes=4, conditions=cond),
        "distance",
    )
    for qi, q in enumerate(vqs):
        single = [
            (x.uid, round(x.distance, 9))
            for x in r.search_by_vector(
                "doc", q, topk=4, probes=4, conditions=cond
            ).collect()
        ]
        assert got.get(qi, []) == single
        assert all(uid % 3 == 0 for uid, _ in single)
    # brute-force path
    got = per_query(
        r.search_by_vector_batch("doc", vqs, topk=4, conditions=cond),
        "distance",
    )
    for qi, q in enumerate(vqs):
        single = [
            (x.uid, round(x.distance, 9))
            for x in r.search_by_vector("doc", q, topk=4, conditions=cond).collect()
        ]
        assert sorted(got.get(qi, [])) == sorted(single)
    # keyword path
    got = per_query(
        r.search_by_keyword_batch("doc", tqs, topk=4, conditions=cond), "score"
    )
    for qi, q in enumerate(tqs):
        single = [
            (x.uid, round(x.score, 9))
            for x in r.search_by_keyword("doc", q, topk=4, conditions=cond).collect()
        ]
        assert got.get(qi, []) == single
    # sparse path
    got = per_query(
        r.search_by_sparse_batch("doc", sqs, topk=4, conditions=cond), "score"
    )
    for qi, q in enumerate(sqs):
        single = [
            (x.uid, round(x.score, 9))
            for x in r.search_by_sparse("doc", q, topk=4, conditions=cond).collect()
        ]
        assert got.get(qi, []) == single

    # PQ layouts pre-filter on the batch path like the single one:
    # batch+conditions == filtered singles (full refine keeps it exact)
    r2 = VechordRegistry("b64cpq", str(tmp_path), spark)
    r2.register(
        TableSpec(
            "doc",
            [Column("uid", "int", primary_key=True), Column("vec", Vector(8))],
        )
    )
    r2.insert_rows(
        "doc",
        [{"uid": i, "vec": [rng.uniform(-1, 1) for _ in range(8)]} for i in range(64)],
    )
    r2.build_vector_index("doc", lists=2, pq_m=4)
    pq_cond = {"uid": AnyOf([i for i in range(64) if i % 2 == 0])}
    got_pq = per_query(
        r2.search_by_vector_batch(
            "doc", vqs[:2], topk=4, probes=2, refine=10_000, conditions=pq_cond
        ),
        "distance",
    )
    for qi in range(2):
        single = [
            (x.uid, round(x.distance, 9))
            for x in r2.search_by_vector(
                "doc", vqs[qi], topk=4, probes=2, refine=10_000,
                conditions=pq_cond,
            ).collect()
        ]
        assert got_pq.get(qi, []) == single
        assert all(uid % 2 == 0 for uid, _ in single)
