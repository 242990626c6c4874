"""Hyperplane LSH bucketing + bucket-pruned search."""

import pyspark.sql.functions as F

from vechord_spark.operators.knn import knn
from vechord_spark.operators.lsh import HyperplaneLsh, bucket_assignments


def test_buckets_are_deterministic_ints(emb):
    a = bucket_assignments(emb, "vec_id", "embedding", dim=64, n_planes=6)
    b = bucket_assignments(emb, "vec_id", "embedding", dim=64, n_planes=6)
    ra = {r.vec_id: r.bucket for r in a.collect()}
    rb = {r.vec_id: r.bucket for r in b.collect()}
    assert ra == rb
    assert all(0 <= v < 64 for v in ra.values())


def test_identical_vectors_share_bucket(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.5, 0.2]), (2, [1.0, 0.0, 0.5, 0.2]), (3, [-1.0, 0.3, -0.5, 0.1])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r.bucket for r in bucket_assignments(df, "vec_id", "embedding", dim=4).collect()}
    assert got[1] == got[2]


def test_bucket_pruned_search_recall(emb):
    lsh = HyperplaneLsh(dim=64, n_planes=6)
    q = [0.3] * 64
    exact = [
        r.vec_id for r in knn(emb, "embedding", q, k=10, select=["vec_id"], tie_break="vec_id").collect()
    ]
    approx = {
        r.vec_id
        for r in lsh.search(
            emb, "embedding", q, k=10, multi_probe=2, select=["vec_id"], tie_break="vec_id"
        ).collect()
    }
    # multi-probe over 6 planes scans a good fraction of the corpus ->
    # decent recall of the exact top-10
    assert len(approx & set(exact)) >= 5
    # query bucket is consistent between driver and executor math
    assert lsh.query_bucket(q) in lsh.probe_buckets(q, multi_probe=1)
