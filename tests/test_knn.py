"""k-NN vs numpy oracle (SURVEY §5 test plan)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vechord_spark.operators.knn import knn, knn_join
from vechord_spark.operators.maxsim import maxsim_score, maxsim_topk


@pytest.fixture(scope="module")
def emb_np(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = df.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return df, ids, mat


QUERY = [((i * 37) % 13 - 6) / 7.0 for i in range(64)]


def _numpy_topk(ids, mat, q, k, metric):
    q = np.asarray(q)
    if metric == "l2":
        d = np.linalg.norm(mat - q, axis=1)
    elif metric == "cos":
        d = 1 - (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    else:
        d = -(mat @ q)
    order = np.lexsort((ids, d))
    return list(ids[order[:k]])


@pytest.mark.parametrize("metric", ["l2", "cos", "dot"])
def test_knn_matches_numpy(emb_np, metric):
    df, ids, mat = emb_np
    got = knn(df, "embedding", QUERY, k=10, distance=metric, select=["vec_id"], tie_break="vec_id")
    assert [r.vec_id for r in got.collect()] == _numpy_topk(ids, mat, QUERY, 10, metric)


def test_knn_join_per_query_topk(emb_np, spark):
    df, ids, mat = emb_np
    queries = df.limit(3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = knn_join(queries, df, "qvec", "embedding", "qid", "vec_id", k=5)
    rows = out.collect()
    assert len(rows) == 15
    # each query's own vector is its nearest neighbour (distance 0)
    own = {r.qid: r.vec_id for r in rows if r.rank == 1}
    assert all(q == v for q, v in own.items())


def test_maxsim_matches_numpy(emb_np, spark):
    df, ids, mat = emb_np
    grouped = df.groupBy("label").agg(F.collect_list("embedding").alias("vecs"))
    qs = [QUERY, [0.5] * 64]
    got = maxsim_topk(grouped, "vecs", qs, k=3, select=["label"], tie_break="label").collect()

    # numpy oracle
    rows = df.select("label", "embedding").collect()
    import collections

    groups = collections.defaultdict(list)
    for r in rows:
        groups[r.label].append(r.embedding)
    qm = np.asarray(qs, dtype=np.float64)
    scores = {
        lbl: float((qm @ np.asarray(vecs, dtype=np.float64).T).max(axis=1).sum())
        for lbl, vecs in groups.items()
    }
    expected = sorted(scores, key=lambda l: (-scores[l], l))[:3]
    assert [r.label for r in got] == expected


def test_knn_plan_is_take_ordered(emb_np):
    """orderBy+limit must compile to TakeOrderedAndProject (per-partition
    heap + merge), not a global sort — the property that scales."""
    df, _, _ = emb_np
    plan = knn(df, "embedding", QUERY, k=10).limit(10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_knn_join_partial_limit_before_exchange(spark, emb):
    # scale guard: the rank<=k filter must compile to a PARTIAL
    # WindowGroupLimit BELOW the shuffle, so each partition forwards at
    # most k rows per query instead of the full |Q| x |corpus| pairs
    import pyspark.sql.functions as F

    from vechord_spark.operators.knn import knn_join

    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    df = knn_join(q, emb, "qv", "embedding", "query_id", "vec_id", k=5)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    lines = plan.splitlines()
    exchange_at = min(
        i for i, l in enumerate(lines) if "Exchange hashpartitioning(__qid" in l
    )
    assert any(
        "WindowGroupLimit" in l for l in lines[exchange_at:]
    ), plan  # partial limit below the exchange (printed deeper in the tree)


def test_quantize_int8_codes_and_clamp(spark):
    from vechord_spark.functions.vector import quantize_int8

    df = spark.createDataFrame(
        [(1, [0.0, 1.0, -1.0, 0.5, 1.7, -3.0, 0.0039])],
        "id int, v array<float>",
    )
    (codes,) = df.select(quantize_int8("v").alias("q")).first()
    # floor(x*127 + 0.5) with clamp to [-127, 127]
    assert codes == [0, 127, -127, 64, 127, -127, 0]


def test_binary_signature_matches_driver_packing(spark):
    from vechord_spark.functions.vector import binary_signature, signature_of

    vecs = [
        [1.0, -1.0, 0.0, 2.0] * 16,          # 64-dim, pattern 1001 repeating
        [-0.5] * 64,
        [0.001] * 64,
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)], ["id", "v"])
    got = {
        r.id: list(r.sig)
        for r in df.select("id", binary_signature("v", 64).alias("sig")).collect()
    }
    for i, v in enumerate(vecs):
        assert got[i] == signature_of(v), (i, got[i], signature_of(v))
    assert got[1] == [0, 0] and got[2] == [2**32 - 1, 2**32 - 1]


def test_hamming_distance_known(spark):
    from vechord_spark.functions.vector import hamming_distance

    df = spark.createDataFrame(
        [([0b1010, 0], [0b0110, 1])], ["a", "b"]
    ).select(
        F.col("a").cast("array<long>").alias("a"),
        F.col("b").cast("array<long>").alias("b"),
    )
    assert df.select(hamming_distance("a", "b").alias("h")).collect()[0].h == 3


def test_binary_knn_full_refine_equals_exact(spark):
    """With refine >= corpus size the rerank scores every row, so the
    result must equal brute-force exact knn."""
    from vechord_spark.operators.knn import binary_knn, knn
    from vechord_spark.sources.testdata import load_table
    from vechord_spark.suite import QVEC

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()
    exact = [
        r.vec_id
        for r in knn(emb, "embedding", QVEC, k=10, distance="cos",
                     tie_break="vec_id").select("vec_id").collect()
    ]
    approx = [
        r.vec_id
        for r in binary_knn(emb, "vec_id", "embedding", QVEC, dim=64,
                            topk=10, refine=n).collect()
    ]
    assert approx == exact


def test_matryoshka_knn_matches_exact_with_full_budget(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from vechord_spark.operators.knn import knn, matryoshka_knn

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [0.1] * 64
    n = emb.count()
    # refine = corpus size -> must equal exact brute force
    got = matryoshka_knn(
        emb, "vec_id", "embedding", q, prefix_dim=16, topk=5, refine=n
    ).collect()
    want = knn(emb, "embedding", q, k=5, distance="cos", select=["vec_id"]).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in want]
    # small refine still returns topk rows with ascending distances
    small = matryoshka_knn(
        emb, "vec_id", "embedding", q, prefix_dim=16, topk=5, refine=20
    ).collect()
    assert len(small) == 5
    dists = [r.distance for r in small]
    assert dists == sorted(dists)
    with _pytest.raises(ValueError):
        matryoshka_knn(emb, "vec_id", "embedding", q, prefix_dim=0)
    with _pytest.raises(ValueError):
        matryoshka_knn(emb, "vec_id", "embedding", q, prefix_dim=65)
