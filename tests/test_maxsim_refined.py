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
