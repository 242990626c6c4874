"""Plan-shape regression net over EVERY registered suite query.

The 100 TB contract is about plan shape, not small-SF wall time: a
CartesianProduct anywhere, or a BroadcastNestedLoopJoin between two
corpus-sized relations, is a scale-killer that small-SF correctness
tests cannot catch. This audit builds every query's physical plan at
sf0.001 and asserts:

- ZERO CartesianProduct, anywhere, ever;
- BroadcastNestedLoopJoin only in the explicitly allowlisted queries
  where the broadcast side is provably tiny BY CONSTRUCTION — a scalar
  aggregate (corpus stats, rate/threshold tables), a literal query-term
  or reorder set, or the |queries| side of a batch k-NN. A new query
  that introduces a BNLJ fails this test and must either fix the plan
  (bin it, broadcast the small side, add an equi-key) or argue its way
  onto the allowlist in review.
"""

import pytest

from vechord_spark.suite import QUERIES

SF = "/root/testdata/sf0.001"

# BNLJ-bearing queries where the nested-loop side is a bounded scalar /
# literal / query-set broadcast (NOT corpus-sized):
#   - bm25 family + hybrid/rerank/groundtruth/eval: corpus-stats scalar
#     crossJoin (n_docs, avgdl) and literal query-term / truth sets
#   - corpus_mix / nb_quality / doc_unigram_logprob: broadcast rate,
#     prior, or vocab-total scalar tables
#   - quantile_sketch_gate: per-quantile scalar union
#   - knn_batch / dedup_embedding_pairs / eval_*: the |queries| side of
#     a batch k-NN broadcast
#   - graph_triangles: single-row aggregate crossJoins for the census
BNLJ_ALLOWED = {
    "bm25_topk",
    "bm25_index_topk",
    "hybrid_rrf",
    "rerank_lexical",
    "rerank_reorder",
    "graph_triangles",
    "groundtruth_generate",
    "corpus_mix",
    "temperature_mix",  # 1-row n_min aggregate crossJoined into the rate table
    "promo_revenue",  # 1-row revenue-total aggregate crossJoined for shares
    "doc_unigram_logprob",
    "doc_bigram_logprob",  # same 1-row vocab-total scalar crossJoin
    "ccnet_buckets",  # composes unigram_logprob's vocab-total scalar crossJoin
    "nb_quality",
    "dsir_importance",  # same 1-row totals scalar crossJoin as nb_quality
    "quantile_sketch_gate",
    "dedup_embedding_pairs",
    "knn_batch",
    "eval_recall_knn",
    "eval_ndcg_knn",
    "eval_mrr_knn",
    "eval_ap_knn",
    "eval_precision_knn",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_has_no_scale_killers(name, spark):
    plan = (
        QUERIES[name](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{name}: CartesianProduct in plan"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected BroadcastNestedLoopJoin — fix the plan or "
            "justify an allowlist entry"
        )
