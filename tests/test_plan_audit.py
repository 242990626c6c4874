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
    "lost_customers_by_nation",  # 1-row avg-balance cutoff crossJoin (Q22)
    "doc_unigram_logprob",
    "doc_bigram_logprob",  # same 1-row vocab-total scalar crossJoin
    "ccnet_buckets",  # composes unigram_logprob's vocab-total scalar crossJoin
    "nb_quality",
    "dsir_importance",  # same 1-row totals scalar crossJoin as nb_quality
    "quantile_sketch_gate",
    # the partsupp derivation crossJoins a 1-row supplier-count scalar
    # (suite._partsupp); partsupp_value_share adds the 1-row Q11
    # HAVING-threshold scalar on top
    "min_cost_supplier",
    "partsupp_value_share",
    "excess_inventory_suppliers",
    "product_type_profit",  # Q9 consumes the same partsupp derivation
    "dedup_embedding_pairs",
    # exact all-pairs ground truth (verification-scale by contract,
    # like ivf_recall) + three 1-row claim-scalar crossJoins
    "semdedup_ivf_recall",
    "knn_batch",
    "ivf_recall_expanded",  # exact side is the knn_join batch broadcast
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


# ---------------------------------------------------------------------------
# Targeted plan-shape pins for the flagship queries: these assert the
# SPECIFIC physical strategy PLANS.md promises, not just the absence of
# scale-killers — a silent Catalyst regression (a lost pushdown, a
# flipped join side, a lost semi-join) fails here before it costs a
# round.
# ---------------------------------------------------------------------------


def _plan(name, spark):
    return (
        QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
    )


def test_order_priority_is_semi_join_with_pushed_filters(spark):
    plan = _plan("order_priority_exists", spark)
    assert "LeftSemi" in plan
    # both filters reach the scans
    assert "PushedFilters" in plan
    assert plan.count("EqualTo(l_returnflag,R)") >= 1
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_knn_filtered_pushes_predicate_to_scan(spark):
    plan = _plan("knn_filtered", spark)
    assert "TakeOrderedAndProject" in plan
    # the label predicate is evaluated at/next to the scan, not post-rank
    assert plan.index("label") < plan.index("TakeOrderedAndProject") or (
        "PushedFilters: [IsNotNull(label)]" in plan
    )


def test_tpch_shapes_carry_no_forced_broadcast_hints(spark):
    """The round-4 regression class: a forced F.broadcast() on a fact
    table. AQE broadcasting a runtime-tiny filtered side is fine (and
    happens at sf0.001) — what must never reappear is a HINT, which
    would force the choice at 100x too. The analyzed plan shows hints
    as ResolvedHint before the optimizer consumes them."""
    # large_orders keeps ONE deliberate hint: broadcast(big), the
    # HAVING-survivor aggregate (selective threshold over order
    # totals) — the small-side broadcast the round-4 review prescribed.
    allowed_hints = {"large_orders": 1}
    for name in ("shipping_priority", "large_orders", "promo_revenue",
                 "late_shipments", "order_priority_exists"):
        analyzed = (
            QUERIES[name](spark, SF)
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        assert analyzed.count("ResolvedHint") <= allowed_hints.get(name, 0), (
            f"{name}: forced join hint in the plan — let AQE decide"
        )


def test_matryoshka_estimate_stage_is_bounded_heap(spark):
    plan = _plan("knn_matryoshka", spark)
    assert "TakeOrderedAndProject" in plan


def test_rollup_query_scans_rollup_not_facts(spark):
    plan = _plan("events_rollup_daily", spark)
    assert "rollup_events" in plan
    assert "events.parquet" not in plan


def test_grouping_sets_is_single_expand_single_exchange(spark):
    """GROUPING SETS must compile to one Expand feeding a partial
    HashAggregate before the ONE exchange — the shuffle carries
    combined groups, never n_sets copies of the fact table."""
    plan = _plan("grouping_sets_pricing", spark)
    assert plan.count("Expand") == 1
    # partial aggregate sits between Expand and the exchange
    assert plan.index("Expand") > plan.index("Exchange")  # bottom-up string
    assert plan.count("Exchange") <= 2  # agg exchange (+AQE coalesce read)


def test_disjunctive_predicate_pushes_to_both_scans(spark):
    """Q19 shape: the OR-of-ANDs must reach BOTH parquet scans as a
    pushed disjunction (per-table residue extraction), not run only as
    a post-join filter."""
    plan = _plan("disjunctive_part_revenue", spark)
    # (the plan string elides long filter lists with "..." — assert the
    # stable prefixes of each scan's pushed disjunction)
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)" in plan
    assert "Or(Or(And(EqualTo(p_brand" in plan
