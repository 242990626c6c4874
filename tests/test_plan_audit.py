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
    "doc_kn_logprob",  # same 1-row bigram-type-total scalar crossJoin
    "corpus_funnel_lm",  # composes the KN type-total scalar crossJoin
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
    # r13 exact gate: four 1-row aggregates (exact-survivor stats,
    # containment miss-count, IVF kept-count, corpus total) crossJoin
    # into the single claim row — every BNLJ side is a scalar
    "semdedup_ivf_survivors",
    "knn_batch",
    # the knn_join batch broadcast (a bounded query batch broadcast
    # against the corpus scan — the intended batch-knn shape) feeding
    # the anti-join against positives
    "hard_negatives",
    "ivf_recall_expanded",  # exact side is the knn_join batch broadcast
    "ivf_knn_batch_recall",  # exact side is the knn_join batch broadcast
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


# All 22 TPC-H-shaped suite queries (Q1-Q22 coverage, round 9b/10).
TPCH_SHAPES = (
    "agg_pricing_summary",          # Q1
    "min_cost_supplier",            # Q2
    "shipping_priority",            # Q3
    "order_priority_exists",        # Q4
    "local_supplier_revenue",       # Q5
    "revenue_forecast",             # Q6
    "volume_shipping",              # Q7
    "nation_market_share",          # Q8
    "product_type_profit",          # Q9
    "returned_item_customers",      # Q10
    "partsupp_value_share",         # Q11
    "late_shipments",               # Q12
    "customer_order_distribution",  # Q13
    "promo_revenue",                # Q14
    "top_supplier",                 # Q15
    "brand_supplier_diversity",     # Q16
    "small_quantity_revenue",       # Q17
    "large_orders",                 # Q18
    "disjunctive_part_revenue",     # Q19
    "excess_inventory_suppliers",   # Q20
    "sole_late_supplier",           # Q21
    "lost_customers_by_nation",     # Q22
)

# Tables whose row count is SF-proportional: forcing one onto the
# build side of a broadcast is the 100x scale-killer this test bans.
# nation (25 rows) and region (5 rows) are CONSTANT at every SF and
# may be hinted freely.
_SF_PROPORTIONAL_COLUMN_PREFIXES = ("l_", "o_", "ps_", "s_", "c_", "p_")


def _hint_subtrees(analyzed: str) -> list[list[str]]:
    """Each ResolvedHint node's subtree (list of node lines) parsed
    from the analyzed-plan tree by drawing-char indentation."""
    import re

    lines = analyzed.splitlines()

    def content_start(ln: str) -> int:
        m = re.match(r"[\s:|+-]*", ln)
        return m.end()

    out = []
    for i, ln in enumerate(lines):
        if "ResolvedHint" not in ln:
            continue
        depth = ln.index("ResolvedHint")
        sub = []
        for nxt in lines[i + 1 :]:
            if content_start(nxt) <= depth:
                break
            sub.append(nxt)
        out.append(sub)
    return out


def _hint_is_scale_safe(subtree: list[str]) -> bool:
    """A broadcast hint survives 100x iff its input is bounded BY
    CONSTRUCTION: (a) an ungrouped (1-row scalar) aggregate — corpus
    stats, HAVING thresholds, the _partsupp supplier-count scalar —
    or (b) a relation set that never grows with SF (nation/region,
    literal local relations)."""
    import re

    for ln in subtree:
        m = re.search(r"\bAggregate \[", ln)
        if m:
            # grouped aggregates print `Aggregate [keys], [exprs]`;
            # scalar ones print a single bracket list -> 1 row, safe
            # regardless of what relations feed it
            return "], [" not in ln
    for ln in subtree:
        if re.search(
            r"Relation \[(%s)" % "|".join(_SF_PROPORTIONAL_COLUMN_PREFIXES), ln
        ):
            return False
    return True


@pytest.mark.parametrize("name", TPCH_SHAPES)
def test_tpch_shapes_carry_no_forced_broadcast_hints(name, spark):
    """The round-4 regression class: a forced F.broadcast() on an
    SF-proportional table. AQE broadcasting a runtime-tiny filtered
    side is fine (and happens at sf0.001) — what must never reappear
    is a HINT on a relation that grows with the data, which would
    force the choice at 100x too. Round 10 extends this from five
    shapes to all 22 and classifies each hint's input subtree instead
    of counting: constant dims (nation/region) and 1-row scalar
    aggregates stay hintable; supplier/customer/part/fact hints fail.
    The analyzed plan shows hints as ResolvedHint before the optimizer
    consumes them."""
    # large_orders keeps ONE deliberate unsafe-looking hint:
    # broadcast(big), the HAVING-survivor aggregate (grouped on
    # l_orderkey but cut by a selective threshold over order totals) —
    # the semi-join-reduction broadcast the round-4 review prescribed.
    allowed_unsafe = {"large_orders": 1}
    analyzed = (
        QUERIES[name](spark, SF)._jdf.queryExecution().analyzed().toString()
    )
    unsafe = [
        sub for sub in _hint_subtrees(analyzed) if not _hint_is_scale_safe(sub)
    ]
    assert len(unsafe) <= allowed_unsafe.get(name, 0), (
        f"{name}: forced join hint on an SF-proportional relation — "
        f"let AQE decide. Offending subtree head: {unsafe[0][:3]}"
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
