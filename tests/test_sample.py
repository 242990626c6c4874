"""Deterministic hash sampling: stability, nesting, stratified rates."""

import pytest
from pyspark.sql import functions as F

from vechord_spark.operators.sample import (
    deterministic_sample,
    stratified_sample,
)


@pytest.fixture()
def table(spark):
    rows = [(i, "src%d" % (i % 3)) for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_sample_is_partitioning_invariant(table):
    a = _ids(deterministic_sample(table.repartition(1), "doc_id", 0.2, salt="x"))
    b = _ids(deterministic_sample(table.repartition(7), "doc_id", 0.2, salt="x"))
    assert a == b and 100 < len(a) < 300  # ~200 expected


def test_samples_nest_under_same_salt(table):
    small = _ids(deterministic_sample(table, "doc_id", 0.1, salt="x"))
    large = _ids(deterministic_sample(table, "doc_id", 0.5, salt="x"))
    assert small <= large


def test_different_salt_draws_independent_sample(table):
    a = _ids(deterministic_sample(table, "doc_id", 0.3, salt="x"))
    b = _ids(deterministic_sample(table, "doc_id", 0.3, salt="y"))
    assert a != b


def test_rate_bounds_validated(table):
    with pytest.raises(ValueError):
        deterministic_sample(table, "doc_id", 1.5)


def test_stratified_rates_and_default(table):
    out = stratified_sample(
        table, "doc_id", "source", {"src0": 1.0, "src1": 0.2}, default_rate=0.0
    )
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    assert by_src["src0"] == 334  # rate 1.0 keeps every src0 row
    assert 30 < by_src.get("src1", 0) < 110  # ~67 expected
    assert "src2" not in by_src  # default_rate 0 drops unlisted strata


def test_sample_plan_is_single_filter_no_shuffle(table):
    """Scale guard: sampling must be one narrow Filter over the scan —
    no Exchange anywhere in the plan."""
    plan = (
        deterministic_sample(table, "doc_id", 0.2, salt="x")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Filter" in plan


def test_mixture_rates_and_sample(table, spark):
    from vechord_spark.operators.sample import mixture_rates, mixture_sample

    weights = {"a": 0.5, "b": 0.5}
    df = spark.createDataFrame(
        [(i, "a" if i < 80 else "b") for i in range(100)], "id long, src string"
    )
    rates = {r.src: r.rate for r in mixture_rates(df, "src", weights).collect()}
    # b (20 rows) binds: alpha = 40, rate_b = 1.0, rate_a = 0.25
    assert rates["b"] == 1.0
    assert abs(rates["a"] - 0.25) < 1e-12
    kept = mixture_sample(df, "id", "src", weights, salt="t")
    by_src = {r.src: r.n for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert by_src["b"] == 20  # binding source keeps everything
    assert 10 <= by_src.get("a", 0) <= 30  # ~20 expected
    # deterministic under repartitioning
    k1 = sorted(r.id for r in kept.collect())
    k2 = sorted(r.id for r in mixture_sample(df.repartition(7), "id", "src", weights, salt="t").collect())
    assert k1 == k2
    with pytest.raises(ValueError):
        mixture_rates(df, "src", {})
    with pytest.raises(ValueError):
        mixture_rates(df, "src", {"a": -1.0})


# --- split_assign (train/val/test + shards) -------------------------------

def test_split_fractions_and_determinism(table):
    from vechord_spark.operators.sample import split_assign

    out = split_assign(table, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
                       n_shards=4, salt="sp")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 700 < counts["train"] < 900
    assert counts["train"] + counts["val"] + counts["test"] == 1000
    # partitioning-invariant assignment
    a = {(r["doc_id"], r["split"], r["shard"]) for r in out.collect()}
    b = {(r["doc_id"], r["split"], r["shard"]) for r in
         split_assign(table.repartition(7), "doc_id",
                      {"train": 0.8, "val": 0.1, "test": 0.1},
                      n_shards=4, salt="sp").collect()}
    assert a == b


def test_split_shard_range_and_independence(table):
    from vechord_spark.operators.sample import split_assign

    out = split_assign(table, "doc_id", {"train": 0.5, "test": 0.5},
                       n_shards=8, salt="sp")
    rows = out.collect()
    assert all(0 <= r["shard"] < 8 for r in rows)
    # shards are roughly even within each split (independent hash)
    from collections import Counter
    c = Counter((r["split"], r["shard"]) for r in rows)
    assert all(v > 20 for v in c.values())


def test_split_appends_never_move_rows(table):
    # re-splitting a superset must keep old rows' assignments (no leakage)
    from vechord_spark.operators.sample import split_assign

    small = table.filter(F.col("doc_id") < 500)
    a = {r["doc_id"]: r["split"] for r in
         split_assign(small, "doc_id", {"train": 0.9, "val": 0.1}, salt="sp").collect()}
    b = {r["doc_id"]: r["split"] for r in
         split_assign(table, "doc_id", {"train": 0.9, "val": 0.1}, salt="sp").collect()}
    assert all(b[k] == v for k, v in a.items())


def test_split_fractions_must_sum_to_one(table):
    from vechord_spark.operators.sample import split_assign

    with pytest.raises(ValueError):
        split_assign(table, "doc_id", {"train": 0.5, "val": 0.1})


def test_split_plan_no_shuffle(table):
    from vechord_spark.operators.sample import split_assign

    plan = split_assign(table, "doc_id", {"train": 0.9, "val": 0.1},
                        n_shards=4, salt="sp")._jdf.queryExecution(
                        ).executedPlan().toString()
    assert "Exchange" not in plan


def test_cap_per_key_caps_and_is_deterministic(spark):
    from vechord_spark.operators.sample import cap_per_key

    rows = [(i, "big" if i < 200 else "small") for i in range(220)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = cap_per_key(df, "source", 25, order_id="doc_id", salt="s")
    counts = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"big": 25, "small": 20}
    again = cap_per_key(df.repartition(7), "source", 25, order_id="doc_id", salt="s")
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
    # different salt -> different (still size-25) subset
    other = cap_per_key(df, "source", 25, order_id="doc_id", salt="t")
    assert sorted(r.doc_id for r in other.collect()) != sorted(
        r.doc_id for r in kept.collect()
    )


def test_cap_per_key_rejects_zero(spark):
    import pytest as _pytest

    from vechord_spark.operators.sample import cap_per_key

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with _pytest.raises(ValueError):
        cap_per_key(df, "source", 0, order_id="doc_id")


def test_temperature_rates_shape(spark):
    from vechord_spark.operators.sample import temperature_rates

    df = spark.createDataFrame(
        [(i, "big" if i < 900 else ("mid" if i < 990 else "small"))
         for i in range(1000)],
        "id long, source string",
    )
    rates = {r["source"]: r["rate"] for r in
             temperature_rates(df, "source", alpha=0.5).collect()}
    # smallest source binds at rate 1; rates scale as sqrt(n_min/n)
    assert rates["small"] == 1.0
    assert abs(rates["mid"] - (10 / 90) ** 0.5) < 1e-12
    assert abs(rates["big"] - (10 / 900) ** 0.5) < 1e-12
    # alpha=1 is the natural mix: keep everything
    nat = {r["source"]: r["rate"] for r in
           temperature_rates(df, "source", alpha=1.0).collect()}
    assert set(nat.values()) == {1.0}


def test_temperature_sample_flattens_mix(spark):
    from vechord_spark.operators.sample import temperature_sample

    df = spark.createDataFrame(
        [(i, "head" if i < 3000 else "tail") for i in range(3300)],
        "id long, source string",
    )
    kept = temperature_sample(df, "id", "source", alpha=0.5)
    by = {r["source"]: r["n"] for r in
          kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # tail keeps everything; head downsamples toward sqrt ratio
    assert by["tail"] == 300
    expected_head = 3000 * (300 / 3000) ** 0.5  # ~949
    assert abs(by["head"] - expected_head) < 0.15 * expected_head
    # deterministic: identical under repartition
    again = temperature_sample(df.repartition(7), "id", "source", alpha=0.5)
    assert again.count() == kept.count()


def test_leakage_safe_split_keeps_clusters_together(spark):
    from vechord_spark.operators.sample import leakage_safe_split, split_assign

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # two chained clusters (1-2-3, 10-11) plus isolated docs
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    out = leakage_safe_split(
        docs, "doc_id", {"train": 0.8, "test": 0.2}, pairs, salt="t"
    ).collect()
    by_id = {r.doc_id: r for r in out}
    # every clustered doc keyed on the min-id representative
    assert all(by_id[i].split_rep == 1 for i in (1, 2, 3))
    assert all(by_id[i].split_rep == 10 for i in (10, 11))
    assert len({by_id[i].split for i in (1, 2, 3)}) == 1
    assert len({by_id[i].split for i in (10, 11)}) == 1
    # isolated docs match plain row-id splitting (same salt)
    plain = {
        r.doc_id: r.split
        for r in split_assign(
            docs, "doc_id", {"train": 0.8, "test": 0.2}, salt="t"
        ).collect()
    }
    clustered = {1, 2, 3, 10, 11}
    assert all(
        by_id[i].split == plain[i] for i in range(200) if i not in clustered
    )
    # the invariant the operator exists for: no cluster spans splits
    n_splits_per_rep = {}
    for r in out:
        n_splits_per_rep.setdefault(r.split_rep, set()).add(r.split)
    assert all(len(s) == 1 for s in n_splits_per_rep.values())


def test_leakage_safe_split_random_graphs_model(spark):
    """Randomized model check: for arbitrary pair graphs, (a) every doc
    keyed on its component's min id (Python union-find as the model),
    (b) no component spans splits, (c) split fractions keyed on the rep
    hash exactly match split_assign run on the rep column."""
    import random

    from vechord_spark.operators.sample import leakage_safe_split

    rng = random.Random(1234)
    for _ in range(3):
        n = 300
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(1, 80))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        # model: union-find with min-id roots
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        in_pairs = {a for a, _ in edges} | {b for _, b in edges}
        want_rep = {
            i: (find(i) if i in in_pairs else i) for i in range(n)
        }
        docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        out = leakage_safe_split(
            docs, "doc_id", {"train": 0.7, "test": 0.3}, pairs, salt="rg"
        ).collect()
        got_rep = {r.doc_id: r.split_rep for r in out}
        assert got_rep == want_rep
        splits_per_rep: dict = {}
        for r in out:
            splits_per_rep.setdefault(r.split_rep, set()).add(r.split)
        assert all(len(s) == 1 for s in splits_per_rep.values())


# ------------------------------------------------- priority sampling


def test_weighted_priority_sample_determinism_and_k(spark, docs):
    from vechord_spark.operators.sample import weighted_priority_sample

    a = weighted_priority_sample(docs, "doc_id", "n_chars", 15, salt="s").collect()
    b = weighted_priority_sample(
        docs.repartition(7), "doc_id", "n_chars", 15, salt="s"
    ).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 15
    assert [r["rank"] for r in a] == list(range(1, 16))
    pr = [r["priority"] for r in a]
    assert pr == sorted(pr, reverse=True)
    # k > n returns everything
    assert weighted_priority_sample(docs, "doc_id", "n_chars", 10**6).count() == docs.count()


def test_weighted_priority_sample_favors_heavy_rows(spark):
    from vechord_spark.operators.sample import weighted_priority_sample

    # 100 light rows (w=1) + 10 heavy rows (w=100): across many salts
    # the heavy rows must dominate the k=10 sample on average
    rows = [(i, 1) for i in range(100)] + [(100 + i, 100) for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "w"])
    heavy = 0
    for s in range(8):
        got = weighted_priority_sample(df, "id", "w", 10, salt=f"t{s}").collect()
        heavy += sum(1 for r in got if r["id"] >= 100)
    assert heavy >= 40  # expectation ~ >70%; generous floor


def test_weighted_priority_zero_weight_never_beats_positive(spark):
    from vechord_spark.operators.sample import weighted_priority_sample

    df = spark.createDataFrame([(0, 0), (1, 0), (2, 5)], ["id", "w"])
    got = weighted_priority_sample(df, "id", "w", 1).collect()
    assert [r["id"] for r in got] == [2]
