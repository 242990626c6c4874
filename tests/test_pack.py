"""Sequence packing: offset-bin semantics, determinism, utilization."""

import pytest

from vechord_spark.operators.pack import bin_utilization, pack_sequences


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "a", 60),
        (2, "a", 50),   # preceding 60  -> bin 0 (overflows budget 100)
        (3, "a", 10),   # preceding 110 -> bin 1
        (4, "a", 100),  # preceding 120 -> bin 1
        (5, "b", 30),   # fresh partition
    ]
    return spark.createDataFrame(rows, "doc_id long, src string, n int")


def test_offset_binning(docs, spark):
    got = {
        r.doc_id: (r.bin_id, r.bin_offset)
        for r in pack_sequences(docs, "doc_id", "n", 100, "src").collect()
    }
    assert got == {1: (0, 0), 2: (0, 60), 3: (1, 10), 4: (1, 20), 5: (0, 0)}


def test_partitioning_does_not_change_layout(docs):
    a = pack_sequences(docs.repartition(1), "doc_id", "n", 100, "src").collect()
    b = pack_sequences(docs.repartition(5), "doc_id", "n", 100, "src").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bin_utilization(docs):
    packed = pack_sequences(docs, "doc_id", "n", 100, "src")
    util = {
        (r.src, r.bin_id): (r.n_docs, r.n_tokens, r.fill_frac)
        for r in bin_utilization(packed, "n", 100, "src").collect()
    }
    assert util[("a", 0)] == (2, 110, 1.1)  # overflow by one doc allowed
    assert util[("a", 1)] == (2, 110, 1.1)
    assert util[("b", 0)] == (1, 30, 0.3)


def test_budget_validated(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "n", 0, "src")


def test_pack_plan_single_partitioned_window(docs):
    """Scale guard: one Window keyed on the shard column and exactly
    one Exchange (the window's hash partitioning) — never a global
    single-partition sort."""
    plan = (
        pack_sequences(docs, "doc_id", "n", 100, "src")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") >= 1
    assert "Exchange SinglePartition" not in plan
    assert "Exchange hashpartitioning(src" in plan
