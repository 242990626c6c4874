"""Driver-contract guards: entry()/queries()/oracle_sql() invariants.

These pin the properties the round driver depends on, so registration
mistakes (window reordering, missing oracles, schema drift) fail fast
in CI instead of in the round artifacts.
"""

import importlib.util
from pathlib import Path

import pytest


@pytest.fixture(scope="module")
def entry_mod():
    path = Path(__file__).resolve().parent.parent / "__spark_entry__.py"
    spec = importlib.util.spec_from_file_location("spark_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs_and_schema_stable(entry_mod, spark):
    df = entry_mod.entry(spark)
    assert df.columns == ["doc_id", "rank", "rrf_score", "lang", "source", "text"]
    assert df.count() >= 0


def test_queries_and_oracles_consistent(entry_mod):
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    # every oracle belongs to a registered query
    assert set(o) <= set(q)
    # the driver's correctness gate reads the first 50 entries — they
    # must all carry full value-hash oracles (no rows-only in-window)
    window = list(q)[:50]
    missing = [n for n in window if n not in o and n not in ("ivf_knn",)]
    assert not missing, f"in-window queries without oracle: {missing}"
    # the priority window is exactly the curated set
    from vechord_spark.suite import _WINDOW_PRIORITY

    assert window == _WINDOW_PRIORITY[:50]


def test_every_query_callable_signature(entry_mod):
    q = entry_mod.queries()
    assert len(q) >= 70
    assert all(callable(fn) for fn in q.values())


def test_bench_list_covers_every_query():
    """bench.py's explicit ordered list must stay in lockstep with the
    suite registry: a query that is registered but never benched
    silently escapes the per-round perf record (this drifted to -5
    queries in round 6 before this test)."""
    import importlib.util as _ilu
    from pathlib import Path as _P

    from vechord_spark.suite import QUERIES

    spec = _ilu.spec_from_file_location(
        "bench_mod", _P(__file__).resolve().parent.parent / "bench.py"
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    assert set(bench.BENCH_QUERIES) == set(QUERIES)
    assert len(bench.BENCH_QUERIES) == len(set(bench.BENCH_QUERIES))
