"""Edit-distance similarity join: deletion-neighborhood blocking is
pinned against a brute-force Levenshtein cross join (written from the
textbook DP here), including the completeness property the blocking
relies on."""

import itertools
import random

import pytest

from vechord_spark.operators.fuzzy import deletion_variants, edit_distance_pairs


def lev(a: str, b: str) -> int:
    """Textbook Wagner-Fischer DP."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_deletion_variants_counts():
    assert deletion_variants("abc", 0) == {"abc"}
    assert deletion_variants("abc", 1) == {"abc", "bc", "ac", "ab"}
    assert "" in deletion_variants("ab", 2)
    assert deletion_variants("", 3) == {""}


def test_blocking_is_complete_fuzz():
    """The FastSS theorem: ED(s,t) <= k  =>  the <=k-deletion
    neighborhoods intersect. Checked exhaustively on a small alphabet."""
    rng = random.Random(5)
    strings = [
        "".join(rng.choice("ab") for _ in range(rng.randint(0, 5)))
        for _ in range(40)
    ]
    for k in (1, 2):
        for s, t in itertools.combinations(strings, 2):
            if lev(s, t) <= k:
                assert deletion_variants(s, k) & deletion_variants(t, k), (
                    s,
                    t,
                    k,
                )


def test_pairs_match_bruteforce(spark):
    rng = random.Random(9)
    rows = []
    for i in range(60):
        base = f"item-{i % 12:03d}-xx"
        s = list(base)
        if rng.random() < 0.5:
            s[rng.randrange(len(s))] = rng.choice("abcdez")
        rows.append((i, "".join(s)))
    df = spark.createDataFrame(rows, ["id", "name"])
    for k in (1, 2):
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in edit_distance_pairs(df, "id", "name", max_dist=k).collect()
        }
        want = {
            (a, b): lev(sa, sb)
            for (a, sa), (b, sb) in itertools.combinations(rows, 2)
            if lev(sa, sb) <= k
        }
        assert got == want, k


def test_max_len_excludes_long_strings(spark):
    rows = [(0, "x" * 100), (1, "x" * 100), (2, "short"), (3, "shorp")]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r["id_a"], r["id_b"])
        for r in edit_distance_pairs(df, "id", "name", max_dist=1).collect()
    }
    assert got == {(2, 3)}  # the 100-char twins are out of contract


def test_mega_bucket_cap(spark):
    # 8 identical strings: every variant bucket holds all 8; cap 4
    # drops them, default cap keeps them
    rows = [(i, "same") for i in range(8)]
    df = spark.createDataFrame(rows, ["id", "name"])
    assert edit_distance_pairs(df, "id", "name", max_dist=1).count() == 28
    assert (
        edit_distance_pairs(df, "id", "name", max_dist=1, max_bucket=4).count()
        == 0
    )


def test_cap_none_is_exact_and_drops_are_detectable(spark):
    # template crowd: strings differing only at one position share
    # exactly one variant; a small cap loses ALL their true pairs —
    # max_bucket=None recovers the exact result and the detector
    # reports the capped buckets
    from vechord_spark.operators.fuzzy import dropped_variant_buckets

    rows = [(i, f"item{c}") for i, c in enumerate("abcdefgh")]
    df = spark.createDataFrame(rows, ["id", "name"])
    assert (
        edit_distance_pairs(df, "id", "name", max_dist=1, max_bucket=4).count()
        == 0
    )
    exact = edit_distance_pairs(
        df, "id", "name", max_dist=1, max_bucket=None
    )
    assert exact.count() == 28  # C(8,2): every pair is one substitution
    dropped = dropped_variant_buckets(
        df, "id", "name", max_dist=1, max_bucket=4
    ).collect()
    assert len(dropped) == 1 and dropped[0]["n"] == 8


def test_zero_distance_is_exact_dupes(spark):
    rows = [(0, "a"), (1, "a"), (2, "b")]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = [
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(df, "id", "name", max_dist=0).collect()
    ]
    assert got == [(0, 1, 0)]
