"""Dedup suite behavior tests."""

import pytest
from pyspark.sql import functions as F

from vechord_spark.operators.dedup import (
    drop_exact_duplicates,
    embedding_top_pairs,
    exact_duplicates,
    minhash_candidate_pairs,
    ngram_jaccard,
    simhash,
    simhash_near_pairs,
)

ROWS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "The quick  brown fox, jumps over the lazy dog!"),  # same normalized
    (3, "the quick brown fox jumps over the lazy cat"),  # near-dup
    (4, "completely different content about spark sql engines"),
]


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(ROWS, "doc_id int, text string")


def test_exact_duplicates(df):
    groups = exact_duplicates(df, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0].doc_ids == [1, 2]
    kept = drop_exact_duplicates(df, "doc_id", "text")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3, 4]


def test_minhash_finds_near_dups(df):
    # band_size=2 = high-recall banding (near-dups at jaccard ~0.7 are
    # probabilistic under the default selective band_size=4)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(df, "doc_id", "text", band_size=2).collect()
    }
    assert (1, 2) in pairs  # identical normalized text always collides
    assert (1, 3) in pairs  # near-dup shares most shingles
    assert (1, 4) not in pairs and (3, 4) not in pairs


def test_ngram_jaccard_values(df):
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard(df, "doc_id", "text").collect()
    }
    assert got[(1, 3)] > 0.6  # near-dup
    assert got.get((1, 4), 0.0) < 0.1
    # threshold filter
    hi = ngram_jaccard(df, "doc_id", "text", threshold=0.5).collect()
    assert all(r.jaccard >= 0.5 for r in hi)


def test_ngram_jaccard_with_candidates(df, spark):
    cand = spark.createDataFrame([(1, 3)], "doc_a int, doc_b int")
    got = ngram_jaccard(df, "doc_id", "text", candidates=cand).collect()
    assert len(got) == 1 and (got[0].doc_a, got[0].doc_b) == (1, 3)


def test_simhash_near_pairs(df):
    sigs = {r.doc_id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    assert len(sigs) == 4
    assert sigs[1] == sigs[2]  # tokens identical after normalization
    pairs = simhash_near_pairs(df, "doc_id", "text", max_hamming=10).collect()
    assert {(p.doc_a, p.doc_b) for p in pairs} >= {(1, 2)}


def test_embedding_top_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.99, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, v array<float>")
    top = embedding_top_pairs(df, "vec_id", "v", top_n=1).collect()
    assert (top[0].id_a, top[0].id_b) == (1, 2)


def test_connected_components_chains_and_singletons(spark):
    from vechord_spark.operators.dedup import connected_components

    # A-B-C chain + isolated pair D-E; doc F never appears
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    from vechord_spark.operators.dedup import connected_components

    # a 12-node path needs multiple propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert set(got.values()) == {0} and len(got) == 13
    # the distributed star-contraction path on the same worst-case
    # (path graph = maximum diameter) must converge to the same answer
    dist = {
        r.doc_id: r.cluster_id
        for r in connected_components(pairs, local_edge_threshold=0).collect()
    }
    assert set(dist.values()) == {0} and len(dist) == 13


def test_drop_near_duplicates_keeps_survivor(spark):
    from vechord_spark.operators.dedup import drop_near_duplicates

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (9, "unique")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    kept = sorted(r.doc_id for r in drop_near_duplicates(df, "doc_id", pairs).collect())
    assert kept == [1, 9]  # min-id survivor + untouched singleton


def test_drop_near_duplicates_keep_best_prefers_quality(spark):
    """keep_best keeps the BEST cluster member (prefer desc, id asc on
    ties), not the min-id one — the production representative choice."""
    from pyspark.sql import functions as F

    from vechord_spark.operators.dedup import drop_near_duplicates_keep_best

    df = spark.createDataFrame(
        [
            (1, "short"),
            (2, "the much longer duplicate body"),
            (3, "mid body"),
            (5, "tie"),
            (6, "tie"),
            (9, "unique"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    kept = sorted(
        r.doc_id
        for r in drop_near_duplicates_keep_best(
            df, "doc_id", pairs, prefer=F.length("text")
        ).collect()
    )
    # cluster {1,2,3}: 2 is longest; cluster {5,6}: equal length ->
    # min id 5; 9 untouched
    assert kept == [2, 5, 9]


import pytest


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(7, 200, 150), (11, 300, 120), (23, 60, 90)])
def test_connected_components_matches_union_find(spark, seed, n_nodes, n_edges):
    """Randomized (seeded) graph vs a pure-Python union-find reference:
    every node must map to the min id of its component — on BOTH the
    driver fast path and the distributed star-contraction path."""
    import random

    from vechord_spark.operators.dedup import connected_components

    rng = random.Random(seed)
    edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in edges:
        union(a, b)
    expect = {}
    for n in parent:
        root = find(n)
        expect.setdefault(root, []).append(n)
    want = {n: min(members) for members in expect.values() for n in members}

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == want

    # the distributed label-propagation path (gate disabled) must agree
    # exactly with the driver-side union-find fast path
    dist = {
        r.doc_id: r.cluster_id
        for r in connected_components(pairs, local_edge_threshold=0).collect()
    }
    assert dist == want


def test_duplicate_span_stats_reference(spark):
    from vechord_spark.operators.dedup import duplicate_span_stats

    texts = {
        1: "alpha beta gamma delta common run of five tokens here",
        2: "different head common run of five tokens here tail words",
        3: "totally unrelated content with no shared span at all",
        4: "short one",
    }
    n = 5

    def spans(t):
        toks = t.split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    counts = {}
    for t in texts.values():
        for s in spans(t):
            counts[s] = counts.get(s, 0) + 1
    want = {}
    for d, t in texts.items():
        ss = spans(t)
        dup = sum(1 for s in ss if counts[s] >= 2)
        want[d] = (len(ss), dup, round(dup / len(ss), 6))

    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_fraction)
        for r in duplicate_span_stats(df, "doc_id", "text", ngram=n).collect()
    }
    assert got == want
    assert got[1][1] > 0 and got[4] == (1, 0, 0.0)


def test_duplicate_span_strategies_agree(spark, docs):
    from vechord_spark.operators.dedup import duplicate_span_stats

    sub = docs.limit(80)
    a = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_fraction)
        for r in duplicate_span_stats(sub, "doc_id", "text", strategy="window").collect()
    }
    b = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_fraction)
        for r in duplicate_span_stats(sub, "doc_id", "text", strategy="join").collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        duplicate_span_stats(sub, "doc_id", "text", strategy="nope")


def test_line_dedup_first_occurrence_wins(spark):
    """Cross-doc boilerplate keeps only its (doc_id, line_no)-first
    copy; within-doc repeats collapse too; empty lines drop."""
    import hashlib

    from vechord_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "unique one\nfooter text\n\nunique two"),
            (2, "footer text\nown line\nfooter text"),
            (3, "footer text"),
        ],
        ["id", "body"],
    )
    rows = {r.doc_id: r for r in line_dedup(docs, "id", "body").collect()}
    assert rows[1].n_lines == 3 and rows[1].n_kept == 3
    exp1 = hashlib.md5(b"unique one\nfooter text\nunique two").hexdigest()
    assert rows[1].kept_md5 == exp1
    # doc 2: 'footer text' already seen in doc 1 -> both copies dropped
    assert rows[2].n_lines == 3 and rows[2].n_kept == 1
    assert rows[2].kept_md5 == hashlib.md5(b"own line").hexdigest()
    # doc 3: fully boilerplate -> zero kept, empty-string hash
    assert rows[3].n_lines == 1 and rows[3].n_kept == 0
    assert rows[3].kept_md5 == hashlib.md5(b"").hexdigest()


def test_line_dedup_trims_before_matching(spark):
    from vechord_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [(1, "  padded line  "), (2, "padded line")], ["id", "body"]
    )
    rows = {r.doc_id: r for r in line_dedup(docs, "id", "body").collect()}
    assert rows[1].n_kept == 1 and rows[2].n_kept == 0


def test_line_dedup_randomized_against_python_model(spark):
    """Seeded random corpora with a tiny line alphabet (forcing heavy
    cross-doc collisions) must match a pure-Python first-occurrence
    model exactly — counts and surviving-text hash."""
    import hashlib
    import random

    vocab = ["alpha line", "beta line", "gamma", "delta text", " padded  ", ""]
    for seed in (7, 23, 99):
        rng = random.Random(seed)
        corpus = [
            (i, "\n".join(rng.choice(vocab) for _ in range(rng.randint(0, 8))))
            for i in range(60)
        ]
        # python model: global first-occurrence by (doc_id, line_no)
        seen, model = set(), {}
        for did, body in sorted(corpus):
            lines = [l.strip() for l in body.split("\n")]
            lines = [(no, l) for no, l in enumerate(lines) if l != ""]
            kept = []
            for no, l in lines:
                if l not in seen:
                    seen.add(l)
                    kept.append(l)
            if lines:
                model[did] = (
                    len(lines),
                    len(kept),
                    hashlib.md5("\n".join(kept).encode()).hexdigest(),
                )
        from vechord_spark.operators.dedup import line_dedup

        df = spark.createDataFrame(corpus, ["id", "body"])
        got = {
            r.doc_id: (r.n_lines, r.n_kept, r.kept_md5)
            for r in line_dedup(df, "id", "body").collect()
        }
        assert got == model, f"seed {seed}"


def test_line_dedup_return_text(spark):
    from vechord_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [(1, "keep one\nshared"), (2, "shared\nkeep two")], ["id", "body"]
    )
    rows = {
        r.doc_id: r.kept_text
        for r in line_dedup(docs, "id", "body", return_text=True).collect()
    }
    assert rows == {1: "keep one\nshared", 2: "keep two"}


def test_embedding_pair_count_matches_join_path(spark):
    """The blocked-matmul pair counter is count-identical to the JVM
    fold-expression all-pairs join at every block granularity."""
    import random

    from vechord_spark.operators.dedup import (
        embedding_near_duplicates,
        embedding_pair_count,
    )

    rng = random.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want = embedding_near_duplicates(df, "vec_id", "embedding", 0.2).count()
    for nb in (1, 4, 8):
        got = embedding_pair_count(
            df, "vec_id", "embedding", 0.2, n_blocks=nb
        ).collect()[0].n_pairs
        assert got == want, (nb, got, want)


def test_bucketed_pairs_matmul_matches_jvm(spark):
    """The per-bucket matmul pair scorer is pair-for-pair identical
    (ids AND 6-decimal cosine) to the JVM fold-expression bucketed
    path, including under a multi-assigning bucketer."""
    import random

    from pyspark.sql import functions as F

    from vechord_spark.operators.dedup import (
        embedding_bucketed_pairs_matmul,
        embedding_near_duplicates,
    )

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # single-assignment bucketer: 5 hash buckets
    single = df.select(
        "vec_id", F.pmod(F.hash("vec_id"), F.lit(5)).alias("bucket")
    )
    # multi-assignment: every vector ALSO lands in a second bucket, so
    # boundary pairs appear in two groups and must dedupe to one row
    multi = single.unionByName(
        df.select(
            "vec_id", F.pmod(F.hash("vec_id") + 1, F.lit(5)).alias("bucket")
        )
    )
    for bucketer in (single, multi):
        want = sorted(
            tuple(r)
            for r in embedding_near_duplicates(
                df, "vec_id", "embedding", 0.2, bucketer=bucketer
            ).collect()
        )
        got = sorted(
            tuple(r)
            for r in embedding_bucketed_pairs_matmul(
                df, "vec_id", "embedding", 0.2, bucketer=bucketer
            ).collect()
        )
        assert got == want and len(want) > 0


# ----------------------------------------------- exact prefix-filter join


def test_jaccard_prefix_join_matches_bruteforce(spark, docs):
    """Completeness + soundness vs the obvious O(n^2) computation on a
    real corpus slice."""
    import itertools
    import re

    from vechord_spark.operators.dedup import jaccard_prefix_join

    sample = docs.limit(80)
    rows = [(r["doc_id"], r["text"]) for r in sample.collect()]

    def shingles(text):
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for t in (0.2, 0.35, 0.6):
        want = {}
        for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
            sa, sb = shingles(ta), shingles(tb)
            inter = len(sa & sb)
            union = len(sa | sb)
            if union and inter >= t * union:
                want[(min(ia, ib), max(ia, ib))] = (inter, union)
        got = {
            (r["id_a"], r["id_b"]): (r["inter"], r["union_n"])
            for r in jaccard_prefix_join(sample, "doc_id", "text", t).collect()
        }
        assert got == want, t


def test_jaccard_prefix_join_threshold_guard(spark, docs):
    import pytest as _pytest

    from vechord_spark.operators.dedup import jaccard_prefix_join

    with _pytest.raises(ValueError):
        jaccard_prefix_join(docs, "doc_id", "text", 0.0)
    with _pytest.raises(ValueError):
        jaccard_prefix_join(docs, "doc_id", "text", 1.5)


def test_jaccard_prefix_join_supersets_minhash_verified(spark, docs):
    """The exact join must contain every MinHash-candidate pair that
    verifies at the same threshold (MinHash can only MISS pairs)."""
    from vechord_spark.operators.dedup import (
        jaccard_prefix_join,
        minhash_candidate_pairs,
        ngram_jaccard,
    )

    sample = docs.limit(120)
    cands = minhash_candidate_pairs(sample, "doc_id", "text")
    via_minhash = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard(
            sample, "doc_id", "text", threshold=0.35, candidates=cands
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in jaccard_prefix_join(sample, "doc_id", "text", 0.35).collect()
    }
    assert via_minhash <= exact
