"""MMR reranker: the numpy core is pinned against a naive
from-the-definition greedy written independently here, then the
applyInPandas operator is exercised end-to-end on a SparkSession."""

import math
import random

import numpy as np
import pytest

from vechord_spark.operators.mmr import mmr_rerank, mmr_select


def naive_mmr(cands, k, lam):
    """cands: [(id, rel, vec)]; returns [(pos, id, score)]. Greedy from
    the definition; ties toward the smaller id; cosine in pure Python."""

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    rest = sorted(cands, key=lambda c: c[0])
    sel = []
    out = []
    for pos in range(min(k, len(cands))):
        best = None
        for c in rest:
            pen = max((cos(c[2], s[2]) for s in sel), default=0.0)
            score = lam * c[1] - (1 - lam) * pen
            if best is None or score > best[1] + 1e-12:
                best = (c, score)
        out.append((pos, best[0][0], best[1]))
        sel.append(best[0])
        rest = [c for c in rest if c[0] != best[0][0]]
    return out


def test_core_matches_naive_fuzz():
    rng = random.Random(11)
    for trial in range(30):
        n = rng.randint(1, 12)
        d = rng.randint(1, 4)
        cands = [
            (
                i,
                round(rng.uniform(0, 1), 3),
                [rng.choice([-1.0, 0.0, 1.0, 2.0]) for _ in range(d)],
            )
            for i in range(n)
        ]
        k = rng.randint(1, n + 2)
        lam = rng.choice([0.0, 0.3, 0.5, 0.8, 1.0])
        got = mmr_select(
            [c[0] for c in cands],
            np.array([c[1] for c in cands]),
            np.array([c[2] for c in cands], dtype=np.float64),
            k,
            lam,
        )
        want = naive_mmr(cands, k, lam)
        assert [(p, i) for p, i, _ in got] == [(p, i) for p, i, _ in want], (
            trial,
            cands,
            k,
            lam,
        )
        for (_, _, a), (_, _, b) in zip(got, want):
            assert abs(a - b) < 1e-9


def test_lambda_one_is_topk_by_relevance():
    cands = [(i, 1.0 - i * 0.1, [1.0, 0.0]) for i in range(6)]
    got = mmr_select(
        [c[0] for c in cands],
        np.array([c[1] for c in cands]),
        np.array([c[2] for c in cands]),
        3,
        1.0,
    )
    assert [i for _, i, _ in got] == [0, 1, 2]


def test_duplicates_are_deferred():
    # two exact duplicates with top relevance, one orthogonal candidate:
    # lam=0.5 picks one duplicate, then the orthogonal one (penalty 1.0
    # outweighs the 0.05 relevance edge), then the other duplicate
    cands = [
        (0, 1.00, [1.0, 0.0]),
        (1, 0.95, [1.0, 0.0]),
        (2, 0.50, [0.0, 1.0]),
    ]
    got = mmr_select(
        [c[0] for c in cands],
        np.array([c[1] for c in cands]),
        np.array([c[2] for c in cands]),
        3,
        0.5,
    )
    assert [i for _, i, _ in got] == [0, 2, 1]
    assert got[0][2] == pytest.approx(0.5)
    assert got[1][2] == pytest.approx(0.25)
    assert got[2][2] == pytest.approx(0.475 - 0.5)


def test_zero_vectors_and_k_overrun():
    got = mmr_select([7, 8], np.array([0.9, 0.1]), np.zeros((2, 3)), 10, 0.5)
    assert [i for _, i, _ in got] == [7, 8]  # cos vs zero-vec := 0
    assert mmr_select([], np.array([]), np.zeros((0, 2)), 5, 0.5) == []


def test_spark_operator_matches_core(spark):
    rng = random.Random(3)
    rows = []
    for qid in range(4):
        for cid in range(9):
            rows.append(
                (
                    qid,
                    qid * 100 + cid,
                    round(rng.uniform(0, 1), 3),
                    [float(rng.choice([0, 1])), float(rng.choice([0, 1]))],
                )
            )
    df = spark.createDataFrame(rows, ["qid", "id", "rel", "vec"])
    got = {
        (r["qid"], r["pos"]): (r["id"], r["mmr_score"])
        for r in mmr_rerank(df, k=4, lam=0.5).collect()
    }
    assert len(got) == 16
    for qid in range(4):
        grp = [r for r in rows if r[0] == qid]
        want = mmr_select(
            [r[1] for r in grp],
            np.array([r[2] for r in grp]),
            np.array([r[3] for r in grp], dtype=np.float64),
            4,
            0.5,
        )
        for pos, cid, score in want:
            gid, gscore = got[(qid, pos)]
            assert gid == cid
            assert gscore == pytest.approx(score, abs=1e-12)
