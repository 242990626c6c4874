"""Maximal Marginal Relevance (MMR) diversity reranking.

The reference's rerank surface is pointwise (external rerankers +
lexical scoring, vechord/rerank.py — ported in operators/fusion.py and
providers_http.py). MMR (Carbonell & Goldstein 1998) is the classic
*listwise* complement every retrieval stack eventually needs: re-order
a candidate list so each pick balances relevance against redundancy
with what is already picked,

    next = argmax_{c not in S}  lam * rel(c)
                              - (1 - lam) * max_{s in S} cos(c, s)

Spark-first shape: MMR is greedy-sequential *within* one query's
candidate list but embarrassingly parallel *across* queries — and
candidate lists are small by construction (the top-N of a first-stage
ANN/BM25 pass). So the operator is one ``groupBy(query).applyInPandas``
with a per-group numpy loop: one shuffle on the query id, O(k * n * d)
per group, no driver participation. At 100 TB the query stream is the
big axis and this plan scales with it; the inner loop never sees more
than one candidate list.

Determinism: score ties break toward the smaller id (stable across
engines); vectors are L2-normalized once per group in float64, so
identical vectors score exactly 1.0 and orthogonal ones exactly 0.0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-top: pandas-UDF string type hints resolve here

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def mmr_select(
    ids: list, rels: np.ndarray, vecs: np.ndarray, k: int, lam: float
) -> list[tuple[int, object, float]]:
    """Greedy MMR over ONE candidate list (driver/test-friendly core).

    Returns ``[(pos, id, mmr_score), ...]`` — the score is the value
    the pick won with (lam*rel - (1-lam)*max_sim at selection time).
    Ties break toward the smaller id.
    """
    n = len(ids)
    if n == 0 or k <= 0:
        return []
    v = np.asarray(vecs, dtype=np.float64)
    norms = np.linalg.norm(v, axis=1)
    norms[norms == 0.0] = 1.0  # zero vectors: cos := 0 against anything
    v = v / norms[:, None]
    rels = np.asarray(rels, dtype=np.float64)
    # stable order for tie-breaks: process candidates sorted by id
    order = sorted(range(n), key=lambda i: ids[i])
    v, rels = v[order], rels[order]
    sids = [ids[i] for i in order]

    out: list[tuple[int, object, float]] = []
    # true max-over-selected similarity (NOT clamped at zero — anti-
    # correlated neighbors make the penalty negative, i.e. a bonus,
    # exactly as the definition says); no selected yet -> penalty 0
    max_sim: np.ndarray | None = None
    active = np.ones(n, dtype=bool)
    for pos in range(min(k, n)):
        pen = max_sim if max_sim is not None else 0.0
        scores = lam * rels - (1.0 - lam) * pen
        scores = np.where(active, scores, -np.inf)
        best = int(np.argmax(scores))  # argmax takes the FIRST max = min id
        out.append((pos, sids[best], float(scores[best])))
        active[best] = False
        sims = v @ v[best]
        max_sim = sims if max_sim is None else np.maximum(max_sim, sims)
    return out


def mmr_rerank(
    df: DataFrame,
    query_col: str = "qid",
    id_col: str = "id",
    rel_col: str = "rel",
    vec_col: str = "vec",
    k: int = 10,
    lam: float = 0.5,
) -> DataFrame:
    """Distributed MMR: one ``applyInPandas`` per query group.

    Input: one row per (query, candidate) with a relevance score and
    an embedding; output: ``(query, pos, id, mmr_score)`` for the k
    picks per query, in pick order.
    """
    q_field = df.schema[query_col]
    id_field = df.schema[id_col]
    schema = T.StructType(
        [
            T.StructField(query_col, q_field.dataType),
            T.StructField("pos", T.IntegerType()),
            T.StructField(id_col, id_field.dataType),
            T.StructField("mmr_score", T.DoubleType()),
        ]
    )

    def _group(pdf: pd.DataFrame) -> pd.DataFrame:
        qv = pdf[query_col].iloc[0]
        vecs = np.stack(
            [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
        )
        picks = mmr_select(
            list(pdf[id_col]), pdf[rel_col].to_numpy(), vecs, k, lam
        )
        return pd.DataFrame(
            {
                query_col: [qv] * len(picks),
                "pos": [p for p, _, _ in picks],
                id_col: [i for _, i, _ in picks],
                "mmr_score": [s for _, _, s in picks],
            }
        )

    return (
        df.select(query_col, id_col, rel_col, vec_col)
        .groupBy(query_col)
        .applyInPandas(_group, schema)
    )


class MmrReranker:
    """In-engine listwise reranker for the dynamic pipeline
    (plans/dynamic.PROVIDER_MAP ``reranker: mmr``): diversifies a
    fused candidate list using the candidates' own stored embeddings —
    no network, unlike the HTTP rerankers. Duck-typed via
    ``rerank_with_vectors(ids, rels, vecs) -> ids-in-pick-order`` (the
    text rerankers expose ``rerank(query, texts) -> index order``
    instead; run_search dispatches on which method exists)."""

    def __init__(self, lam: float = 0.5):
        if not 0.0 <= lam <= 1.0:
            raise ValueError(f"lam must be in [0, 1], got {lam}")
        self.lam = float(lam)

    def rerank_with_vectors(self, ids, rels, vecs) -> list:
        picks = mmr_select(
            list(ids),
            np.asarray(rels, dtype=np.float64),
            np.asarray(vecs, dtype=np.float64),
            len(ids),
            self.lam,
        )
        return [i for _, i, _ in picks]
