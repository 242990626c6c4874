"""IVF index build + probe-pruned ANN — the scale path for k-NN.

The reference delegates ANN to the vchordrq extension (RaBitQ-quantized
IVF; index DDL vechord/client.py:157-171, build config
vechord/spec.py:437-444 with ``lists`` centroids, query-time ``probes``
GUC defaulting to ceil(lists/16), vechord/client.py:285-292).

Spark-native rendition:

1. **Build** (batch job): sample vectors -> KMeans (MLlib) fits
   ``lists`` centroids -> every row gets a ``centroid_id`` column ->
   table rewritten partitioned/clustered by ``centroid_id``.
2. **Query**: compute the query's ``probes`` nearest centroids
   driver-side (centroids are tiny), then filter
   ``centroid_id IN (...)`` — which Catalyst turns into *partition
   pruning* when the table is laid out by centroid — and exact-score
   only the surviving rows.

This reproduces the IVF recall/latency trade-off with zero custom
physical operators: the pruning is the query predicate, the layout is
the index.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from vechord_spark.functions.vector import vector_distance


def default_probes(lists: int) -> int:
    """Reference default: ceil(lists / 16) (vechord/client.py:285-292)."""
    return max(1, math.ceil(lists / 16))


def with_int8_quantization(df: DataFrame, vec_col: str) -> DataFrame:
    """Attach per-row symmetric int8 quantization: ``__q`` (array of
    ints in [-127, 127]) + ``__qs`` (the scale). Dequantized value =
    q * scale. The estimate pass reads 1 byte/component instead of 4 —
    the RaBitQ-style bandwidth win (reference's vchordrq quantized scan,
    vechord/spec.py:437-444) — and stays a pure SQL expression."""
    v = F.col(vec_col)
    scale = F.greatest(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
        ),
        F.lit(1e-30),
    ) / F.lit(127.0)
    return df.withColumn("__qs", scale).withColumn(
        "__q",
        F.transform(v, lambda x: F.round(x.cast("double") / F.col("__qs")).cast("int")),
    )


class IvfIndex:
    """KMeans-IVF layout over one table's vector column."""

    def __init__(
        self,
        centroids: np.ndarray,
        assigned: DataFrame,
        vec_col: str,
        spherical: bool = False,
    ):
        self.centroids = centroids  # (lists, dim) float64
        self.assigned = assigned  # original columns + centroid_id
        self.vec_col = vec_col
        # spherical: cells were fit/assigned on UNIT-NORM vectors (the
        # correct coarse quantizer for cosine/dot search — L2 cells on
        # raw vectors split by magnitude, which cosine cannot see);
        # probing then normalizes the query the same way
        self.spherical = spherical

    @property
    def lists(self) -> int:
        return int(self.centroids.shape[0])

    def add(self, new_rows: DataFrame) -> "IvfIndex":
        """Incremental index maintenance: assign NEW vectors to the
        EXISTING centroids (no refit, no touch of old rows) and append.

        This is the production append path — a day's new embeddings
        cost one broadcast-argmin assignment scan of the new rows only;
        with the clustered parquet layout the append is
        ``write.mode("append").partitionBy("centroid_id")`` into the
        same directory, so probe pruning keeps working unchanged. The
        trade (standard for IVF): centroids drift from the true cluster
        means as inserts accumulate — recall on the *new* data decays
        slowly until a periodic refit; existing assignments never
        change, so old query results are stable.

        Reference parity: vechord keeps its pgvector IVF index updated
        on INSERT the same way (assignment only, refit is an explicit
        REINDEX).
        """
        fresh = assign_centroids(
            new_rows, self.vec_col, self.centroids, normalize=self.spherical
        )
        return IvfIndex(
            self.centroids,
            self.assigned.unionByName(fresh),
            self.vec_col,
            spherical=self.spherical,
        )

    def nearest_centroids(
        self,
        query: Sequence[float],
        probes: int,
        expand_margin: float = 0.0,
    ) -> list[int]:
        """The probe cell ids, nearest centroid first.

        ``expand_margin`` > 0 enables SOFT EXPANSION (default off):
        beyond the top-``probes`` cells, any cell whose centroid
        distance is within ``(1 + expand_margin)`` of the probes-th
        cell's distance is probed too. A query landing near a Voronoi
        boundary has several nearly-equidistant cells — the fixed
        probe count cuts them off arbitrarily, which is the dominant
        recall loss at small ``probes``; the margin admits exactly
        those near-ties and nothing else, so the extra scanned
        fraction is bounded and data-dependent (measured ≤2x at
        margin 0.2, BASELINE.md round-9) rather than a blanket
        probes-doubling."""
        q = np.asarray(query, dtype=np.float64)
        if self.spherical:
            q = q / max(float(np.linalg.norm(q)), 1e-30)
        d = np.linalg.norm(self.centroids - q, axis=1)
        order = np.argsort(d, kind="stable")
        n = min(probes, len(order))
        ids = list(order[:n])
        if expand_margin > 0.0 and ids and n < len(order):
            cutoff = float(d[ids[-1]]) * (1.0 + expand_margin)
            for i in order[n:]:
                if float(d[i]) > cutoff:
                    break  # order is sorted: nothing further qualifies
                ids.append(i)
        return [int(i) for i in ids]

    def search(
        self,
        query: Sequence[float],
        k: int = 10,
        probes: int | None = None,
        distance: str = "cos",
        select: Sequence[str] | None = None,
        tie_break: str | None = None,
        expand_margin: float = 0.0,
    ) -> DataFrame:
        """Probe-pruned approximate k-NN.

        The ``centroid_id.isin(...)`` filter is the probe: with the
        table written ``partitionBy("centroid_id")`` it becomes
        Catalyst partition pruning and only probes/lists of the data is
        read at all. ``expand_margin`` opts into soft expansion of
        near-tie cells (see ``nearest_centroids``).
        """
        if probes is None:
            probes = default_probes(self.lists)
        probe_ids = self.nearest_centroids(query, probes, expand_margin)
        pruned = self.assigned.filter(F.col("centroid_id").isin(probe_ids))
        scored = pruned.withColumn(
            "distance", vector_distance(distance, self.vec_col, list(query))
        )
        order = [F.col("distance").asc()]
        if tie_break:
            order.append(F.col(tie_break).asc())
        out = scored.orderBy(*order).limit(k)
        if select is not None:
            out = out.select(*select, "distance")
        return out

    def search_batch(
        self,
        queries: Sequence[Sequence[float]],
        k: int = 10,
        probes: int | None = None,
        distance: str = "cos",
        select: Sequence[str] | None = None,
        tie_break: str | None = None,
        expand_margin: float = 0.0,
    ) -> DataFrame:
        """Batched probe search: N queries answered in ONE pass over
        the UNION of their probed partitions — the production shape
        for evaluation runs and hard-negative mining, where a query
        STREAM hits the index. N separate ``search`` calls would plan
        N jobs and re-open the shared partitions N times; here the
        scan is amortized: each corpus row is read once and scored
        (vectorized, one matmul per Arrow batch) against exactly the
        queries whose probe set contains its cell, then one window
        takes per-query top-k. The per-partition ``rank <= k`` filter
        compiles to a partial WindowGroupLimit below the exchange
        (same optimizer rewrite knn_join pins), so the pair space
        never reaches the shuffle.

        Returns one frame: ``query_id`` (the position in ``queries``),
        the ``select`` columns (default: all non-vector columns), and
        ``distance``, top-k rows per query."""
        from pyspark.sql import Window
        from pyspark.sql import types as T
        from pyspark.sql.functions import pandas_udf

        if probes is None:
            probes = default_probes(self.lists)
        qm = np.asarray([list(q) for q in queries], dtype=np.float64)
        if qm.ndim != 2 or not len(qm):
            raise ValueError("queries must be a non-empty list of vectors")
        cell_to_q: dict[int, list[int]] = {}
        for qi in range(len(qm)):
            for c in self.nearest_centroids(qm[qi], probes, expand_margin):
                cell_to_q.setdefault(int(c), []).append(qi)
        pruned = self.assigned.filter(
            F.col("centroid_id").isin(sorted(cell_to_q))
        )

        kind = distance
        if kind not in ("l2", "cos", "dot"):
            raise ValueError(f"unknown distance {kind!r}")
        q_norm = np.sqrt((qm * qm).sum(axis=1))

        @pandas_udf(
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("qid", T.IntegerType()),
                        T.StructField("d", T.DoubleType()),
                    ]
                )
            )
        )
        def _score(cids: pd.Series, vecs: pd.Series) -> pd.Series:
            x = np.array(vecs.tolist(), dtype=np.float64)
            cid = cids.to_numpy()
            res: list = [None] * len(x)
            for c in np.unique(cid):
                qs = cell_to_q.get(int(c))
                mask = cid == c
                rows_idx = np.flatnonzero(mask)
                if not qs:
                    for ri in rows_idx:
                        res[ri] = []
                    continue
                sub = x[mask]
                qsub = qm[qs]
                dots = sub @ qsub.T  # (rows, nq)
                if kind == "dot":
                    d = -dots
                elif kind == "cos":
                    xn = np.sqrt((sub * sub).sum(axis=1))
                    d = 1.0 - dots / (
                        np.maximum(xn, 1e-300)[:, None] * q_norm[qs][None, :]
                    )
                else:  # l2
                    xn2 = (sub * sub).sum(axis=1)
                    qn2 = (qsub * qsub).sum(axis=1)
                    d = np.sqrt(
                        np.maximum(
                            xn2[:, None] - 2.0 * dots + qn2[None, :], 0.0
                        )
                    )
                for ri, drow in zip(rows_idx, d):
                    res[ri] = [
                        {"qid": int(q), "d": float(v)}
                        for q, v in zip(qs, drow)
                    ]
            return pd.Series(res)

        keep = (
            list(select)
            if select is not None
            else [c for c in pruned.columns if c not in (self.vec_col, "centroid_id")]
        )
        scored = (
            pruned.withColumn(
                "__hits", _score(F.col("centroid_id"), F.col(self.vec_col))
            )
            .select(*keep, F.explode("__hits").alias("__h"))
            .select(
                F.col("__h.qid").alias("query_id"),
                *keep,
                F.col("__h.d").alias("distance"),
            )
        )
        order = [F.col("distance").asc()]
        if tie_break:
            order.append(F.col(tie_break).asc())
        w = Window.partitionBy("query_id").orderBy(*order)
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    def search_refined(
        self,
        query: Sequence[float],
        k: int = 10,
        probes: int | None = None,
        refine: int = 1000,
        distance: str = "cos",
        select: Sequence[str] | None = None,
        tie_break: str | None = None,
        expand_margin: float = 0.0,
    ) -> DataFrame:
        """Two-phase probe search: int8-quantized ESTIMATE pass picks
        ``refine`` candidates, exact distances rerank them to top-k —
        the RaBitQ estimate->rerank recipe; ``refine`` is the engine's
        rendition of the ``maxsim_refine``/full-precision budget GUC
        (reference default 1000, vechord/registry.py:233).

        With ``refine`` >= the probed row count this equals ``search``.
        ``expand_margin``: near-tie soft expansion, see
        ``nearest_centroids``.
        """
        if probes is None:
            probes = default_probes(self.lists)
        probe_ids = self.nearest_centroids(query, probes, expand_margin)
        pruned = with_int8_quantization(
            self.assigned.filter(F.col("centroid_id").isin(probe_ids)), self.vec_col
        )
        # estimate: dot on dequantized int8 (negated -> ascending);
        # for l2/cos ordering the (negative) dot estimate is a proxy -
        # the exact pass fixes ranks inside the refine budget
        q = list(query)
        est = -(
            F.aggregate(
                F.zip_with(
                    F.col("__q"),
                    F.lit([float(x) for x in q]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            * F.col("__qs")
        )
        order = [F.col("__est").asc()]
        if tie_break:
            order.append(F.col(tie_break).asc())
        candidates = pruned.withColumn("__est", est).orderBy(*order).limit(refine)
        scored = candidates.withColumn(
            "distance", vector_distance(distance, self.vec_col, q)
        ).drop("__q", "__qs", "__est")
        final_order = [F.col("distance").asc()]
        if tie_break:
            final_order.append(F.col(tie_break).asc())
        out = scored.orderBy(*final_order).limit(k)
        if select is not None:
            out = out.select(*select, "distance")
        return out

    def write_clustered(self, path: str) -> None:
        """Persist the table partitioned by centroid_id — the physical
        index layout; probe filters then prune whole directories."""
        self.assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def build_ivf(
    df: DataFrame,
    vec_col: str,
    lists: int,
    sample_fraction: float | None = None,
    seed: int = 42,
    max_iter: int = 8,
    fit_method: str = "sample",
    max_train_points: int = 100_000,
    spherical: bool = False,
) -> IvfIndex:
    """Fit ``lists`` KMeans centroids and assign every row.

    ``fit_method="sample"`` (default) fits centroids DRIVER-SIDE on a
    bounded sample (seeded kmeans++ init + Lloyd, shared with the PQ
    codebook trainer) — the FAISS convention: coarse-quantizer quality
    saturates at a few hundred training points per list, so the fit
    never needs to be distributed; only the *assignment* pass scans the
    corpus. ``max_train_points`` caps the collect (100k x 64 dims is
    ~50 MB driver memory); ``sample_fraction`` additionally thins the
    scan before the limit at cluster scale. This replaced an MLlib
    k-means|| fit that spent ~12 sequential barrier jobs (init rounds +
    iterations) regardless of data size — 3.8 s of pure scheduling
    overhead on a 2k-row corpus for identical recall.

    ``fit_method="mllib"`` keeps the distributed fit for configurations
    where the bounded sample genuinely can't represent the space
    (lists in the tens of thousands with high-variance corpora).

    BEHAVIOR NOTE (changed in round 5): the default fit moved from
    MLlib k-means|| to this driver-side sample fit. Measured effect at
    sf0.01: identical recall at default probes on the full training
    set, but a low-probe configuration (probes=4 of 64 lists) saw
    recall drop 0.7 -> 0.4 because fewer, less-converged centroids
    shift the list boundaries — raise ``probes`` or pass
    ``fit_method="mllib"`` to recover the old behavior. The training
    sample is made partitioning-independent by ordering on
    ``xxhash64(vec)`` before the limit (a per-partition top-K merge,
    not a full sort), so a fixed seed gives the same centroids on any
    cluster layout.

    Assignment is a broadcast of the centroid matrix + a vectorized
    argmin pass — one scan, no shuffle. Deterministic via fixed seed.
    IVF centroids don't need converged clustering — a few Lloyd
    iterations is plenty (the probe search can't observe residual
    convergence).
    """
    train = df.select(F.col(vec_col).alias("__vec"))
    if spherical and fit_method != "sample":
        raise ValueError("spherical fit is only supported with fit_method='sample'")
    if sample_fraction and sample_fraction < 1.0:
        train = train.sample(fraction=sample_fraction, seed=seed)
    if fit_method == "sample":
        from vechord_spark.operators.pq import _lloyd

        # hash-ordered limit: limit() alone takes whichever partitions
        # answer first, so the training set (and thus the centroids)
        # would depend on cluster layout. Ordering by xxhash64(vec)
        # compiles to TakeOrderedAndProject (per-partition top-K +
        # driver merge, no full sort) and is deterministic everywhere.
        sampled = (
            train.orderBy(F.xxhash64(F.col("__vec")).asc())
            .limit(max_train_points)
        )
        x = np.array(
            [r["__vec"] for r in sampled.collect()],
            dtype=np.float64,
        )
        if x.shape[0] == 0:
            raise ValueError("cannot build an IVF index on an empty DataFrame")
        if spherical:
            # unit-normalize the collected sample DRIVER-side: the
            # hash-ordered sample is taken on the RAW vectors, so the
            # training set is identical to a non-spherical build and
            # only the geometry changes; the stored rows stay raw
            # (cosine scoring is norm-invariant, layout byte-compatible)
            x = x / np.maximum(
                np.linalg.norm(x, axis=1, keepdims=True), 1e-30
            )
        # driver-side fitting is ~free at bounded sample sizes, so buy
        # quality with restarts: best-of-3 seedings by inertia (kmeans++
        # can seed badly on small k) and a deeper Lloyd run than the
        # distributed path could afford
        k = min(lists, x.shape[0])
        best, best_inertia = None, np.inf
        for restart in range(3):
            rng = np.random.default_rng(seed + restart)
            c = _lloyd(x, k, rng, max(max_iter, 25), pad_to=lists)
            d2 = (
                (x * x).sum(axis=1)[:, None]
                - 2.0 * x @ c.T
                + (c * c).sum(axis=1)[None, :]
            )
            inertia = d2.min(axis=1).sum()
            if inertia < best_inertia:
                best, best_inertia = c, inertia
        centroids = best
    elif fit_method == "mllib":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        fit_in = train.withColumn("features", array_to_vector("__vec"))
        km = KMeans(k=lists, seed=seed, maxIter=max_iter, initMode="k-means||")
        model = km.fit(fit_in)
        centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
    else:
        raise ValueError(f"unknown fit_method {fit_method!r}")

    # assignment via broadcast argmin — avoids a second MLlib transform
    # pass; Arrow-batched matmul handles lists in the thousands where a
    # per-centroid SQL expression tree would blow up codegen. The
    # per-row pass is spread to session parallelism (parallel.spread —
    # no-op on wide inputs); the FIT input is left untouched so the
    # k-means|| init, which is partition-order sensitive, stays
    # deterministic for a given file layout.
    from vechord_spark.parallel import spread

    assigned = assign_centroids(
        spread(df), vec_col, centroids, normalize=spherical
    )
    return IvfIndex(centroids, assigned, vec_col, spherical=spherical)


class MultiVecIvfIndex:
    """IVF for MULTIVECTOR columns — the ``MultiVectorIndex`` analog
    (reference vechord/spec.py:447-464): centroids are fit over each
    row's mean vector, probe pruning selects candidate rows by the
    centroids nearest to ANY query vector, and exact MaxSim (optionally
    int8-free mean-estimate refine, operators/maxsim.py) reranks the
    survivors. With the table written ``partitionBy(centroid_id)`` the
    probe filter is partition pruning, exactly like the single-vector
    index."""

    def __init__(self, inner: IvfIndex, mv_col: str, token_centroids=None):
        self.inner = inner  # vec_col = "__mean"; assigned keeps mv_col
        self.mv_col = mv_col
        # token-space centroids for the centroid-interaction refine
        # estimate (opt-in, build_multivec_ivf(token_lists=...))
        self.token_centroids = token_centroids

    @property
    def lists(self) -> int:
        return self.inner.lists

    def probe_ids(
        self, query_vectors: Sequence[Sequence[float]], probes: int
    ) -> list[int]:
        """Union of the ``probes`` nearest centroids per query vector —
        every query vector gets its own probe set because late-
        interaction queries are multi-faceted by design."""
        ids: list[int] = []
        for q in query_vectors:
            for c in self.inner.nearest_centroids(q, probes):
                if c not in ids:
                    ids.append(c)
        return ids

    def search(
        self,
        query_vectors: Sequence[Sequence[float]],
        k: int = 10,
        probes: int | None = None,
        refine: int | None = None,
        select: Sequence[str] | None = None,
        tie_break: str | None = None,
    ) -> DataFrame:
        from vechord_spark.operators.maxsim import maxsim_topk, maxsim_topk_refined

        if probes is None:
            probes = default_probes(self.lists)
        ids = self.probe_ids(query_vectors, probes)
        pruned = self.inner.assigned.filter(F.col("centroid_id").isin(ids)).drop(
            "centroid_id", "__mean"
        )
        qs = [list(q) for q in query_vectors]
        if refine is not None:
            if (
                self.token_centroids is not None
                and "__centroid_ids" in pruned.columns
            ):
                # centroid-interaction phase 1 (PLAID-style): per-doc
                # TOKEN-centroid sets stored at build time make the
                # estimate |Q| inlined-table lookups per row
                return maxsim_topk_refined(
                    pruned, self.mv_col, qs, k=k, refine=refine,
                    select=select, tie_break=tie_break,
                    centroids=self.token_centroids,
                    centroid_ids_col="__centroid_ids",
                )
            return maxsim_topk_refined(
                pruned.drop("__centroid_ids"), self.mv_col, qs, k=k,
                refine=refine, select=select, tie_break=tie_break,
            )
        return maxsim_topk(
            pruned.drop("__centroid_ids"), self.mv_col, qs, k=k,
            select=select, tie_break=tie_break,
        )

    def search_batch(
        self,
        queries: Sequence[Sequence[Sequence[float]]],
        k: int = 10,
        probes: int | None = None,
        select: Sequence[str] | None = None,
        tie_break: str | None = None,
    ) -> DataFrame:
        """Batched MaxSim probe search — the multivector twin of
        :meth:`IvfIndex.search_batch`: every query's probe set (union
        over its token vectors) is computed driver-side, ONE scan
        covers the union of all probed partitions, each row's token
        matrix stacks once per Arrow batch and scores against exactly
        the queries whose probe set contains its cell, and one window
        takes per-query top-k. Returns ``query_id`` + ``select``
        columns + ``maxsim_distance``."""
        from pyspark.sql import Window
        from pyspark.sql import types as T
        from pyspark.sql.functions import pandas_udf

        if probes is None:
            probes = default_probes(self.lists)
        qlist = [
            np.asarray([list(v) for v in q], dtype=np.float64)
            for q in queries
        ]
        if not qlist:
            raise ValueError("queries must be a non-empty list of multivectors")
        cell_to_q: dict[int, list[int]] = {}
        for qi, q in enumerate(qlist):
            for c in self.probe_ids(q, probes):
                qs = cell_to_q.setdefault(int(c), [])
                if qi not in qs:
                    qs.append(qi)
        pruned = self.inner.assigned.filter(
            F.col("centroid_id").isin(sorted(cell_to_q))
        )

        @pandas_udf(
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("qid", T.IntegerType()),
                        T.StructField("d", T.DoubleType()),
                    ]
                )
            )
        )
        def _score(cids: pd.Series, docs: pd.Series) -> pd.Series:
            out = []
            for cid, dv in zip(cids.to_numpy(), docs):
                qs = cell_to_q.get(int(cid), [])
                if not qs:
                    out.append([])
                    continue
                dm = np.asarray(
                    [np.asarray(t, dtype=np.float64) for t in dv]
                )
                out.append(
                    [
                        {
                            "qid": int(qi),
                            "d": float(-(qlist[qi] @ dm.T).max(axis=1).sum()),
                        }
                        for qi in qs
                    ]
                )
            return pd.Series(out)

        internal = {self.mv_col, "centroid_id", "__mean", "__centroid_ids"}
        keep = (
            list(select)
            if select is not None
            else [c for c in pruned.columns if c not in internal]
        )
        scored = (
            pruned.withColumn(
                "__hits", _score(F.col("centroid_id"), F.col(self.mv_col))
            )
            .select(*keep, F.explode("__hits").alias("__h"))
            .select(
                F.col("__h.qid").alias("query_id"),
                *keep,
                F.col("__h.d").alias("maxsim_distance"),
            )
        )
        order = [F.col("maxsim_distance").asc()]
        if tie_break:
            order.append(F.col(tie_break).asc())
        w = Window.partitionBy("query_id").orderBy(*order)
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    def write_clustered(self, path: str) -> None:
        self.inner.write_clustered(path)


def build_multivec_ivf(
    df: DataFrame,
    mv_col: str,
    lists: int,
    sample_fraction: float | None = None,
    seed: int = 42,
    max_iter: int = 8,
    token_lists: int | None = None,
) -> MultiVecIvfIndex:
    """Fit IVF centroids over per-row MEAN vectors of a multivector
    column and assign every row. The mean is a pure SQL expression
    (operators/maxsim.mean_vector) so the only Python is the KMeans fit
    + Arrow argmin assignment, same as the single-vector path.

    ``token_lists`` additionally fits a SECOND KMeans over the exploded
    TOKEN vectors and stores each row's distinct token-centroid set
    (``__centroid_ids``) for the centroid-interaction refine estimate
    (PLAID/ColBERTv2's candidate-scoring idea). Opt-in: measured on the
    synthetic corpus (100 docs, refine=50) it lifts recall on
    facet-cancelling queries the doc-mean estimate handles worst
    (0.5 -> 0.7 at token_lists=32) but LOSES to the mean on
    cluster-aligned corpus queries (1.0 -> 0.7) — token quantization
    error dominates until the centroid count grows; pick it for
    adversarial/multi-facet query mixes, skip it when queries resemble
    corpus points. Token centroids must NOT be confused with the
    mean-space centroids: assigning tokens to mean-space centroids
    measured 0.3 recall on the same setup."""
    from vechord_spark.operators.maxsim import mean_vector

    withmean = df.withColumn("__mean", mean_vector(mv_col))
    inner = build_ivf(
        withmean, "__mean", lists,
        sample_fraction=sample_fraction, seed=seed, max_iter=max_iter,
    )
    token_centroids = None
    if token_lists is not None:
        toks = df.select(F.explode(F.col(mv_col)).alias("__tok"))
        token_centroids = build_ivf(
            toks, "__tok", token_lists,
            sample_fraction=sample_fraction, seed=seed, max_iter=max_iter,
        ).centroids
        inner.assigned = inner.assigned.withColumn(
            "__centroid_ids", token_centroid_ids(mv_col, token_centroids)
        )
    return MultiVecIvfIndex(inner, mv_col, token_centroids=token_centroids)


def token_centroid_ids(mv_col: str, centroids: np.ndarray):
    """Array Column of the distinct centroid ids nearest to each of a
    row's token vectors (sorted ascending). Same broadcast-matmul
    argmin as assign_centroids, batched over the flattened token set
    so the per-doc loop does no linear algebra."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    c = centroids.astype(np.float64)
    c_sq = (c * c).sum(axis=1)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def _ids(docs: pd.Series) -> pd.Series:
        lens = [len(d) for d in docs]
        if sum(lens) == 0:
            return pd.Series([[] for _ in lens])
        flat = np.array(
            [list(v) for doc in docs for v in doc], dtype=np.float64
        )
        nearest = np.argmin(flat @ c.T * -2.0 + c_sq[None, :], axis=1)
        out, pos = [], 0
        for n in lens:
            out.append(np.unique(nearest[pos : pos + n]).astype("int32").tolist())
            pos += n
        return pd.Series(out)

    return _ids(F.col(mv_col))


def assign_centroids(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    normalize: bool = False,
) -> DataFrame:
    """Attach ``centroid_id`` = argmin_c L2(vec, centroid_c).

    The centroid matrix rides into executors inside the UDF closure
    (broadcast); per batch the argmin is one matmul:
    ||x-c||^2 = |x|^2 - 2 x.c + |c|^2 (|x|^2 constant per row -> drop).

    ``normalize``: unit-normalize each row before the distance (the
    spherical-IVF assignment — centroids were fit on normalized
    vectors, see ``build_ivf(spherical=True)``).
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    c = centroids.astype(np.float64)
    c_sq = (c * c).sum(axis=1)

    @pandas_udf(T.IntegerType())
    def _assign(vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=np.float64)
        if normalize:
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        scores = x @ c.T * -2.0 + c_sq[None, :]
        return pd.Series(np.argmin(scores, axis=1).astype(np.int32))

    return df.withColumn("centroid_id", _assign(F.col(vec_col)))


def assign_centroids_multi(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    n_assign: int = 2,
    normalize: bool = False,
) -> DataFrame:
    """Attach ``centroid_ids`` = the ``n_assign`` nearest centroids,
    nearest first — MULTI-ASSIGNMENT bucketing for candidate
    generation (SemDeDup's boundary-pair fix: a vector that sits
    between two cells lands in both, so near-duplicate pairs split by
    the Voronoi boundary still share a bucket). Candidate volume grows
    by at most ``n_assign``x rows per bucket (comparisons by
    ~n_assign² within the enlarged buckets); recall of true
    near-duplicate pairs jumps because boundary splits — the dominant
    loss mode of single-assignment at small ``lists`` — are recovered.
    Same closure-broadcast matmul as :func:`assign_centroids`; ties
    broken by centroid id (stable argsort) so assignment is
    deterministic. The search-time analog is probing multiple cells
    (IvfIndex.search ``probes``; reference vchordrq probes,
    vechord/client.py:285-292) — this is the build-side counterpart.
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    c = centroids.astype(np.float64)
    c_sq = (c * c).sum(axis=1)
    n_take = min(n_assign, len(c))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def _assign(vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=np.float64)
        if normalize:
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        scores = x @ c.T * -2.0 + c_sq[None, :]
        top = np.argsort(scores, axis=1, kind="stable")[:, :n_take]
        return pd.Series([row.astype(np.int32).tolist() for row in top])

    return df.withColumn("centroid_ids", _assign(F.col(vec_col)))
