"""Product quantization (PQ) — the memory-bound ANN scale path.

The reference's vchordrq index couples IVF pruning with RaBitQ bit
quantization (build config vechord/spec.py:437-444,
``residual_quantization``); the engine's IVF (operators/ivf.py) already
ships the int8 per-row analog. PQ is the stronger, codebook-based
compression the same literature family standardized (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011; FAISS
``IVF*,PQ*``): split the vector into ``m`` subspaces, k-means each
subspace into ``ksub`` codes, store ``m`` small ints per vector —
``m*nbits/8`` bytes instead of ``4*dim`` — and score candidates with an
asymmetric distance computation (ADC): a per-query lookup table of
``m x ksub`` partial distances, summed by code id, never touching the
original floats.

Why it matters at 100 TB: the estimate pass reads codes (e.g. 8-16
bytes/vector for dim=64-768) instead of the float column — a 16-64x
scan-bandwidth cut on exactly the pass that touches the most rows. The
exact-refine pass then reads full vectors for only the ``refine``
survivors. Plan honesty: the single-scan :meth:`IvfPqIndex.search`
carries the float column through the estimate scan (one job, right
for page-cached local work); the bandwidth cut is REALIZED by the
two-scan shape — :meth:`IvfPqIndex.estimate_topk` (codes-only
ReadSchema) followed by a pushed pk-IN float read, which is what
registry.search_by_vector runs on quantized layouts.

Scale shape: training = ``m`` bounded-sample KMeans fits; encoding =
one Arrow-batched pass (codebooks broadcast in the UDF closure, one
matmul per subspace per batch); search = [optional IVF probe prune] ->
ADC estimate (LUT broadcast, one ``np.take`` sum per batch) ->
``TakeOrderedAndProject`` refine -> exact rerank. No shuffle anywhere
except the final top-k merge.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from vechord_spark.functions.vector import vector_distance


class PqCodebook:
    """``m`` subspace codebooks of shape (m, ksub, dsub)."""

    def __init__(self, codebooks: np.ndarray):
        if codebooks.ndim != 3:
            raise ValueError("codebooks must be (m, ksub, dsub)")
        self.codebooks = codebooks.astype(np.float64)

    @property
    def m(self) -> int:
        return int(self.codebooks.shape[0])

    @property
    def ksub(self) -> int:
        return int(self.codebooks.shape[1])

    @property
    def dsub(self) -> int:
        return int(self.codebooks.shape[2])

    @property
    def dim(self) -> int:
        return self.m * self.dsub

    def code_bytes(self) -> int:
        """Storage per vector: m codes of ceil(log2 ksub) bits."""
        return math.ceil(self.m * max(1, (self.ksub - 1).bit_length()) / 8)

    def lookup_table(self, query: Sequence[float], kind: str = "l2") -> np.ndarray:
        """ADC lookup table (m, ksub): partial distance from each query
        subvector to each code. ``l2`` -> squared L2 per subspace (sums
        to the exact squared distance to the RECONSTRUCTED vector);
        ``dot`` -> negative partial inner product (ascending = best,
        pgvector ``<#>`` sign convention, reference spec.py:433-435)."""
        q = np.asarray(query, dtype=np.float64).reshape(self.m, self.dsub)
        if kind == "l2":
            diff = self.codebooks - q[:, None, :]
            return (diff * diff).sum(axis=2)
        if kind == "dot":
            return -(self.codebooks * q[:, None, :]).sum(axis=2)
        raise ValueError(f"unknown ADC kind: {kind!r}")

    def reconstruct(self, codes: Sequence[int]) -> np.ndarray:
        return np.concatenate(
            [self.codebooks[j, int(c)] for j, c in enumerate(codes)]
        )


def train_pq(
    df: DataFrame,
    vec_col: str,
    m: int = 8,
    ksub: int = 256,
    sample_fraction: float | None = None,
    seed: int = 42,
    max_iter: int = 8,
    max_train_points: int = 100_000,
) -> PqCodebook:
    """Fit per-subspace codebooks on a BOUNDED sample, trained
    driver-side (seeded kmeans++ init + Lloyd, all ``m`` subspaces
    vectorized in one pass).

    Codebook training is the one deliberately non-distributed step —
    the FAISS convention: PQ codebooks are always fit on a bounded
    in-memory sample (FAISS defaults to ~256 points/code) because at
    ``ksub=256`` codes a few hundred thousand training rows saturate
    estimator quality regardless of corpus size. The *corpus-sized*
    passes (encode, ADC) stay distributed. ``max_train_points`` caps
    the collect; ``sample_fraction`` additionally thins the scan before
    the limit at cluster scale. Deterministic for a fixed seed
    (pure numpy, no partition-order sensitivity beyond the ``limit``
    sample, which is itself deterministic for a fixed file layout).
    8 sequential MLlib fits measured 5x slower on the same data for
    zero quality gain — per-subspace KMeans at dsub<=16 dims is
    arithmetic, not a scale problem.
    """
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("cannot train PQ on an empty DataFrame")
    dim = int(first["d"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    base = df.select(F.col(vec_col).alias("__vec"))
    if sample_fraction and sample_fraction < 1.0:
        base = base.sample(fraction=sample_fraction, seed=seed)
    sample = np.array(
        [r["__vec"] for r in base.limit(max_train_points).collect()],
        dtype=np.float64,
    ).reshape(-1, m, dsub)

    rng = np.random.default_rng(seed)
    return PqCodebook(_fit_books_np(sample, m, ksub, rng, max_iter))


def _lloyd(
    x: np.ndarray,
    k: int,
    rng: np.random.Generator,
    max_iter: int,
    pad_to: int,
    init: np.ndarray | None = None,
) -> np.ndarray:
    """Seeded kmeans++ init + Lloyd iterations; pads degenerate
    codebooks (fewer distinct points than codes) by repeating the last
    centroid so the codebook shape stays (pad_to, dsub). ``init``
    skips the seeding and WARM-STARTS Lloyd from the given centroids
    (the OPQ alternation's coordinate-descent contract: each books
    update starts from the previous iteration's books, so the shared
    objective can only go down)."""
    n = x.shape[0]
    if init is not None:
        c = np.asarray(init, dtype=np.float64).copy()[:k]
    else:
        # kmeans++ seeding
        cents = [x[rng.integers(n)]]
        d2 = ((x - cents[0]) ** 2).sum(axis=1)
        for _ in range(1, k):
            total = d2.sum()
            if total <= 0:
                break
            cents.append(x[rng.choice(n, p=d2 / total)])
            d2 = np.minimum(d2, ((x - cents[-1]) ** 2).sum(axis=1))
        c = np.array(cents)
    for _ in range(max_iter):
        assign = np.argmin(
            (x * x).sum(axis=1)[:, None] - 2.0 * x @ c.T + (c * c).sum(axis=1)[None, :],
            axis=1,
        )
        newc = c.copy()
        for i in range(c.shape[0]):
            mask = assign == i
            if mask.any():
                newc[i] = x[mask].mean(axis=0)
        if np.allclose(newc, c):
            c = newc
            break
        c = newc
    if c.shape[0] < pad_to:
        c = np.vstack([c, np.repeat(c[-1:], pad_to - c.shape[0], axis=0)])
    return c


def encode_pq(
    df: DataFrame,
    vec_col: str,
    book: PqCodebook,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Attach ``__pq``: array<int> of ``m`` code ids. Codebooks ride
    into executors in the UDF closure; per batch the encode is one
    matmul per subspace (argmin via the expanded-norm trick, same as
    ivf.assign_centroids).

    With ``centroids`` (the IVF centroid matrix), encodes the
    RESIDUAL ``x - centroid[centroid_id]`` instead of the raw vector —
    the FAISS IVFPQ default (``encode_residual``): within a cell the
    residuals have far less variance than the raw vectors, so the
    same code budget quantizes sharper. ``df`` must then carry
    ``centroid_id``."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    cb = book.codebooks
    m, dsub = book.m, book.dsub
    c_sq = (cb * cb).sum(axis=2)  # (m, ksub)

    def _codes(x: np.ndarray) -> pd.Series:
        xs = x.reshape(len(x), m, dsub)
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            scores = xs[:, j, :] @ cb[j].T * -2.0 + c_sq[j][None, :]
            codes[:, j] = np.argmin(scores, axis=1)
        return pd.Series(list(codes))

    if centroids is None:

        @pandas_udf(T.ArrayType(T.IntegerType()))
        def _encode(vecs: pd.Series) -> pd.Series:
            return _codes(np.array(vecs.tolist(), dtype=np.float64))

        return df.withColumn("__pq", _encode(F.col(vec_col)))

    cents = np.asarray(centroids, dtype=np.float64)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def _encode_res(cids: pd.Series, vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=np.float64)
        return _codes(x - cents[cids.to_numpy()])

    return df.withColumn(
        "__pq", _encode_res(F.col("centroid_id"), F.col(vec_col))
    )


def adc_estimate(book: PqCodebook, query: Sequence[float], kind: str = "l2") -> Column:
    """Column: ADC partial-distance sum over the ``__pq`` codes —
    ``sum_j lut[j, code_j]``. The (m, ksub) LUT is computed driver-side
    per query (tiny) and broadcast in the UDF closure; per batch the
    scoring is one ``np.take_along_axis`` + row sum, no linear algebra."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    lut = book.lookup_table(query, kind)

    @pandas_udf(T.DoubleType())
    def _adc(codes: pd.Series) -> pd.Series:
        c = np.array(codes.tolist(), dtype=np.int64)
        return pd.Series(
            np.take_along_axis(lut.T, c, axis=0).sum(axis=1)
        )

    return _adc(F.col("__pq"))


def train_pq_residual(
    assigned: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    m: int = 8,
    ksub: int = 256,
    sample_fraction: float | None = None,
    seed: int = 42,
    max_iter: int = 8,
    max_train_points: int = 100_000,
) -> PqCodebook:
    """Fit codebooks on IVF RESIDUALS ``x - centroid[centroid_id]`` —
    the training half of the FAISS IVFPQ default. Same bounded
    driver-side sample contract as :func:`train_pq`; ``assigned`` is
    an IVF assignment frame (carries ``centroid_id``)."""
    first = assigned.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("cannot train PQ on an empty DataFrame")
    dim = int(first["d"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    base = assigned.select(
        F.col("centroid_id").alias("__cid"), F.col(vec_col).alias("__vec")
    )
    if sample_fraction and sample_fraction < 1.0:
        base = base.sample(fraction=sample_fraction, seed=seed)
    rows = base.limit(max_train_points).collect()
    cents = np.asarray(centroids, dtype=np.float64)
    x = np.array([r["__vec"] for r in rows], dtype=np.float64) - cents[
        np.array([r["__cid"] for r in rows], dtype=np.int64)
    ]
    rng = np.random.default_rng(seed)
    return PqCodebook(
        _fit_books_np(x.reshape(-1, m, dim // m), m, ksub, rng, max_iter)
    )


def build_ivf_rpq(
    df: DataFrame,
    vec_col: str,
    lists: int,
    m: int = 8,
    ksub: int = 256,
    seed: int = 42,
    max_iter: int = 8,
) -> IvfPqIndex:
    """IVF + RESIDUAL PQ, composed the FAISS-default way
    (``IVF{lists},PQ{m}`` with ``encode_residual``): cluster, then
    quantize each vector's OFFSET from its cell centroid. Residuals
    carry only the within-cell variance, so the same (m, ksub) budget
    reconstructs markedly sharper than raw-vector PQ on clustered
    data — the estimate gets closer to exact and the refine budget
    buys more recall. Raw-L2 cells only (a spherical coarse quantizer
    fits centroids in unit-norm space, where raw-vector offsets are
    not meaningful residuals)."""
    from vechord_spark.operators.ivf import build_ivf

    ivf = build_ivf(df, vec_col, lists=lists, seed=seed)
    book = train_pq_residual(
        ivf.assigned, vec_col, ivf.centroids, m=m, ksub=ksub,
        seed=seed, max_iter=max_iter,
    )
    return IvfPqIndex(ivf, book, residual=True)


def adc_estimate_residual(
    book: PqCodebook,
    query: Sequence[float],
    centroids: np.ndarray,
    probe_ids: Sequence[int],
    kind: str = "l2",
) -> Column:
    """ADC over RESIDUAL codes: per probed CELL the lookup table
    shifts by the cell centroid. ``l2`` builds one (m, ksub) LUT per
    probed cell from ``q - centroid_c`` — the sum is then the exact
    squared distance to the reconstruction ``c + r̂``; ``dot`` shares
    one residual LUT (``-q·r̂`` partials) across cells and adds the
    per-cell ``-q·c`` offset. Probes are ≤ tens of cells, so the LUT
    dict is tiny and rides in the UDF closure like the plain one."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query, dtype=np.float64)
    cents = np.asarray(centroids, dtype=np.float64)
    if kind == "l2":
        luts = {int(c): book.lookup_table(q - cents[int(c)], "l2") for c in probe_ids}
        offs = {int(c): 0.0 for c in probe_ids}
    elif kind == "dot":
        base = book.lookup_table(q, "dot")
        luts = {int(c): base for c in probe_ids}
        offs = {int(c): float(-(q * cents[int(c)]).sum()) for c in probe_ids}
    else:
        raise ValueError(f"unknown ADC kind: {kind!r}")

    @pandas_udf(T.DoubleType())
    def _adc(cids: pd.Series, codes: pd.Series) -> pd.Series:
        c = np.array(codes.tolist(), dtype=np.int64)
        cid = cids.to_numpy()
        out = np.empty(len(c), dtype=np.float64)
        for cc in np.unique(cid):
            mask = cid == cc
            out[mask] = (
                np.take_along_axis(luts[int(cc)].T, c[mask], axis=0).sum(axis=1)
                + offs[int(cc)]
            )
        return pd.Series(out)

    return _adc(F.col("centroid_id"), F.col("__pq"))


class IvfPqIndex:
    """IVF probe pruning + PQ-ADC estimate + exact refine — the full
    FAISS ``IVF{lists},PQ{m}`` recipe as a DataFrame plan: partition
    pruning (probe filter) -> code-column scan (ADC) -> float-column
    scan for ``refine`` rows only."""

    def __init__(
        self,
        ivf,
        book: PqCodebook,
        encoded: DataFrame | None = None,
        residual: bool = False,
    ):
        self.ivf = ivf  # operators.ivf.IvfIndex
        self.book = book
        # residual=True: __pq encodes x - centroid[cell] (FAISS IVFPQ
        # default); the ADC shifts its LUT per probed cell. NOTE the
        # registry's persisted layouts stay raw-vector PQ on purpose —
        # recluster/merge move rows between cells by pure rename/
        # hardlink, which is only sound when codes are cell-independent
        self.residual = residual
        # pass a pre-encoded frame (e.g. the persisted clustered layout,
        # which already carries __pq) to skip the encode pass on load
        self.encoded = (
            encoded
            if encoded is not None
            else encode_pq(
                ivf.assigned,
                ivf.vec_col,
                book,
                centroids=ivf.centroids if residual else None,
            )
        )

    def search_batch(
        self,
        queries: Sequence[Sequence[float]],
        k: int = 10,
        probes: int | None = None,
        refine: int = 100,
        distance: str = "cos",
        select: Sequence[str] | None = None,
        tie_break: str | None = None,
    ) -> DataFrame:
        """Batched two-phase search: N queries from ONE scan of the
        probed CODE partitions — the PQ member of the batch family
        (IvfIndex.search_batch is the float twin). Per Arrow batch the
        ADC estimate scores each row against exactly the queries
        probing its cell, a per-query window keeps ``refine``
        candidates, the float column is read for only those survivor
        rows, and a second per-query window takes top-k.

        Residual layouts stay O(N·m·ksub) driver state instead of the
        naive O(N·probes·m·ksub) per-(query, cell) tables: the
        residual l2 LUT decomposes as
        ``||(q-c) - r̂||² = ||q - r̂||²(per-query LUT) +
        2·c·r̂(per-cell LUT) + (||c||² - 2·q·c)(scalar)``,
        so the closure carries one LUT per query, one per probed cell,
        and an (N × cells) scalar grid. Same estimate → refine → exact
        contract as :meth:`search`; N=64 batch==loop equality pinned in
        tests/test_batch_amortization.py. The batch plan is
        SINGLE-SCAN (floats ride the estimate scan — no second read);
        for a disk-bound corpus that needs the codes-only estimate
        scan, chunk the query stream through the registry single
        path's two-scan refine (:meth:`estimate_topk`)."""
        from pyspark.sql import Window
        from pyspark.sql import types as T
        from pyspark.sql.functions import pandas_udf

        from vechord_spark.operators.ivf import default_probes

        if probes is None:
            probes = default_probes(self.ivf.lists)
        qm = np.asarray([list(q) for q in queries], dtype=np.float64)
        if qm.ndim != 2 or not len(qm):
            raise ValueError("queries must be a non-empty list of vectors")
        cell_to_q: dict[int, list[int]] = {}
        for qi in range(len(qm)):
            for c in self.ivf.nearest_centroids(qm[qi], probes):
                cell_to_q.setdefault(int(c), []).append(qi)
        pruned = self.encoded.filter(
            F.col("centroid_id").isin(sorted(cell_to_q))
        )
        kind = "l2" if distance == "l2" else "dot"
        luts = np.stack(
            [self.book.lookup_table(qm[i], kind) for i in range(len(qm))]
        )  # (nq, m, ksub)
        cents = np.asarray(self.ivf.centroids, dtype=np.float64)
        cell_ids = sorted(cell_to_q)
        if self.residual:
            if kind == "l2":
                # 2·c_j·r̂_jk per probed cell; scalar ||c||² - 2 q·c
                cell_lut = {
                    c: 2.0
                    * np.einsum(
                        "md,mkd->mk",
                        cents[c].reshape(self.book.m, self.book.dsub),
                        self.book.codebooks,
                    )
                    for c in cell_ids
                }
                scal = {
                    c: (cents[c] * cents[c]).sum() - 2.0 * (qm @ cents[c])
                    for c in cell_ids
                }  # (nq,) per cell
            else:  # dot: -q·(c + r̂) = -q·c + sum_j -q_j·r̂_jk
                cell_lut = {c: None for c in cell_ids}
                scal = {c: -(qm @ cents[c]) for c in cell_ids}
        else:
            cell_lut = {c: None for c in cell_ids}
            scal = {c: np.zeros(len(qm)) for c in cell_ids}

        @pandas_udf(
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("qid", T.IntegerType()),
                        T.StructField("e", T.DoubleType()),
                    ]
                )
            )
        )
        def _est(cids: pd.Series, codes: pd.Series) -> pd.Series:
            cd = np.array(codes.tolist(), dtype=np.int64)
            cid = cids.to_numpy()
            res: list = [None] * len(cd)
            for c in np.unique(cid):
                qs = cell_to_q.get(int(c))
                mask = cid == c
                rows_idx = np.flatnonzero(mask)
                if not qs:
                    for ri in rows_idx:
                        res[ri] = []
                    continue
                sub = cd[mask]  # (rows, m)
                clut = cell_lut[int(c)]
                base = (
                    np.take_along_axis(clut.T, sub, axis=0).sum(axis=1)
                    if clut is not None
                    else 0.0
                )
                sc = scal[int(c)]
                per_q = np.empty((len(sub), len(qs)))
                for col, qi in enumerate(qs):
                    per_q[:, col] = (
                        np.take_along_axis(luts[qi].T, sub, axis=0).sum(axis=1)
                        + base
                        + float(sc[qi])
                    )
                for ri, erow in zip(rows_idx, per_q):
                    res[ri] = [
                        {"qid": int(q), "e": float(v)}
                        for q, v in zip(qs, erow)
                    ]
            return pd.Series(res)

        vec_col = self.ivf.vec_col
        keep = (
            list(select)
            if select is not None
            else [
                c
                for c in pruned.columns
                if c not in (vec_col, "centroid_id", "__pq")
            ]
        )
        # the float column rides along only to the refine pass
        carry = [] if vec_col in keep else [vec_col]
        estimated = (
            pruned.withColumn(
                "__hits", _est(F.col("centroid_id"), F.col("__pq"))
            )
            .select(*keep, *carry, F.explode("__hits").alias("__h"))
            .select(
                F.col("__h.qid").alias("query_id"),
                *keep,
                *carry,
                F.col("__h.e").alias("__est"),
            )
        )
        order = [F.col("__est").asc()]
        if tie_break:
            order.append(F.col(tie_break).asc())
        w_est = Window.partitionBy("query_id").orderBy(*order)
        cands = (
            estimated.withColumn("__rn", F.row_number().over(w_est))
            .filter(F.col("__rn") <= refine)
            .drop("__rn", "__est")
        )

        q_norm = np.sqrt((qm * qm).sum(axis=1))
        dkind = distance

        @pandas_udf(T.DoubleType())
        def _exact(qids: pd.Series, vecs: pd.Series) -> pd.Series:
            x = np.array(vecs.tolist(), dtype=np.float64)
            qi = qids.to_numpy()
            qv = qm[qi]
            dots = np.einsum("ij,ij->i", x, qv)
            if dkind == "dot":
                d = -dots
            elif dkind == "cos":
                xn = np.sqrt((x * x).sum(axis=1))
                d = 1.0 - dots / (np.maximum(xn, 1e-300) * q_norm[qi])
            else:
                d = np.sqrt(
                    np.maximum(
                        (x * x).sum(axis=1)
                        - 2.0 * dots
                        + (qv * qv).sum(axis=1),
                        0.0,
                    )
                )
            return pd.Series(d)

        scored = cands.withColumn(
            "distance", _exact(F.col("query_id"), F.col(vec_col))
        )
        if carry:
            scored = scored.drop(vec_col)
        final = [F.col("distance").asc()]
        if tie_break:
            final.append(F.col(tie_break).asc())
        w_fin = Window.partitionBy("query_id").orderBy(*final)
        return (
            scored.withColumn("__rn", F.row_number().over(w_fin))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    def estimate_topk(
        self,
        query: Sequence[float],
        key_col: str,
        probes: int | None = None,
        refine: int = 100,
        distance: str = "cos",
    ) -> DataFrame:
        """Phase 1 of a TWO-SCAN search: the ``refine`` best ADC-
        estimate keys, from a scan that reads ONLY (key, centroid_id,
        __pq) of the probed partitions — the float column stays on
        disk, which is where PQ's m-bytes-vs-4·dim estimate-bandwidth
        cut is actually realized (the single-scan :meth:`search`
        carries the float column through for the refine projection —
        cheaper at page-cached local scale, wrong at 100 TB). The
        caller re-reads floats for these keys only (registry
        search_by_vector does this with a pushed IN filter)."""
        from vechord_spark.operators.ivf import default_probes

        if probes is None:
            probes = default_probes(self.ivf.lists)
        probe_ids = self.ivf.nearest_centroids(query, probes)
        kind = "l2" if distance == "l2" else "dot"
        est = (
            adc_estimate_residual(
                self.book, query, self.ivf.centroids, probe_ids, kind
            )
            if self.residual
            else adc_estimate(self.book, query, kind)
        )
        pruned = self.encoded.filter(
            F.col("centroid_id").isin(probe_ids)
        ).select(key_col, "centroid_id", "__pq")
        return (
            pruned.withColumn("__est", est)
            .select(key_col, "__est")
            .orderBy(F.col("__est").asc(), F.col(key_col).asc())
            .limit(refine)
        )

    def search(
        self,
        query: Sequence[float],
        k: int = 10,
        probes: int | None = None,
        refine: int = 100,
        distance: str = "cos",
        select: Sequence[str] | None = None,
        tie_break: str | None = None,
    ) -> DataFrame:
        from vechord_spark.operators.ivf import default_probes

        if probes is None:
            probes = default_probes(self.ivf.lists)
        probe_ids = self.ivf.nearest_centroids(query, probes)
        pruned = self.encoded.filter(F.col("centroid_id").isin(probe_ids))
        # l2 ADC is exact on the reconstruction; dot/cos use the
        # negative-dot proxy (the exact refine pass fixes ranks inside
        # the budget — same contract as IvfIndex.search_refined's int8)
        kind = "l2" if distance == "l2" else "dot"
        order = [F.col("__est").asc()]
        if tie_break:
            order.append(F.col(tie_break).asc())
        est = (
            adc_estimate_residual(
                self.book, query, self.ivf.centroids, probe_ids, kind
            )
            if self.residual
            else adc_estimate(self.book, query, kind)
        )
        cands = pruned.withColumn("__est", est).orderBy(*order).limit(refine)
        scored = cands.withColumn(
            "distance", vector_distance(distance, self.ivf.vec_col, list(query))
        ).drop("__pq", "__est")
        final = [F.col("distance").asc()]
        if tie_break:
            final.append(F.col(tie_break).asc())
        out = scored.orderBy(*final).limit(k)
        if select is not None:
            out = out.select(*select, "distance")
        return out

    def write_clustered(self, path: str) -> None:
        """Persist codes + floats partitioned by centroid_id. At scale
        the estimate scan then reads ONLY (centroid partitions) x (the
        __pq code column) — column pruning keeps the float vectors on
        disk until the refine pass."""
        self.encoded.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


class OpqRotation:
    """Orthogonal ``d x d`` rotation learned to minimize PQ
    reconstruction error (OPQ, Ge et al., "Optimized Product
    Quantization", CVPR 2013 — the FAISS ``OPQ{m},...`` pre-transform).

    Plain PQ quantizes fixed coordinate blocks; when variance/
    correlation is unevenly spread across dimensions, some subspaces
    carry most of the error. An orthogonal rotation re-mixes the axes
    so the ``m`` blocks share the quantization burden. Orthogonality
    means the rotation preserves L2 distances and inner products
    EXACTLY, so searching rotated vectors with a rotated query is the
    same nearest-neighbor problem — only the codes get better.
    """

    def __init__(self, rotation: np.ndarray):
        r = np.asarray(rotation, dtype=np.float64)
        if r.ndim != 2 or r.shape[0] != r.shape[1]:
            raise ValueError("rotation must be square (d, d)")
        if not np.allclose(r @ r.T, np.eye(r.shape[0]), atol=1e-8):
            raise ValueError("rotation must be orthogonal")
        self.rotation = r

    @property
    def dim(self) -> int:
        return int(self.rotation.shape[0])

    def apply(self, vec: Sequence[float]) -> np.ndarray:
        """Rotate one vector (driver-side: the query path)."""
        return np.asarray(vec, dtype=np.float64) @ self.rotation

    def apply_col(self, vec_col: str) -> Column:
        """Rotate a vector column — one ``(batch, d) @ (d, d)`` matmul
        per Arrow batch; R rides in the UDF closure."""
        from pyspark.sql import types as T
        from pyspark.sql.functions import pandas_udf

        r = self.rotation

        @pandas_udf(T.ArrayType(T.DoubleType()))
        def _rot(vecs: pd.Series) -> pd.Series:
            x = np.array(vecs.tolist(), dtype=np.float64)
            return pd.Series(list(x @ r))

        return _rot(F.col(vec_col))


def _fit_books_np(
    sample: np.ndarray,
    m: int,
    ksub: int,
    rng: np.random.Generator,
    max_iter: int,
    init_books: np.ndarray | None = None,
) -> np.ndarray:
    """Per-subspace codebooks on an in-memory (n, m, dsub) sample —
    the numpy core shared by train_pq and the OPQ alternation.
    ``init_books`` warm-starts each subspace's Lloyd from the previous
    alternation's codebooks (true coordinate descent)."""
    books = []
    for j in range(m):
        x = sample[:, j, :]
        books.append(
            _lloyd(
                x,
                min(ksub, x.shape[0]),
                rng,
                max_iter,
                pad_to=ksub,
                init=init_books[j] if init_books is not None else None,
            )
        )
    return np.stack(books)


def _encode_reconstruct_np(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Nearest-code reconstruction of an (n, m*dsub) sample — the OPQ
    alternation's quantize step, vectorized per subspace."""
    n = x.shape[0]
    m, _, dsub = books.shape
    xs = x.reshape(n, m, dsub)
    out = np.empty_like(xs)
    for j in range(m):
        c = books[j]
        scores = xs[:, j, :] @ c.T * -2.0 + (c * c).sum(axis=1)[None, :]
        out[:, j, :] = c[np.argmin(scores, axis=1)]
    return out.reshape(n, m * dsub)


def train_opq(
    df: DataFrame,
    vec_col: str,
    m: int = 8,
    ksub: int = 256,
    opq_iters: int = 8,
    sample_fraction: float | None = None,
    seed: int = 42,
    max_iter: int = 8,
    max_train_points: int = 100_000,
) -> tuple[OpqRotation, PqCodebook]:
    """Alternating OPQ training (the non-parametric OPQ-NP of Ge et
    al. 2013 §4) on the same bounded driver-side sample contract as
    :func:`train_pq`:

    1. fit codebooks on the rotated sample ``X R``;
    2. quantize: ``Y = reconstruct(encode(X R))``;
    3. orthogonal Procrustes: ``R = U V^T`` from ``svd(X^T Y)`` — the
       rotation minimizing ``||X R - Y||_F`` (closed form).

    Each step is a coordinate descent on the shared reconstruction
    objective, so the training error is monotonically non-increasing
    (test-pinned). Returns ``(rotation, codebooks-in-rotated-space)``;
    encode/search must apply the rotation first (build_opq_ivf_pq
    wires this). Deterministic for a fixed seed.
    """
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("cannot train OPQ on an empty DataFrame")
    dim = int(first["d"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")

    base = df.select(F.col(vec_col).alias("__vec"))
    if sample_fraction and sample_fraction < 1.0:
        base = base.sample(fraction=sample_fraction, seed=seed)
    x = np.array(
        [r["__vec"] for r in base.limit(max_train_points).collect()],
        dtype=np.float64,
    )

    rng = np.random.default_rng(seed)
    rot = np.eye(dim)
    books = None
    errors: list[float] = []
    for _ in range(max(1, opq_iters)):
        xr = x @ rot
        # WARM-START each alternation from the previous iteration's
        # codebooks (true coordinate descent): Lloyd started at the
        # previous books can only lower the fixed-R objective, and the
        # Procrustes step can only lower the fixed-assignment one —
        # without the warm start each alternation re-seeded kmeans++
        # from a mutating rng and descent was only empirical
        # (round-11 advice)
        books = _fit_books_np(
            xr.reshape(-1, m, dim // m), m, ksub, rng, max_iter,
            init_books=books,
        )
        y = _encode_reconstruct_np(xr, books)
        errors.append(float(((xr - y) ** 2).sum(axis=1).mean()))
        u, _, vt = np.linalg.svd(x.T @ y)
        rot = u @ vt
    # final codebooks against the final rotation (the loop's last
    # Procrustes step moved R after the books were fit)
    books = _fit_books_np(
        (x @ rot).reshape(-1, m, dim // m), m, ksub, rng, max_iter,
        init_books=books,
    )
    out = OpqRotation(rot)
    # per-alternation training MSE witness (the descent the warm start
    # guarantees; test-pinned in test_pq.py)
    out.train_errors = errors
    return out, PqCodebook(books)


def reconstruction_mse(
    df: DataFrame,
    vec_col: str,
    book: PqCodebook,
    rotation: OpqRotation | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """One-row frame ``(n, mse)``: corpus-mean squared reconstruction
    error of the codebook — the objective PQ/OPQ minimize, computed
    DISTRIBUTED (one Arrow pass: rotate, encode, reconstruct, squared
    diff; map-side combined agg). Rotation preserves norms, so the
    rotated-space MSE is directly comparable to the plain one — this
    is the stable corpus-level witness that OPQ beat plain PQ (recall
    @k on a single query is a noisier signal).

    With ``centroids`` the error is of the RESIDUAL coder: the
    reconstruction is ``centroid + r̂``, so ``||x - (c + r̂)||² =
    ||residual - r̂||²`` — the same full-vector error scale, directly
    comparable to raw-vector PQ's. ``df`` must carry ``centroid_id``."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    cb = book.codebooks
    r = rotation.rotation if rotation is not None else None
    cents = np.asarray(centroids, dtype=np.float64) if centroids is not None else None

    def _sq_err(x: np.ndarray) -> pd.Series:
        if r is not None:
            x = x @ r
        y = _encode_reconstruct_np(x, cb)
        d = x - y
        return pd.Series((d * d).sum(axis=1))

    if cents is None:

        @pandas_udf(T.DoubleType())
        def _err(vecs: pd.Series) -> pd.Series:
            return _sq_err(np.array(vecs.tolist(), dtype=np.float64))

        errs = df.select(_err(F.col(vec_col)).alias("__e"))
    else:

        @pandas_udf(T.DoubleType())
        def _err_res(cids: pd.Series, vecs: pd.Series) -> pd.Series:
            x = np.array(vecs.tolist(), dtype=np.float64)
            return _sq_err(x - cents[cids.to_numpy()])

        errs = df.select(
            _err_res(F.col("centroid_id"), F.col(vec_col)).alias("__e")
        )
    return errs.agg(F.count(F.lit(1)).alias("n"), F.avg("__e").alias("mse"))


def build_opq_ivf_pq(
    df: DataFrame,
    vec_col: str,
    lists: int,
    m: int = 8,
    ksub: int = 256,
    opq_iters: int = 8,
    sample_fraction: float | None = None,
    seed: int = 42,
    max_iter: int = 8,
    spherical: bool = False,
) -> tuple[OpqRotation, IvfPqIndex]:
    """OPQ pre-transform + IVF + PQ, composed the FAISS way
    (``OPQ{m},IVF{lists},PQ{m}``): rotate the corpus once, then build
    the IVF layout and the codebooks in ROTATED space. Because the
    rotation is orthogonal, rotated-space L2/dot equal the original
    distances exactly — the refine pass returns true distances and
    the probe pruning semantics are unchanged; only the ADC estimate
    gets sharper. Search by rotating the query:
    ``index.search(rot.apply(q), ...)``."""
    from vechord_spark.operators.ivf import build_ivf

    rot, book = train_opq(
        df, vec_col, m=m, ksub=ksub, opq_iters=opq_iters,
        sample_fraction=sample_fraction, seed=seed, max_iter=max_iter,
    )
    rotated = df.withColumn("__rvec", rot.apply_col(vec_col))
    ivf = build_ivf(
        rotated, "__rvec", lists,
        sample_fraction=sample_fraction, seed=seed, max_iter=max_iter,
        spherical=spherical,
    )
    return rot, IvfPqIndex(ivf, book)


def build_ivf_pq(
    df: DataFrame,
    vec_col: str,
    lists: int,
    m: int = 8,
    ksub: int = 256,
    sample_fraction: float | None = None,
    seed: int = 42,
    max_iter: int = 8,
) -> IvfPqIndex:
    """Build IVF centroids + PQ codebooks + encoded assignment in one
    call. Residual encoding (PQ over vector - centroid) is the FAISS
    default at high ``lists``; at the modest list counts this engine
    uses for partition layouts, plain PQ keeps the codebook shared
    across partitions (one LUT per query, not per probe) — the
    trade-off is documented rather than hidden."""
    from vechord_spark.operators.ivf import build_ivf

    ivf = build_ivf(
        df, vec_col, lists,
        sample_fraction=sample_fraction, seed=seed, max_iter=max_iter,
    )
    book = train_pq(
        df, vec_col, m=m, ksub=ksub,
        sample_fraction=sample_fraction, seed=seed, max_iter=max_iter,
    )
    return IvfPqIndex(ivf, book)
