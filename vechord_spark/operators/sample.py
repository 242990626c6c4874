"""Deterministic sampling for training-data pipelines.

``df.sample()`` draws from a seeded RNG whose stream depends on
partitioning — re-running after a repartition (or on another engine)
yields a DIFFERENT subset, which breaks reproducible training mixes and
A/B data ablations. Hash-based sampling keys the keep/drop decision on
``md5(salt || id)`` alone: the same row is in or out regardless of
partition layout, cluster size, or engine, membership is stable across
incremental runs (new rows don't reshuffle old decisions — the property
web-scale corpus pipelines rely on for incremental crawls), and the
DuckDB oracle can verify the exact row set.

Scale shape: a single narrow ``Filter`` over the scan — no shuffle, no
state; Catalyst pushes the projection down and the md5 stays in
whole-stage codegen. Changing ``salt`` draws an independent sample;
nested samples (rate 0.5 then 0.1 with the same salt) are subsets of
each other, which gives consistent train/dev splits at any ratio.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, functions as F

# 8 hex chars of md5 -> uniform integer in [0, 2^32); md5 is the one
# hash bit-identical across Spark and the DuckDB oracle.
HASH_SPACE = 1 << 32


def hash_fraction(id_col: str, salt: str = "") -> Column:
    """Uniform pseudo-random long in [0, 2^32) keyed only on the row id.

    DuckDB-oracle equivalent:
    ``CAST(('0x' || substr(md5(<salt> || CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)``.
    """
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(round(rate * HASH_SPACE))


def deterministic_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, decided by ``md5(salt || id)`` — stable
    under repartitioning, engine changes, and incremental appends."""
    return df.filter(hash_fraction(id_col, salt) < F.lit(_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum sampling rates (the training-mix primitive: e.g.
    keep 50% of wiki, 5% of crawl). Strata not in ``rates`` get
    ``default_rate``. Same single-filter scale shape — the stratum
    threshold is a CASE expression, not a join."""
    case: Column | None = None
    for value, rate in rates.items():
        t = F.lit(_threshold(rate))
        case = (
            F.when(F.col(strata_col) == value, t)
            if case is None
            else case.when(F.col(strata_col) == value, t)
        )
    threshold = (
        case.otherwise(F.lit(_threshold(default_rate)))
        if case is not None
        else F.lit(_threshold(default_rate))
    )
    return df.filter(hash_fraction(id_col, salt) < threshold)


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: Mapping[str, float],
    n_shards: int = 0,
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test split (+ optional shard id) — the
    last step of every training-data pipeline before the tokenizer.

    ``splits`` maps split name -> fraction (must sum to ~1). A row's
    split is decided by where ``md5(salt || id)`` falls in the
    cumulative ranges, so: stable under repartitioning and engine
    changes, incremental appends never move old rows between splits
    (no leakage from re-splitting), and nested salts give independent
    re-splits. With ``n_shards > 0`` a second, independent hash
    (``salt || '#shard'``) assigns a shard in [0, n_shards) — the
    writer then does ``partitionBy(split).repartition(shard)`` to emit
    stable, evenly-sized training files.

    Scale shape: two md5 Column expressions — no shuffle, no state;
    the split/shard columns are pure codegen over the scan.
    """
    total = sum(splits.values())
    if not splits or abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    h = hash_fraction(id_col, salt)
    case: Column | None = None
    cum = 0.0
    items = list(splits.items())
    for name, frac in items[:-1]:
        cum += frac
        t = F.lit(_threshold(cum))
        case = F.when(h < t, name) if case is None else case.when(h < t, name)
    last = items[-1][0]
    split = case.otherwise(F.lit(last)) if case is not None else F.lit(last)
    out = df.withColumn("split", split)
    if n_shards > 0:
        out = out.withColumn(
            "shard",
            (hash_fraction(id_col, salt + "#shard") % F.lit(n_shards)).cast("int"),
        )
    return out


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    splits: Mapping[str, float],
    pairs: DataFrame,
    salt: str = "",
) -> DataFrame:
    """Train/val/test split keyed on the near-dup CLUSTER, not the row.

    Hash-splitting by row id leaks near-duplicates across splits: a
    paraphrase or boilerplate clone of a training doc lands in test
    with ~p(test) probability, and the eval set silently overlaps the
    training set (the contamination Lee et al. 2022 measure). Here
    every row is assigned the split of its duplicate-cluster
    REPRESENTATIVE — connected components over the verified near-dup
    ``pairs`` (doc_a, doc_b), min-id label — so whole clusters move
    together and cross-split leakage is 0 BY CONSTRUCTION.

    Output adds ``split_rep`` (the cluster representative the decision
    was keyed on; equals the row id for docs in no pair) and ``split``.

    Scale shape: the cluster label frame is bounded by the docs that
    appear in a verified duplicate pair — orders of magnitude smaller
    than the corpus — so the left join is AQE-broadcastable; the corpus
    itself never shuffles and the split decision stays a codegen md5
    CASE, exactly as :func:`split_assign`.
    """
    from vechord_spark.operators.dedup import connected_components

    clusters = connected_components(pairs).withColumnRenamed("doc_id", id_col)
    rep = (
        df.join(clusters, id_col, "left")
        .withColumn("split_rep", F.coalesce(F.col("cluster_id"), F.col(id_col)))
        .drop("cluster_id")
    )
    return split_assign(rep, "split_rep", splits, salt=salt)


def mixture_rates(
    df: DataFrame, source_col: str, weights: Mapping[str, float]
) -> DataFrame:
    """Per-source sampling rates that hit a target corpus mixture.

    ``weights`` are target PROPORTIONS (DoReMi-style static domain
    mixing): the output sample should contain sources in ratio
    ``w_s``. The largest such sample keeps every row of the binding
    source: with c_s rows available, alpha = min_s(c_s / w_s) and
    rate_s = alpha * w_s / c_s (<= 1 by construction, exactly 1 for the
    binding source). Sources absent from ``weights`` rate 0.

    Returns ``(source, n_rows, rate)`` — one small row per source
    (one map-side-combined exchange over the corpus).
    """
    if not weights:
        raise ValueError("weights must be a non-empty mapping")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("mixture weights must be positive")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, float(w)) for s, w in sorted(weights.items())], f"{source_col} string, w double"
    )
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_rows"))
    per = counts.join(F.broadcast(wdf), source_col, "inner").withColumn(
        "cap", F.col("n_rows") / F.col("w")
    )
    alpha = per.agg(F.min("cap").alias("alpha"))
    return (
        per.crossJoin(F.broadcast(alpha))
        .select(
            source_col,
            "n_rows",
            (F.col("alpha") * F.col("w") / F.col("n_rows")).alias("rate"),
        )
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: Mapping[str, float],
    salt: str = "",
) -> DataFrame:
    """Deterministically sample ``df`` into the target source mixture.

    Rates come from ``mixture_rates`` IN-PLAN (no driver round-trip);
    membership is the same md5(salt || id) rule as the other samplers,
    so the mix is stable under repartitioning and incremental appends.
    The rate table broadcasts — the corpus itself never shuffles; the
    filter threshold ``floor(rate * 2^32)`` uses only scalar IEEE ops,
    identical in the DuckDB oracle.
    """
    rates = mixture_rates(df, source_col, weights).select(
        source_col, F.floor(F.col("rate") * F.lit(float(HASH_SPACE))).alias("__thr")
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(hash_fraction(id_col, salt) < F.col("__thr"))
        .drop("__thr")
    )


def temperature_rates(
    df: DataFrame, source_col: str, alpha: float = 0.5
) -> DataFrame:
    """Per-source rates for temperature-based mixing: target weights
    w_s ∝ c_s^alpha (the multilingual-corpus standard — alpha in (0,1)
    upsamples tail sources relative to their natural share; alpha=1 is
    the natural mix, alpha=0 uniform). Rates are scaled so the binding
    source keeps every row: rate_s = min_t(c_t / w_t) * w_s / c_s,
    i.e. rate_s ∝ c_s^(alpha-1), normalized so max rate = 1.

    One map-side-combined count per source, then scalar arithmetic on
    the |sources|-row table — the corpus is scanned once and never
    shuffled. Returns ``(source, n_rows, rate)``.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_rows"))
    # rate_s ∝ c_s^(alpha-1) with max rate = 1; since alpha <= 1 the
    # binding (rate-1) source is the SMALLEST, so algebraically
    # rate_s = (min_t c_t / c_s) ^ (1 - alpha). Computing it as ONE
    # power of an exact ratio keeps engines bit-identical where the
    # power function allows: sqrt (alpha=0.5) is IEEE correctly-rounded
    # everywhere, so that common case is exactly oracle-reproducible;
    # general pow may differ by 1 ulp across libms (documented).
    nmin = counts.agg(F.min("n_rows").alias("n_min"))
    ratio = F.col("n_min").cast("double") / F.col("n_rows").cast("double")
    if alpha == 1.0:
        rate = F.lit(1.0)
    elif alpha == 0.5:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, F.lit(1.0 - alpha))
    return (
        counts.crossJoin(F.broadcast(nmin))
        .select(source_col, "n_rows", rate.alias("rate"))
    )


def temperature_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Deterministically resample ``df`` toward the temperature-alpha
    mixture. Same plan shape as ``mixture_sample``: the |sources|-row
    rate table broadcasts, membership is md5(salt || id) vs the
    per-source threshold — stable under repartitioning and incremental
    appends, exactly reproducible in the SQL oracle."""
    rates = temperature_rates(df, source_col, alpha).select(
        source_col, F.floor(F.col("rate") * F.lit(float(HASH_SPACE))).alias("__thr")
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(hash_fraction(id_col, salt) < F.col("__thr"))
        .drop("__thr")
    )


def token_budget_rates(
    df: DataFrame,
    source_col: str,
    token_count,
    weights: Mapping[str, float],
    budget_tokens: int,
) -> DataFrame:
    """Per-source sampling rates that hit a TOKEN budget, not a doc
    count — the quantity a training run is actually provisioned in.
    Each source's target is ``budget * w_s`` tokens; the rate is
    ``min(1, target / available_tokens_s)`` (a source too small for
    its share keeps everything — the shortfall is reported, not
    silently redistributed). ``token_count`` is a Column with the
    per-row token count. One map-side-combined sum per source, scalar
    arithmetic on the |sources|-row table. Returns ``(source,
    n_tokens, rate)``."""
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    totals = df.groupBy(source_col).agg(
        F.sum(token_count).cast("double").alias("n_tokens")
    )
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, float(w)) for s, w in weights.items()], f"{source_col} string, w double"
    )
    return totals.join(wdf, source_col).select(
        source_col,
        "n_tokens",
        F.least(
            F.lit(1.0),
            F.lit(float(budget_tokens)) * F.col("w") / F.col("n_tokens"),
        ).alias("rate"),
    )


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    token_count,
    weights: Mapping[str, float],
    budget_tokens: int,
    salt: str = "",
) -> DataFrame:
    """Deterministically sample ``df`` so each source contributes
    ~``budget * w_s`` TOKENS (:func:`token_budget_rates`); membership
    is the same md5(salt || id) rule as the other samplers — stable
    under repartitioning and appends, and the floor(rate * 2^32)
    threshold uses only scalar IEEE ops, identical in the DuckDB
    oracle. The rate table broadcasts; the corpus never shuffles
    before the filter."""
    rates = token_budget_rates(
        df, source_col, token_count, weights, budget_tokens
    ).select(
        source_col,
        F.floor(F.col("rate") * F.lit(float(HASH_SPACE))).alias("__thr"),
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(hash_fraction(id_col, salt) < F.col("__thr"))
        .drop("__thr")
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    n: int,
    order_id: str,
    salt: str = "",
) -> DataFrame:
    """Keep at most ``n`` rows per key, chosen uniformly at random but
    deterministically (RefinedWeb/CCNet-style per-domain cap against
    over-represented sources).

    The keep set is the first ``n`` rows per key ordered by
    ``md5(salt || order_id)`` (ties broken by ``order_id``) — a salted
    random permutation, so the cap is an unbiased uniform subsample yet
    bit-stable across engines, partitionings, and reruns.

    Scale shape: one shuffle on ``key_col`` + a rank filter. Spark's
    WindowGroupLimit pushes the ``rank <= n`` limit to a PARTIAL pass
    before the exchange (each map task keeps only its local top-n per
    key), so a hot domain ships at most ``n * input_partitions`` rows —
    the same trick TakeOrderedAndProject uses — rather than its full
    row count.
    """
    if n < 1:
        raise ValueError(f"cap must be >= 1, got {n}")
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(order_id).cast("string"))),
        F.col(order_id),
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Weighted sample WITHOUT replacement via priority sampling
    (Duffield, Lund & Thorup 2007): each row gets priority
    ``w / u`` with ``u`` uniform in (0, 1], the k highest priorities
    are the sample — inclusion probability rises with weight, and the
    (k+1)-th priority is the published threshold for unbiased
    subset-sum estimation. The training-data use is score-weighted
    corpus subsetting: sample documents proportional to a quality or
    length weight, deterministically.

    Exactness contract (cross-engine hash parity): ``u`` is the
    md5-uniform ``(hash + 1) / 2^32`` and the priority is computed as
    the single expression ``w * 2^32 / (hash + 1)`` — one exact
    integer-valued multiply (weights below ~2^21 stay inside the
    2^53 exact-double range) and ONE IEEE division, so Spark and a
    SQL oracle produce bit-identical doubles. No ln/pow (the
    Efraimidis-Spirakis exponential-key form would hit cross-engine
    libm ulp skew).

    Returns the k sampled rows + ``priority`` + ``rank`` (1 = highest
    priority). Deterministic under repartitioning and appends, like
    every sampler here; one TakeOrderedAndProject, no shuffle."""
    from vechord_spark.operators.topk import ranked_topk

    pri = df.withColumn(
        "priority",
        F.col(weight_col).cast("double")
        * F.lit(float(HASH_SPACE))
        / (hash_fraction(id_col, salt) + F.lit(1)).cast("double"),
    )
    return ranked_topk(
        pri, [F.col("priority").desc(), F.col(id_col).asc()], k
    )
