"""Deduplication suite for large-corpus training-data pipelines.

Not present in the reference (its unique-index is the only dedup,
vechord/client.py:146-156); these are the driver-mandated scale
extensions (SURVEY §7.2 step 8). Five families:

- exact:      md5 fingerprint of normalized text -> groupBy
- MinHash+LSH: char-shingles -> k min-hashes -> banded signatures ->
               bucket self-join (candidate pairs without O(n²))
- SimHash:    64-bit-ish bit-vote fingerprint; near-dup = small
               Hamming distance
- n-gram Jaccard: exact Jaccard over shingle sets, computed only for
               candidate (blocked) pairs
- embedding:  cosine near-dup over a vector column (brute top-n or
               LSH-bucketed)

Hash parity: every hash is built from ``md5`` (bit-identical in Spark
and DuckDB) so each operator has an exact SQL oracle. Murmur/xxhash
would be faster; md5 keeps the correctness gate honest and is still
JVM-side and codegen-friendly.

Scale notes: MinHash/SimHash signatures are one scan + narrow shuffles
on (band, signature) buckets; no stage materializes the O(n²) pair
space. That is the property that survives 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from vechord_spark.functions.text import char_ngrams, fingerprint
from vechord_spark.functions.vector import cosine_similarity

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of documents with identical normalized text.

    Returns ``(fp, n_dups, doc_ids)`` for fingerprints appearing more
    than once; ``doc_ids`` sorted for deterministic output. One shuffle
    on the fingerprint (map-side combine applies).
    """
    return (
        df.select(F.col(id_col).alias("doc_id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def drop_exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative (lowest id) per identical-text group."""
    w = Window.partitionBy(fingerprint(text_col)).orderBy(F.col(id_col).asc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    text_col, num_hashes: int = 16, ngram: int = 5
):
    """Array of ``num_hashes`` min-hash values over the text's character
    shingles. Hash i of shingle s = md5('{i}:' || s); the min is taken
    lexicographically over hex strings — a valid MinHash family and
    bit-identical across engines."""
    shingles = F.array_distinct(char_ngrams(text_col, ngram))
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
            )
            for i in range(num_hashes)
        ]
    )


def minhash_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    band_size: int = 2,
    ngram: int = 5,
) -> DataFrame:
    """``(doc_id, band, sig)`` — one row per LSH band; docs sharing a
    (band, sig) bucket are candidate near-duplicates."""
    sig = minhash_signature(text_col, num_hashes, ngram)
    n_bands = num_hashes // band_size
    withsig = df.select(F.col(id_col).alias("doc_id"), sig.alias("__mh"))
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col("__mh")[b * band_size + r] for r in range(band_size)]
                    )
                ).alias("sig"),
            )
            for b in range(n_bands)
        ]
    )
    return withsig.select("doc_id", F.explode(bands).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    band_size: int = 2,
    ngram: int = 5,
) -> DataFrame:
    """Candidate near-dup pairs ``(doc_a, doc_b)`` (doc_a < doc_b) from
    LSH banding. The self-join keys on (band, sig) buckets — cost is
    bucket-local, never O(n²) over the corpus."""
    bands = minhash_bands(df, id_col, text_col, num_hashes, band_size, ngram)
    a = bands.select(F.col("band"), F.col("sig"), F.col("doc_id").alias("doc_a"))
    b = bands.select(F.col("band"), F.col("sig"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 5,
    threshold: float = 0.0,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over character-shingle sets.

    ``candidates`` (doc_a, doc_b) restricts the pair space (feed it
    minhash_candidate_pairs at scale); without it, pairs are generated
    from the shingle postings (docs sharing >= 1 shingle), which is safe
    for verification scale only. Returns ``(doc_a, doc_b, jaccard)``
    rounded to 6 decimals.
    """
    sets = df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(char_ngrams(text_col, ngram)).alias("sh"),
    )
    sizes = sets.select("doc_id", F.size("sh").alias("n_sh"), "sh")
    posts = sets.select("doc_id", F.explode("sh").alias("shingle"))
    pa = posts.select(F.col("shingle"), F.col("doc_id").alias("doc_a"))
    pb = posts.select(F.col("shingle"), F.col("doc_id").alias("doc_b"))
    inter = (
        pa.join(pb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"], "left_semi")
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
                6,
            ),
        )
        .select("doc_a", "doc_b", "jaccard")
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 hex chars of md5 -> fits a signed 64-bit int


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document 60-bit SimHash over word tokens.

    Token hash = first 15 hex chars of md5(token) as an integer; each
    bit position votes +1/-1 per token occurrence; bit set iff the vote
    is positive. Near-duplicates have small Hamming distance
    (``bit_count(a ^ b)``). Pure SQL -> exact DuckDB oracle.
    Returns ``(doc_id, simhash)``.
    """
    from vechord_spark.functions.text import tokenize

    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokenize(text_col)).alias("tok")
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    votes = toks.select("doc_id", h.alias("h")).groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sim = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{b}") > 0, F.lit(2**b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    band_bits: int = 15,
) -> DataFrame:
    """Near-dup pairs by SimHash banding + Hamming filter.

    Pigeonhole: with 4 bands of 15 bits, any pair within Hamming
    distance 3 shares at least one exact band — the self-join keys on
    band values, avoiding O(n²). Returns (doc_a, doc_b, hamming).
    """
    sigs = simhash(df, id_col, text_col)
    n_bands = SIMHASH_BITS // band_bits
    mask = (1 << band_bits) - 1
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    a = bands.select(
        "band", "key", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a")
    )
    b = bands.select(
        "band", "key", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b")
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_top_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    top_n: int = 20,
) -> DataFrame:
    """The ``top_n`` most-similar distinct pairs by cosine similarity.

    Brute-force pair scoring — the verification-scale baseline. At
    cluster scale, block first (IVF centroid or hyperplane-LSH bucket,
    operators/ivf.py) so only bucket-local pairs are scored.
    Returns (id_a, id_b, cos_sim) with similarity rounded to 6 decimals.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        F.round(cosine_similarity("__va", F.col("__vb")), 6).alias("cos_sim"),
    )
    w = Window.orderBy(F.col("cos_sim").desc(), F.col("id_a").asc(), F.col("id_b").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("id_a", "id_b", "cos_sim", "rank")
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    bucketer: DataFrame | None = None,
) -> DataFrame:
    """All pairs with cosine similarity >= threshold.

    ``bucketer`` = optional (id, bucket) assignment (e.g. IVF centroid
    ids) restricting comparisons to same-bucket pairs — the scale path.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    if bucketer is not None:
        ba = bucketer.select(F.col(id_col).alias("id_a"), F.col("bucket"))
        bb = bucketer.select(F.col(id_col).alias("id_b"), F.col("bucket"))
        a = a.join(ba, "id_a")
        b = b.join(bb, "id_b")
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(cosine_similarity("__va", F.col("__vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )
