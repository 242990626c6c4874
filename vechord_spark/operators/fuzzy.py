"""Edit-distance similarity join — FastSS deletion-neighborhood
blocking + exact Levenshtein verification.

String fields that SHOULD match but don't (names, titles, product
codes with typos) are the classic entity-resolution problem; the
n-gram Jaccard machinery in operators/dedup.py targets documents,
not short strings, where a 1-character typo can wipe out most
shingles. The published answer for small edit distances is the
deletion neighborhood (FastSS, Bocek et al. 2007; the same family as
SymSpell): if ``ED(s, t) <= k`` then deleting at most ``k``
characters from each side reaches a COMMON string — align the two
strings and delete the characters involved in the (at most k) edit
operations. So:

1. expand every string into its ``<=k``-deletion variants
   (``1 + L + C(L,2) + ...`` per string — bounded by the SHORT-string
   contract, enforced with ``max_len``),
2. hash-join on the variant (bucket-local, the MinHash-band shape),
3. verify candidates with the built-in ``F.levenshtein`` (JVM-side;
   DuckDB's ``levenshtein`` agrees, which is what makes the suite
   oracle a brute-force cross join while Spark runs this plan).

Blocking is complete (every true pair shares a variant) and the
verify step makes candidates sound, so with ``max_bucket=None`` the
join is exact. The DEFAULT caps crowd buckets like a MinHash
mega-bucket — a deliberate recall trade-off, not a free lunch: a
true pair whose every shared variant lands in a capped bucket is
dropped (e.g. hundreds of strings differing only at one position all
share exactly one variant). At 100 TB the variant table is
``O(rows * L^k)`` narrow md5 rows and the join never goes n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(s: str, k: int) -> set[str]:
    """All strings reachable from ``s`` by deleting at most ``k``
    characters (including ``s`` itself)."""
    out = {s}
    frontier = {s}
    for _ in range(k):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1 :])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    max_len: int = 64,
    max_bucket: int | None = 256,
) -> DataFrame:
    """Pairs of rows with ``levenshtein(a, b) <= max_dist``:
    ``(id_a, id_b, dist)``, ``id_a < id_b``. Exact when
    ``max_bucket=None`` (blocking is complete, verification is the
    built-in Levenshtein); with the default cap it is a
    HIGH-RECALL-NOT-EXACT join — see below.

    Strings longer than ``max_len`` are excluded (the deletion
    neighborhood is a SHORT-string technique; long-text similarity
    belongs to the shingle/MinHash family). Variant buckets larger
    than ``max_bucket`` are dropped, which bounds the bucket-local
    join at the price of recall: a true pair is lost iff EVERY
    variant the two strings share sits in a capped bucket (real for
    template crowds — 300 strings differing at one position share
    exactly one variant). Pass ``max_bucket=None`` to keep every
    bucket and recover the exact result, or inspect
    ``dropped_variant_buckets`` to detect incompleteness.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")

    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("s")
    ).filter(F.length("s") <= max_len)

    if max_dist <= 1:
        # pure-JVM expansion for the common k<=1 case: variant i is
        # the string with character i removed (i = 0 keeps the string
        # itself), all inside whole-stage codegen — no Python stage
        n_var = F.lit(0) if max_dist == 0 else F.length("s")
        variants = base.select(
            "id",
            "s",
            F.explode(F.sequence(F.lit(0), n_var)).alias("i"),
        ).select(
            "id",
            "s",
            F.md5(
                F.when(F.col("i") == 0, F.col("s")).otherwise(
                    F.concat(
                        F.expr("substring(s, 1, i - 1)"),
                        F.expr("substring(s, i + 1)"),
                    )
                )
            ).alias("vh"),
        )
    else:
        import pandas as pd

        id_type = df.schema[id_col].dataType.simpleString()

        def _expand(batches):
            for pdf in batches:
                ids, ss, vs = [], [], []
                for rid, s in zip(pdf["id"], pdf["s"]):
                    for v in deletion_variants(s or "", max_dist):
                        ids.append(rid)
                        ss.append(s)
                        vs.append(v)
                yield pd.DataFrame({"id": ids, "s": ss, "v": vs})

        variants = base.mapInPandas(
            _expand, f"id {id_type}, s string, v string"
        ).select("id", "s", F.md5(F.col("v")).alias("vh"))

    variants = variants.distinct()
    if max_bucket is None:
        kept = variants
    else:
        sizes = variants.groupBy("vh").agg(F.count(F.lit(1)).alias("n"))
        kept = variants.join(
            sizes.filter(F.col("n") <= max_bucket).select("vh"), "vh"
        )
    # strings ride through the variant table, so the bucket-local join
    # yields verify-ready pairs directly (no join-back to the base)
    return (
        kept.alias("a")
        .join(kept.alias("b"), "vh")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.s").alias("sa"),
            F.col("b.s").alias("sb"),
        )
        .distinct()
        .select("id_a", "id_b", F.levenshtein("sa", "sb").alias("dist"))
        .filter(F.col("dist") <= max_dist)
    )


def dropped_variant_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    max_len: int = 64,
    max_bucket: int = 256,
) -> DataFrame:
    """The variant buckets ``edit_distance_pairs`` would drop under
    the same parameters: ``(vh, n)``, one row per capped bucket.
    Non-empty output means the capped join may be incomplete — rerun
    with ``max_bucket=None`` (or a higher cap) for the exact result.
    Only the k<=1 JVM expansion is mirrored here; for ``max_dist>=2``
    call ``edit_distance_pairs(..., max_bucket=None)`` directly."""
    if max_dist > 1:
        raise ValueError(
            "dropped_variant_buckets mirrors the k<=1 expansion only"
        )
    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("s")
    ).filter(F.length("s") <= max_len)
    n_var = F.lit(0) if max_dist == 0 else F.length("s")
    variants = (
        base.select(
            "id", "s", F.explode(F.sequence(F.lit(0), n_var)).alias("i")
        )
        .select(
            "id",
            F.md5(
                F.when(F.col("i") == 0, F.col("s")).otherwise(
                    F.concat(
                        F.expr("substring(s, 1, i - 1)"),
                        F.expr("substring(s, i + 1)"),
                    )
                )
            ).alias("vh"),
        )
        .distinct()
    )
    return (
        variants.groupBy("vh")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_bucket)
    )
