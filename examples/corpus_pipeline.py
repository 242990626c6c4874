"""Training-corpus preparation, end to end: quality filter -> NB
classifier filter -> near-dup removal (keeping the BEST cluster
member) -> Kneser-Ney LM-perplexity gate (CCNet's signature stage) ->
benchmark decontamination -> token-budget source mixing ->
train/val split -> token-budget packing.

This is the 100 TB pipeline shape the engine's dedup/quality/sample/
pack operators compose into (no reference equivalent — these are the
engine's training-data extensions). Every stage is a DataFrame
transform: one Catalyst plan per stage, no driver-side loops.

    python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from vechord_spark.operators.dedup import (
    drop_near_duplicates_keep_best,
    minhash_candidate_pairs,
    ngram_jaccard,
)
from vechord_spark.operators.decontaminate import decontaminate
from vechord_spark.operators.pack import bin_utilization, pack_sequences
from vechord_spark.operators.quality import (
    gopher_quality,
    nb_classifier_score,
    repetition_stats,
)
from vechord_spark.operators.sample import (
    hash_fraction,
    split_assign,
)
from vechord_spark.functions.text import token_count
from vechord_spark.session import get_spark
from vechord_spark.sources.testdata import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
PACK_BUDGET = 2048


def main() -> None:
    spark = get_spark("corpus-pipeline", master="local[4]", shuffle_partitions=8)
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 0. Gopher rule gate (zero-shuffle scan — the cheapest filter runs
    #    first at scale). The synthetic corpus has no English stopwords
    #    or newlines, so the stopword/line rules are relaxed here; on a
    #    real crawl use the paper defaults.
    gq = gopher_quality(
        docs, "doc_id", "text", min_words=20, min_required_words=0
    )
    docs = docs.join(
        gq.filter("passes_gopher").select("doc_id"), "doc_id", "left_semi"
    )
    n_g = docs.count()

    # 1. quality gate: drop docs dominated by repeated tokens/bigrams
    rep = repetition_stats(docs, "doc_id", "text")
    keep_ids = rep.filter(
        (F.col("top_token_frac") <= 0.2) & (F.col("top_ngram_frac") <= 0.18)
    ).select("doc_id")
    docs = docs.join(keep_ids, "doc_id", "left_semi")
    n1 = docs.count()

    # 2. classifier filter: NB trained in-plan on weak labels (lang tag)
    #    keeps docs the model scores at least neutral for the target class
    nb = nb_classifier_score(docs, "doc_id", "text", F.col("lang") == "en")
    docs = docs.join(
        nb.filter(F.col("nb_logodds") > -50.0).select("doc_id"), "doc_id", "left_semi"
    )
    n2 = docs.count()

    # 3. near-dup removal: MinHash candidates -> Jaccard verify ->
    #    connected components -> keep the BEST member per cluster
    #    (longest text, not first-crawled: duplicates are rarely equal)
    cands = minhash_candidate_pairs(docs, "doc_id", "text")
    pairs = ngram_jaccard(
        docs, "doc_id", "text", threshold=0.35, candidates=cands
    ).select("doc_a", "doc_b")
    docs = drop_near_duplicates_keep_best(
        docs, "doc_id", pairs, prefer=F.length("text")
    )
    n3 = docs.count()

    # 3b. LM-perplexity gate (the CCNet stage): score survivors under
    #     a Kneser-Ney bigram model of the corpus, drop the bottom 15%
    from vechord_spark.operators.quality import kn_perplexity_gate

    docs = kn_perplexity_gate(docs, "doc_id", "text", drop_frac=0.15)
    n3b = docs.count()

    # 4. benchmark decontamination: the held-out eval slice (5% hash
    #    sample) must not leak into training via shared n-grams
    thr = int(round(0.05 * (1 << 32)))
    h = hash_fraction("doc_id", "bench-v1")
    bench = docs.filter(h < F.lit(thr))
    docs = decontaminate(
        docs.filter(h >= F.lit(thr)), "doc_id", "text", bench, "doc_id", "text", n=4
    )
    n4 = docs.count()

    # 5. reproducible training mix, provisioned in TOKENS (what the
    #    training run is actually budgeted in), md5-keyed membership
    from vechord_spark.operators.sample import token_budget_sample

    docs = docs.withColumn("__ntok", token_count("text"))
    docs = token_budget_sample(
        docs, "doc_id", "source", F.col("__ntok"),
        {"src0": 0.5, "src1": 0.3, "src2": 0.2},
        budget_tokens=30_000, salt="mix-v1",
    ).drop("__ntok")
    n5 = docs.count()

    # 6. train/val split (append-stable) + token-budget packing per split
    docs = split_assign(docs, "doc_id", {"train": 0.95, "val": 0.05}, salt="sp1")
    packed = pack_sequences(
        docs.select("doc_id", "split", token_count("text").alias("n_tokens")),
        "doc_id",
        "n_tokens",
        PACK_BUDGET,
        "split",
    )
    util = bin_utilization(packed, "n_tokens", PACK_BUDGET, "split")
    n_bins, mean_fill = util.agg(
        F.count(F.lit(1)), F.round(F.avg("fill_frac"), 3)
    ).first()

    print(
        f"corpus: {n0} docs -> gopher {n_g} -> quality {n1} -> classifier {n2} -> dedup {n3} "
        f"-> lm_gate {n3b} -> decontaminated {n4} -> token-budget mix {n5} "
        f"-> {n_bins} bins of {PACK_BUDGET} tokens (mean fill {mean_fill})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
