"""Sequence packing: assign documents to fixed token-budget bins for
training-batch construction.

LLM training consumes fixed-length sequences; corpus pipelines
concatenate documents into ~budget-token bins ("packing") to avoid
padding waste. True first-fit packing is inherently sequential, so the
distributed rendition is OFFSET packing within an explicit partition
key: documents are laid out in deterministic (id) order per partition
and a document's bin is ``floor(preceding_token_total / budget)`` — a
streaming rule every engine reproduces exactly, bins overflow by at
most one document, and the layout is stable across runs.

Scale shape: one window aggregation keyed on the partition column
(sources/shards process in parallel; no global ordering bottleneck) —
never a driver-side loop. An unpartitioned call funnels the corpus
through ONE task, so it raises instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    partition_col: str,
) -> DataFrame:
    """Add ``bin_id`` (per-partition token-budget bin) and
    ``bin_offset`` (token start position inside the bin's stream).

    ``partition_col`` is required by design: it is the parallelism unit
    (source, shard, date bucket). Documents longer than ``budget``
    still get a bin (their own overflow); filter beforehand if they
    should be split or dropped.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    preceding = (F.sum(token_col).over(w) - F.col(token_col)).alias("__preceding")
    return (
        df.select("*", preceding)
        .select(
            "*",
            F.floor(F.col("__preceding") / budget).cast("long").alias("bin_id"),
            (F.col("__preceding") % budget).cast("long").alias("bin_offset"),
        )
        .drop("__preceding")
    )


def bin_utilization(
    packed: DataFrame, token_col: str, budget: int, partition_col: str
) -> DataFrame:
    """Per-bin fill statistics (docs, tokens, fill fraction) — the
    packing-efficiency report a pipeline asserts on before training."""
    return packed.groupBy(partition_col, "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("n_tokens"),
        F.round(F.sum(token_col) / F.lit(float(budget)), 6).alias("fill_frac"),
    )
