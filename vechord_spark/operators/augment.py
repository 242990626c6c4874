"""Contextual augmentation (D11) — the Anthropic contextual-retrieval
recipe the reference implements with Gemini (vechord/augment.py:30-93):
prepend each chunk with document-level context before embedding, so the
chunk's vector carries its surroundings.

The LLM variant is providers.GeminiAugmenter (stub — no network);
``augment_chunks_with_head`` is the runnable deterministic stand-in:
context = the document's leading tokens. The join shape is the part
that matters at scale: document context is BROADCAST to its chunks —
chunks never shuffle by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def augment_chunks_with_head(
    chunks: DataFrame,
    docs: DataFrame,
    doc_id: str = "doc_id",
    chunk_text: str = "text",
    doc_text: str = "text",
    head_tokens: int = 16,
    out_col: str = "text_ctx",
    broadcast_docs: bool = True,
) -> DataFrame:
    """Prepend each chunk with its document's leading ``head_tokens``
    tokens: ``<doc head> || '\\n\\n' || <chunk>``.

    ``broadcast_docs`` keeps the (doc_id, head) side broadcast when the
    document table fits (heads are tiny even when documents are not);
    set False to fall back to a shuffle join for huge corpora.
    """
    head = F.array_join(
        F.slice(F.split(F.col(doc_text), r"\s+"), 1, head_tokens), " "
    )
    doc_heads = docs.select(F.col(doc_id), head.alias("__head"))
    if broadcast_docs:
        doc_heads = F.broadcast(doc_heads)
    return (
        chunks.join(doc_heads, doc_id, "left")
        .withColumn(
            out_col,
            F.concat_ws("\n\n", F.col("__head"), F.col(chunk_text)),
        )
        .drop("__head")
    )
