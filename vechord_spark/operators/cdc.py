"""Content-defined chunking (rolling Gear hash) + shared-passage
detection — partial-duplicate dedup below the document level.

Document-level dedup (operators/dedup.py: exact / MinHash / SimHash /
embedding) misses the most common contamination in crawl corpora:
*passages* copied between otherwise-different documents (boilerplate,
quotes, syndicated paragraphs — the failure mode motivating
exact-substring dedup in Lee et al. 2022). Content-defined chunking is
the classic answer: split text at positions where a rolling hash of
the last ``window`` bytes hits a mask, so chunk boundaries depend only
on LOCAL content — insert a byte anywhere and every chunk outside its
~window-sized neighborhood is unchanged (the resynchronization
property fixed-size chunking lacks). Shared passages then surface as
shared chunk fingerprints, found with one groupBy.

The rolling hash is the Gear construction (the FastCDC family, Xia et
al., USENIX ATC 2016): ``h_i = (h_{i-1} << 1) + GEAR[byte_i]`` in
uint64 — each byte's contribution shifts out after 64 steps, giving an
implicit 64-byte window with one table lookup + shift + add per byte.
Our GEAR table is 256 seeded-PCG64 uint64s (fixed seed, part of the
format). A position is a boundary when ``h & mask == 0`` with
``mask = 2^mask_bits - 1`` (expected chunk length ``2^mask_bits``).
Note the EFFECTIVE boundary window is ``mask_bits`` bytes, not 64:
bit ``j`` of the hash only sees bytes up to ``j`` positions back, so
a low-bit mask consults only the last ``mask_bits`` bytes (FastCDC's
spread-bit masks widen this; we keep the low-bit mask because the
narrow window makes resynchronization exact after just ``mask_bits``
shared bytes, and the mask is part of the pinned chunk format). No
min/max clamps: boundaries stay a pure LOCAL function of content,
which keeps the resynchronization property exact (and testable)
instead of statistically-mostly-true.

Spark shape at 100 TB: chunking is one Arrow-batched scan (the
per-document numpy pass is 64 vectorized shift-adds, not a Python
byte loop); the exchange carries only ``(doc_id, 16-byte chunk md5)``
rows; pair generation is bucket-local within each chunk-hash group —
the same bounded shape as the MinHash band join, with the same
mega-bucket cap (a chunk shared by thousands of documents is
boilerplate; it is counted and dropped, not exploded into n^2 pairs).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd  # module-top: pandas-UDF string type hints resolve here

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_GEAR_SEED = 0x5EED_CDC0
_WINDOW = 64  # implicit: bit i of a byte's gear value ages out after 64-i shifts


def _gear_table() -> np.ndarray:
    # plain uniform uint64s (NOT forced odd: the newest byte's gear
    # value lands unshifted in the hash, so an all-odd table would pin
    # the low bit to 1 and `h & mask == 0` could never fire)
    rng = np.random.default_rng(_GEAR_SEED)
    hi = rng.integers(0, 1 << 32, size=256, dtype=np.uint64)
    lo = rng.integers(0, 1 << 32, size=256, dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


_GEAR = _gear_table()


def gear_hashes(data: bytes) -> np.ndarray:
    """uint64 rolling Gear hash at every byte position (vectorized:
    64 shift-adds over the whole array instead of a per-byte loop).
    ``h[i]`` covers bytes ``max(0, i-63)..i``."""
    b = np.frombuffer(data, dtype=np.uint8)
    g = _GEAR[b]
    h = np.zeros(len(b), dtype=np.uint64)
    for k in range(min(_WINDOW, len(b))):
        # contribution of the byte k positions back, aged by k shifts
        h[k:] += g[: len(b) - k] << np.uint64(k)
    return h


def cdc_boundaries(data: bytes, mask_bits: int = 6) -> list[int]:
    """End positions (exclusive) of content-defined chunks: every
    ``i+1`` where ``hash & mask == 0``, plus ``len(data)``."""
    if not data:
        return []
    mask = np.uint64((1 << mask_bits) - 1)
    h = gear_hashes(data)
    ends = (np.nonzero((h & mask) == 0)[0] + 1).tolist()
    if not ends or ends[-1] != len(data):
        ends.append(len(data))
    return ends

def cdc_chunks(text: str, mask_bits: int = 6) -> list[tuple[int, str]]:
    """``(offset, md5-hex)`` per content-defined chunk of the UTF-8
    encoding of ``text``."""
    data = text.encode("utf-8")
    out = []
    start = 0
    for end in cdc_boundaries(data, mask_bits):
        out.append((start, hashlib.md5(data[start:end]).hexdigest()))
        start = end
    return out


def cdc_chunks_with_len(
    text: str, mask_bits: int = 6
) -> list[tuple[int, int, str]]:
    """``(offset, length, md5-hex)`` per content-defined chunk."""
    data = text.encode("utf-8")
    out = []
    start = 0
    for end in cdc_boundaries(data, mask_bits):
        out.append(
            (start, end - start, hashlib.md5(data[start:end]).hexdigest())
        )
        start = end
    return out


def cdc_chunk_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_bits: int = 6,
) -> DataFrame:
    """One row per (document, chunk): ``(doc_id, offset, chunk_hash)``.
    The decode-and-hash pass is Arrow-batched; the output frame is the
    narrow exchange everything downstream runs on."""

    id_field = df.schema[id_col].dataType

    def _gen(batches):
        for pdf in batches:
            ids, offs, lens, hs = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for off, ln, hx in cdc_chunks_with_len(text or "", mask_bits):
                    ids.append(did)
                    offs.append(off)
                    lens.append(ln)
                    hs.append(hx)
            yield pd.DataFrame(
                {"doc_id": ids, "offset": offs, "length": lens, "chunk_hash": hs}
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(text_col)
    ).mapInPandas(
        _gen,
        f"doc_id {id_field.simpleString()}, offset int, length int,"
        " chunk_hash string",
    )


def shared_chunk_pairs(
    chunks: DataFrame,
    min_shared: int = 2,
    max_bucket: int = 256,
    min_len: int = 16,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` distinct chunk
    fingerprints: ``(id_a, id_b, shared_chunks)``, id_a < id_b.

    Chunks shorter than ``min_len`` bytes carry no dedup signal (a
    2-byte chunk recurs across unrelated documents by construction —
    CDC without a floor emits them whenever two boundaries land close)
    and are excluded from pair generation; the chunking itself stays
    floor-free so resynchronization remains exact.

    Bucket-local pair generation within each chunk-hash group; groups
    larger than ``max_bucket`` documents are boilerplate (a chunk
    present in thousands of docs) and are dropped rather than exploded
    — the same cap contract as the MinHash band join. Duplicate
    occurrences of a chunk inside ONE document count once.

    Plan shape: ONE exchange on ``chunk_hash`` serves the whole bucket
    stage — the per-(doc, chunk) distinct (hash aggregation is
    satisfied by subset partitioning), the bucket-size window, and the
    capped in-group pair expansion (a codegen array expression over
    the <= max_bucket sorted doc ids, no self-join) — followed by one
    exchange for the (id_a, id_b) count. The previous
    sizes-join-self-join shape consumed the chunk frame four times
    (re-running the Arrow chunking pass per branch) across ~10
    exchanges; a mega bucket concentrates on one partition in either
    shape, and is filtered by the window count before any expansion."""
    per_doc = (
        chunks.filter(F.col("length") >= min_len)
        .select("chunk_hash", "doc_id")
        .repartition("chunk_hash")
        .dropDuplicates(["chunk_hash", "doc_id"])
    )
    bucket_n = F.count(F.lit(1)).over(Window.partitionBy("chunk_hash"))
    buckets = (
        per_doc.withColumn("bucket_n", bucket_n)
        .filter(F.col("bucket_n") <= max_bucket)
        .groupBy("chunk_hash")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pair = F.explode(
        F.expr(
            "flatten(transform(ds, (x, i) ->"
            " transform(slice(ds, i + 2, size(ds)),"
            " y -> struct(x AS id_a, y AS id_b))))"
        )
    ).alias("p")
    return (
        buckets.select(pair)
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
        .filter(F.col("shared_chunks") >= min_shared)
    )
