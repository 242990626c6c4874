"""Multimodal (image / audio / video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct —
the pattern a 100 TB training-data pipeline needs: the heavy bytes
stay columnar (parquet binary, never shuffled unless selected) while
metadata drives filtering/partitioning.

The decode/feature kernels themselves need codec libraries that are
not installed in this container, so each kernel is either a
clearly-marked ``NotImplementedError`` stub or a deterministic fake
(documented below); the Spark-side plumbing — schema, batch shape,
``mapInPandas`` signatures, partition sizing — is real and tested.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("data", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType(), False), True),
    ]
)


def deterministic_media_feature(media_id: str, data: bytes | None, dim: int = 64) -> list[float]:
    """Deterministic FAKE feature extractor (stands in for a real
    image/audio encoder): bytes -> seeded PRNG -> unit-norm vector.
    Deterministic in (media_id, data) so tests are hash-stable."""
    import hashlib
    import numpy as np

    h = hashlib.sha256((media_id or "").encode() + (data or b"")).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    v = rng.standard_normal(dim)
    v = v / (np.linalg.norm(v) or 1.0)
    return [float(x) for x in v]


def extract_media_features(df: DataFrame, dim: int = 64) -> DataFrame:
    """media table -> (media_id, feature) via Arrow-batched mapInPandas.

    Batch shape matters at scale: each pandas batch holds whole binary
    payloads, so cap ``spark.sql.execution.arrow.maxRecordsPerBatch``
    (e.g. 256) when payloads are MB-sized to bound executor memory.
    """
    import pandas as pd

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [
                        deterministic_media_feature(m, d, dim)
                        for m, d in zip(pdf["media_id"], pdf["data"])
                    ],
                }
            )

    return df.select("media_id", "data").mapInPandas(_extract, FEATURE_SCHEMA)


def decode_image(data: bytes):
    """STUB: real decode needs Pillow/opencv (not installed)."""
    raise NotImplementedError("image decode requires Pillow (not installed)")


def resize_image(data: bytes, width: int, height: int) -> bytes:
    """STUB: see decode_image."""
    raise NotImplementedError("image resize requires Pillow (not installed)")


def sample_video_frames(data: bytes, every_ms: int) -> list[bytes]:
    """STUB: frame sampling requires ffmpeg/opencv (not installed)."""
    raise NotImplementedError("video frame sampling requires ffmpeg (not installed)")
