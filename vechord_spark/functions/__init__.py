from vechord_spark.functions.vector import (
    cosine_distance,
    cosine_similarity,
    dot_product,
    l2_distance,
    negative_dot,
    vector_distance,
)
from vechord_spark.functions.text import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
    tokenize,
)

__all__ = [
    "cosine_distance",
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "negative_dot",
    "vector_distance",
    "fingerprint",
    "language_id",
    "quality_score",
    "token_count",
    "tokenize",
]
