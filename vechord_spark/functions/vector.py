"""Vector distance expressions — pure Spark SQL, no Python UDFs.

The reference delegates distance to pgvector operators ``<->`` (L2),
``<=>`` (cosine distance), ``<#>`` (negative inner product)
(vechord/spec.py:417-444). Here each is a Column expression built from
``zip_with`` + ``aggregate`` so it stays inside whole-stage codegen —
the hot path of every k-NN scan runs JVM-side over the raw arrays with
no serialization boundary.

All arithmetic is performed in DOUBLE regardless of the storage type
(float32 arrays) so results are accumulation-stable and match a DuckDB
oracle computing over ``::DOUBLE[]``.

Semantics parity: Postgres operators return *distances* (ascending =
most similar); ``negative_dot`` preserves that convention for
inner-product search (vechord/spec.py:433-435).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, functions as F

ColumnOrName = Union[Column, str]


def _as_col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _as_vec(v: Union[ColumnOrName, Sequence[float]]) -> Column:
    if isinstance(v, (Column, str)):
        return _as_col(v)
    # one array<double> Literal, not CreateArray(lit x dim): a 64-dim
    # query built element-wise costs 64 py4j round-trips and a 64-child
    # expression tree per use site, which dominates driver-side plan
    # build for the vector query family
    return F.lit([float(x) for x in v])


def _sum_products(a: Column, b: Column) -> Column:
    # aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_product(a: ColumnOrName, b: Union[ColumnOrName, Sequence[float]]) -> Column:
    """Inner product of two float-array columns (or a column and a literal
    query vector)."""
    return _sum_products(_as_col(a) if isinstance(a, (Column, str)) else _as_vec(a), _as_vec(b))


def negative_dot(a: ColumnOrName, b: Union[ColumnOrName, Sequence[float]]) -> Column:
    """Negative inner product — the pgvector ``<#>`` distance
    (ascending order = most similar)."""
    return -dot_product(a, b)


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def vector_norm(a: ColumnOrName) -> Column:
    """Euclidean norm of a float-array column (double arithmetic)."""
    return _norm(_as_col(a))


def cosine_similarity(
    a: ColumnOrName, b: Union[ColumnOrName, Sequence[float]]
) -> Column:
    """cos(a, b) = dot / (|a| |b|)."""
    ca = _as_vec(a)
    cb = _as_vec(b)
    return _sum_products(ca, cb) / (_norm(ca) * _norm(cb))


def cosine_distance(
    a: ColumnOrName, b: Union[ColumnOrName, Sequence[float]]
) -> Column:
    """pgvector ``<=>``: 1 - cosine similarity."""
    return F.lit(1.0) - cosine_similarity(a, b)


def l2_distance(a: ColumnOrName, b: Union[ColumnOrName, Sequence[float]]) -> Column:
    """Euclidean distance — pgvector ``<->``."""
    diffsq = F.zip_with(
        _as_vec(a),
        _as_vec(b),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.sqrt(F.aggregate(diffsq, F.lit(0.0), lambda acc, v: acc + v))


_DISTANCES = {
    "l2": l2_distance,
    "cos": cosine_distance,
    "dot": negative_dot,
}


def vector_distance(
    distance: str, a: ColumnOrName, b: Union[ColumnOrName, Sequence[float]]
) -> Column:
    """Distance expression by name — {l2, cos, dot}, matching the
    reference's ``VectorIndex.distance`` choices (vechord/spec.py:417-435).
    Ascending order = most similar for all three."""
    try:
        fn = _DISTANCES[distance]
    except KeyError:
        raise ValueError(f"unknown distance {distance!r}") from None
    return fn(a, b)


def quantize_int8(vec: ColumnOrName, scale: float = 127.0) -> Column:
    """Symmetric int8 quantization of a float vector: round-half-up via
    ``floor(x·scale + 0.5)``, clamped to [-127, 127].

    The 100 TB embedding-storage op: int8 cuts vector shuffle/storage
    bytes 4× and is the estimate layer of estimate→refine ANN (the
    quantized-prefilter idea behind the reference index's internals).
    floor-based rounding (not ``round``) so every engine reproduces the
    same codes bit-for-bit; DuckDB-oracle equivalent:
    ``list_transform(v, x -> CAST(greatest(-127, least(127,
    floor(CAST(x AS DOUBLE) * 127 + 0.5))) AS TINYINT))``.
    """
    v = _as_vec(vec)
    return F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x.cast("double") * scale + F.lit(0.5))),
        ).cast("tinyint"),
    )


def binary_signature(vec: ColumnOrName, dim: int, word_bits: int = 32) -> Column:
    """Sign-bit binary quantization: ``array<long>`` of ``word_bits``-bit
    words, bit ``i`` (within its word) set when ``vec[i] > 0`` — the
    32x-compression estimate representation of binary-hash retrieval
    (pgvector ``bit`` vectors / the BPR recipe). 32 bits per long keeps
    every word positive, so Spark and DuckDB integer semantics agree
    bit-for-bit (no sign-bit edge at 1<<63).

    Powers of two come from ``pow(2, i)`` in double (exact below 2^53)
    so the same expression transcribes to the SQL oracle verbatim.
    """
    v = _as_col(vec)
    n_words = (dim + word_bits - 1) // word_bits
    words = []
    def _word(lo: int, hi: int) -> Column:
        return F.aggregate(
            F.sequence(F.lit(lo), F.lit(hi - 1)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.when(
                F.element_at(v, i.cast("int") + 1).cast("double") > 0.0,
                F.pow(F.lit(2.0), (i - lo).cast("double")).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )

    for w in range(n_words):
        lo = w * word_bits
        words.append(_word(lo, min(lo + word_bits, dim)))
    return F.array(*words)


def hamming_distance(a: ColumnOrName, b: Union[ColumnOrName, Column]) -> Column:
    """Hamming distance between two packed-word signature arrays
    (``binary_signature`` outputs): sum of ``bit_count(xor)`` per word."""
    ca, cb = _as_col(a), b if isinstance(b, Column) else _as_col(b)
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def signature_of(vector: Sequence[float], word_bits: int = 32) -> list[int]:
    """Driver-side twin of ``binary_signature`` for literal query
    vectors (bit-identical packing)."""
    out = []
    for w in range(0, len(vector), word_bits):
        word = 0
        for i, x in enumerate(vector[w : w + word_bits]):
            if x > 0:
                word |= 1 << i
        out.append(word)
    return out
