"""Declarative table schemas compiled to Spark ``StructType``.

The reference derives PostgreSQL DDL from Python type hints on msgspec
Structs (vechord/spec.py:298-369, 494-648). Here a table is declared as a
``TableSpec`` of ``Column`` objects; the spec compiles to a ``StructType``
plus engine metadata Spark's type system cannot carry (vector dimension,
tokenizer model, primary/foreign keys, index descriptors).

Type mapping (reference vechord/spec.py:298-307 -> Spark):

    int      -> LongType        str   -> StringType
    float    -> DoubleType      bool  -> BooleanType
    bytes    -> BinaryType      uuid  -> StringType (canonical hex)
    datetime -> TimestampType   json  -> StringType (+ get_json_object)
    Vector[d]       -> ArrayType(FloatType(), containsNull=False)
    list[Vector[d]] -> ArrayType(ArrayType(FloatType(), False))
    Keyword         -> StringType (+ derived terms column, see operators.bm25)
    list[T]         -> ArrayType(T)
"""

from __future__ import annotations

import math
import time
import uuid as _uuid
from dataclasses import dataclass, field
from typing import Any, Iterable, Sequence

from pyspark.sql import types as T

from vechord_spark.errors import SchemaError

# ---------------------------------------------------------------------------
# engine value types
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Vector:
    """Fixed-dimension float32 vector column type.

    Reference: ``Vector[dim]`` metaclass type (vechord/spec.py:59-132);
    only f32 is supported there and here.
    """

    dim: int

    def spark_type(self) -> T.DataType:
        return T.ArrayType(T.FloatType(), containsNull=False)


@dataclass(frozen=True)
class MultiVector:
    """Array of fixed-dimension vectors (late-interaction / ColBERT shape).

    Reference: ``list[Vector[dim]]`` -> ``VECTOR(dim)[]``
    (vechord/spec.py:331-334).
    """

    dim: int

    def spark_type(self) -> T.DataType:
        return T.ArrayType(T.ArrayType(T.FloatType(), containsNull=False))


@dataclass(frozen=True)
class SparseVector:
    """Sparse vector column type: parallel ``indices``/``values``
    arrays over a fixed dimensionality — the reference's
    SparseEmbedding shape (vechord/model/internal.py:43-46, produced
    by its Splade++ provider but never stored or searched there; no
    sparse column type exists in its schema layer, SURVEY §1.2). Here
    it is a first-class column: stored as a struct, searched through a
    persisted inverted-postings index
    (registry.build_sparse_index / search_by_sparse)."""

    dim: int

    def spark_type(self) -> T.DataType:
        return T.StructType(
            [
                T.StructField(
                    "indices", T.ArrayType(T.IntegerType(), containsNull=False)
                ),
                T.StructField(
                    "values", T.ArrayType(T.FloatType(), containsNull=False)
                ),
            ]
        )


@dataclass(frozen=True)
class Keyword:
    """Raw text destined for BM25 keyword search.

    Reference: ``Keyword(str)`` is tokenized server-side into a
    ``bm25vector`` (vechord/spec.py:258-295). In Spark the raw text is
    stored as a string; BM25 statistics live in derived DataFrames built
    by :mod:`vechord_spark.operators.bm25`.
    """

    tokenizer: str = "simple"

    def spark_type(self) -> T.DataType:
        return T.StringType()


# ---------------------------------------------------------------------------
# index metadata (declarative, mirrors vechord/spec.py:378-491)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VectorIndex:
    """ANN index request: distance in {l2, cos, dot}, ``lists`` IVF cells.

    Reference: vechord/spec.py:417-444. The Spark engine realizes this as
    an IVF layout job (operators/ivf.py): KMeans centroids + a
    ``centroid_id`` column the table is clustered by, so probe filtering
    becomes partition pruning.

    Quantization is part of the DECLARED index, as in the reference's
    DDL (vechord/spec.py:437-444 emits ``residual_quantization = true``
    exactly when the distance is l2): ``pq_m`` requests PQ codes in the
    clustered layout; ``residual`` defaults (None) to the reference's
    policy — residual encoding iff PQ is on AND the distance is l2 —
    and can be forced either way; ``opq`` trains the rotation first.
    ``registry.build_vector_index`` reads these as its defaults, so
    ``build_vector_index(name)`` alone builds what the schema declared.
    """

    distance: str = "l2"
    lists: int | None = None
    pq_m: int | None = None
    pq_ksub: int = 256
    residual: bool | None = None
    opq: bool = False
    # one-bit-per-dimension RaBitQ codes in the clustered layout — the
    # quantization the reference's vchordrq index actually runs
    # (vechord/spec.py:437-444; operators/rabitq.py). Its OWN
    # quantization family: excludes pq_m/opq (nothing codebook-based to
    # train) and spherical build options (codes quantize raw-space
    # residuals, same constraint as residual PQ).
    rabitq: bool = False

    def __post_init__(self) -> None:
        if self.distance not in ("l2", "cos", "dot"):
            raise SchemaError(f"unknown distance {self.distance!r}")
        if self.pq_m is None and (self.residual or self.opq):
            raise SchemaError(
                "residual/opq are PQ options: declare pq_m with them"
            )
        if self.residual and self.opq:
            raise SchemaError(
                "residual excludes opq (the rotation is trained for "
                "raw-vector PQ)"
            )
        if self.rabitq and (self.pq_m is not None or self.opq or self.residual):
            raise SchemaError(
                "rabitq is its own quantization: it excludes pq_m/opq/"
                "residual (one bit per dimension over IVF residuals, "
                "no codebook)"
            )

    @property
    def resolved_residual(self) -> bool:
        """The reference's default policy (vechord/spec.py:440):
        residual quantization iff PQ is requested and the coarse
        distance is l2 — overridable by declaring ``residual``."""
        if self.residual is not None:
            return bool(self.residual)
        return self.pq_m is not None and self.distance == "l2"

    @property
    def default_probes(self) -> int | None:
        """Reference default: ceil(lists/16) (vechord/client.py:285-292)."""
        if self.lists is None:
            return None
        return math.ceil(self.lists / 16)


@dataclass(frozen=True)
class MultiVectorIndex:
    """MaxSim index request (vechord/spec.py:447-464)."""

    lists: int | None = None


@dataclass(frozen=True)
class KeywordIndex:
    """BM25 index request (vechord/spec.py:467-479)."""

    tokenizer: str = "simple"
    k1: float = 1.2
    b: float = 0.75


@dataclass(frozen=True)
class UniqueIndex:
    """Unique constraint (vechord/spec.py:482-491)."""

    null_not_distinct: bool = False


# ---------------------------------------------------------------------------
# predicates
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AnyOf:
    """IN-list predicate marker (reference vechord/spec.py:513-516)."""

    values: tuple

    def __init__(self, values: Iterable[Any]) -> None:
        object.__setattr__(self, "values", tuple(values))


# ---------------------------------------------------------------------------
# columns and tables
# ---------------------------------------------------------------------------

_PRIMITIVES: dict[str, T.DataType] = {
    "int": T.LongType(),
    "long": T.LongType(),
    "str": T.StringType(),
    "string": T.StringType(),
    "text": T.StringType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
    "binary": T.BinaryType(),
    "uuid": T.StringType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "json": T.StringType(),
}


def _resolve_type(dtype: Any) -> tuple[T.DataType, Any]:
    """Return (spark_type, engine_type). engine_type keeps Vector/Keyword
    metadata that StructType cannot carry."""
    if isinstance(dtype, (Vector, MultiVector, Keyword, SparseVector)):
        return dtype.spark_type(), dtype
    if isinstance(dtype, T.DataType):
        return dtype, None
    if isinstance(dtype, str):
        key = dtype.lower()
        if key.startswith("list[") and key.endswith("]"):
            inner, _ = _resolve_type(key[5:-1])
            return T.ArrayType(inner), None
        if key in _PRIMITIVES:
            return _PRIMITIVES[key], None
        raise SchemaError(f"unknown column type {dtype!r}")
    raise SchemaError(f"unknown column type {dtype!r}")


@dataclass
class Column:
    """One declared column.

    ``foreign_key`` is ``(table_name, column_name)`` and implies the
    cascade-on-delete semantics of the reference
    (vechord/spec.py:135-180): deleting parent rows deletes referencing
    child rows via an anti-join rewrite (registry.delete).
    """

    name: str
    dtype: Any = "string"
    nullable: bool = True
    primary_key: bool = False
    auto_increment: bool = False
    unique: bool = False
    foreign_key: tuple[str, str] | None = None
    index: Any = None  # VectorIndex | MultiVectorIndex | KeywordIndex | UniqueIndex

    def __post_init__(self) -> None:
        self.spark_type, self.engine_type = _resolve_type(self.dtype)
        if self.foreign_key is not None:
            # normalize "table.column" shorthand and REJECT anything
            # else that isn't a (table, column) pair: a bare string
            # used to be silently unpacked character-wise, so the
            # cascade anti-join matched no parent table and deletes
            # quietly stopped cascading (found by the r13 verify drive)
            fk = self.foreign_key
            if isinstance(fk, str):
                parts = fk.split(".")
                if len(parts) != 2 or not all(parts):
                    raise SchemaError(
                        f"foreign_key string for column {self.name!r} must "
                        f"be 'table.column', got {fk!r}"
                    )
                self.foreign_key = (parts[0], parts[1])
            else:
                fk = tuple(fk)
                if len(fk) != 2 or not all(
                    isinstance(p, str) and p for p in fk
                ):
                    raise SchemaError(
                        f"foreign_key for column {self.name!r} must be "
                        f"(table, column), got {self.foreign_key!r}"
                    )
                self.foreign_key = fk
        if self.primary_key:
            # PRIMARY KEY implies NOT NULL + UNIQUE, as in the
            # reference's Postgres DDL (vechord/spec.py:519-648) —
            # append() enforces it with the same anti-join check as
            # declared UNIQUE columns.
            self.nullable = False
            self.unique = True
        if self.auto_increment and self.spark_type.typeName() != "long":
            # 64-bit only, like the reference's BIGSERIAL
            # (vechord/spec.py:213-255): generated ids stride 2^33 per
            # partition (monotonically_increasing_id), which overflows
            # a 32-bit column on any multi-partition batch
            raise SchemaError(
                f"auto_increment column {self.name!r} must be 'long' "
                "(BIGSERIAL semantics; 32-bit ids overflow the "
                "partition stride)"
            )
        if isinstance(self.index, UniqueIndex):
            self.unique = True
        # default-index discovery, mirroring vechord/spec.py:534-572:
        # a bare Vector column gets a default VectorIndex, a bare
        # MultiVector a MultiVectorIndex, a bare Keyword a KeywordIndex.
        if self.index is None:
            if isinstance(self.engine_type, Vector):
                self.index = VectorIndex()
            elif isinstance(self.engine_type, MultiVector):
                self.index = MultiVectorIndex()
            elif isinstance(self.engine_type, Keyword):
                self.index = KeywordIndex(tokenizer=self.engine_type.tokenizer)

    def to_field(self) -> T.StructField:
        return T.StructField(self.name, self.spark_type, self.nullable)


@dataclass
class TableSpec:
    """A declared table: name + ordered columns + derived metadata.

    The reference equivalent is a ``Table`` msgspec subclass whose type
    hints are walked by ``table_schema()`` (vechord/spec.py:519-648).
    """

    name: str
    columns: Sequence[Column]
    _by_name: dict[str, Column] = field(init=False, repr=False)

    def __post_init__(self) -> None:
        seen: set[str] = set()
        for c in self.columns:
            if c.name in seen:
                raise SchemaError(f"duplicate column {c.name!r} in {self.name}")
            seen.add(c.name)
        self._by_name = {c.name: c for c in self.columns}

    # -- schema ------------------------------------------------------------
    def struct_type(self) -> T.StructType:
        return T.StructType([c.to_field() for c in self.columns])

    def column(self, name: str) -> Column:
        try:
            return self._by_name[name]
        except KeyError:
            raise SchemaError(f"no column {name!r} in table {self.name}") from None

    def add_column(self, col: Column) -> None:
        """Append a column keeping the name lookup coherent — the ONLY
        sanctioned way to grow a spec after construction (ALTER TABLE:
        registry.alter_table_add_column and its overlay replay).
        Appending to ``columns`` directly would leave ``column()``
        blind to the new name."""
        if col.name in self._by_name:
            raise SchemaError(
                f"table {self.name} already has a column {col.name!r}"
            )
        self.columns.append(col)
        self._by_name[col.name] = col

    @property
    def field_names(self) -> list[str]:
        return [c.name for c in self.columns]

    # -- discovery helpers (mirror vechord/spec.py:534-596) ----------------
    @property
    def primary_key(self) -> Column | None:
        for c in self.columns:
            if c.primary_key:
                return c
        return None

    @property
    def auto_increment_column(self) -> Column | None:
        for c in self.columns:
            if c.auto_increment:
                return c
        return None

    @property
    def vector_column(self) -> Column | None:
        """First single-vector column (at most one is indexed; first wins,
        as in vechord/spec.py:534-546)."""
        for c in self.columns:
            if isinstance(c.engine_type, Vector):
                return c
        return None

    @property
    def multivec_column(self) -> Column | None:
        for c in self.columns:
            if isinstance(c.engine_type, MultiVector):
                return c
        return None

    @property
    def keyword_column(self) -> Column | None:
        for c in self.columns:
            if isinstance(c.engine_type, Keyword):
                return c
        return None

    @property
    def sparse_column(self) -> Column | None:
        for c in self.columns:
            if isinstance(c.engine_type, SparseVector):
                return c
        return None

    def non_vec_columns(self) -> list[str]:
        """Default projection for search results: every column except
        vector / multivector / keyword payloads
        (reference vechord/spec.py:585-596). Pruning the wide vector
        columns out of result scans is the single biggest IO win at
        scale — Catalyst turns this into parquet column pruning."""
        return [
            c.name
            for c in self.columns
            if not isinstance(
                c.engine_type, (Vector, MultiVector, Keyword, SparseVector)
            )
        ]

    def foreign_keys(self) -> list[tuple[str, str, str]]:
        """[(local_col, parent_table, parent_col), ...]"""
        return [
            (c.name, c.foreign_key[0], c.foreign_key[1])
            for c in self.columns
            if c.foreign_key is not None
        ]

    def unique_columns(self) -> list[str]:
        return [c.name for c in self.columns if c.unique]


# ---------------------------------------------------------------------------
# uuid7 — time-sortable primary keys
# ---------------------------------------------------------------------------


def uuid7() -> str:
    """Generate a UUIDv7 (time-ordered) string.

    The reference generates uuid7 client-side for ``PrimaryKeyUUID``
    (vechord/spec.py:213-255) so primary keys sort by insertion time;
    we keep that property for deterministic tie-breaks in top-k.
    """
    ns = time.time_ns()
    ms = ns // 1_000_000
    rand = _uuid.uuid4().int & ((1 << 74) - 1)
    value = (ms & ((1 << 48) - 1)) << 80
    value |= 0x7 << 76  # version 7
    value |= (rand >> 64) << 64
    value |= 0b10 << 62  # variant
    value |= rand & ((1 << 62) - 1)
    return str(_uuid.UUID(int=value))
