"""Schema compilation tests (mirrors reference tests/test_spec.py:142-226)."""

import pytest
from pyspark.sql import types as T

from vechord_spark.errors import SchemaError
from vechord_spark.spec import (
    Column,
    Keyword,
    KeywordIndex,
    MultiVector,
    MultiVectorIndex,
    TableSpec,
    UniqueIndex,
    Vector,
    VectorIndex,
    uuid7,
)


def chunk_spec():
    return TableSpec(
        "chunk",
        [
            Column("uid", "uuid", primary_key=True),
            Column("doc_id", "string", foreign_key=("document", "uid")),
            Column("text", "string"),
            Column("vec", Vector(128), index=VectorIndex(distance="cos", lists=32)),
            Column("keyword", Keyword()),
        ],
    )


def test_struct_type_compilation():
    st = chunk_spec().struct_type()
    assert st == T.StructType(
        [
            T.StructField("uid", T.StringType(), False),
            T.StructField("doc_id", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("vec", T.ArrayType(T.FloatType(), False), True),
            T.StructField("keyword", T.StringType(), True),
        ]
    )


def test_multivector_type():
    spec = TableSpec("s", [Column("vecs", MultiVector(64))])
    assert spec.struct_type()["vecs"].dataType == T.ArrayType(
        T.ArrayType(T.FloatType(), False)
    )
    assert isinstance(spec.column("vecs").index, MultiVectorIndex)


def test_default_index_discovery():
    spec = chunk_spec()
    assert spec.vector_column.name == "vec"
    assert spec.vector_column.index.distance == "cos"
    assert spec.keyword_column.name == "keyword"
    assert isinstance(spec.column("keyword").index, KeywordIndex)
    assert spec.multivec_column is None


def test_non_vec_columns_excludes_payloads():
    assert chunk_spec().non_vec_columns() == ["uid", "doc_id", "text"]


def test_foreign_keys_and_pk():
    spec = chunk_spec()
    assert spec.primary_key.name == "uid"
    assert spec.foreign_keys() == [("doc_id", "document", "uid")]


def test_unique_via_index():
    col = Column("sid", "string", index=UniqueIndex())
    assert col.unique
    spec = TableSpec("u", [col])
    assert spec.unique_columns() == ["sid"]


def test_probe_default_matches_reference():
    # ceil(lists/16), reference vechord/client.py:285-292
    assert VectorIndex(lists=32).default_probes == 2
    assert VectorIndex(lists=100).default_probes == 7
    assert VectorIndex().default_probes is None


def test_bad_declarations_raise():
    with pytest.raises(SchemaError):
        Column("v", Vector(8), index=VectorIndex(distance="hamming"))
    with pytest.raises(SchemaError):
        TableSpec("t", [Column("a"), Column("a")])
    with pytest.raises(SchemaError):
        Column("x", "frobnicate")


def test_list_types():
    spec = TableSpec("t", [Column("tags", "list[string]"), Column("ids", "list[int]")])
    assert spec.struct_type()["tags"].dataType == T.ArrayType(T.StringType())
    assert spec.struct_type()["ids"].dataType == T.ArrayType(T.LongType())


def test_uuid7_sortable():
    import time

    a = uuid7()
    time.sleep(0.002)  # distinct milliseconds -> time-prefix ordering
    b = uuid7()
    assert len(a) == 36 and a[14] == "7"
    assert a < b
