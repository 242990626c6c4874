"""Error-surface hygiene (reference tests/test_errors.py:12-27 model):
misuse fails fast with the engine's typed exceptions, not deep Spark
stack traces."""

import pytest

from vechord_spark.errors import (
    DimensionMismatch,
    SchemaError,
    TableNotFound,
    UniqueViolation,
)
from vechord_spark.registry import VechordRegistry
from vechord_spark.spec import Column, Keyword, TableSpec, UniqueIndex, Vector


@pytest.fixture()
def reg(spark, tmp_path):
    r = VechordRegistry("err", str(tmp_path), spark)
    r.register(
        TableSpec(
            "chunk",
            [
                Column("uid", "int", primary_key=True),
                Column("tag", "string", index=UniqueIndex()),
                Column("text", Keyword()),
                Column("vec", Vector(4)),
            ],
        )
    )
    r.insert_rows(
        "chunk",
        [{"uid": 1, "tag": "a", "text": "hello world", "vec": [1.0, 0.0, 0.0, 0.0]}],
    )
    return r


def test_unregistered_table(reg):
    with pytest.raises(TableNotFound):
        reg.load("nope")
    with pytest.raises(TableNotFound):
        reg.select_by("nope")


def test_wrong_dim_query_vector(reg):
    with pytest.raises(DimensionMismatch):
        reg.search_by_vector("chunk", [1.0, 2.0])  # table is Vector(4)


def test_bad_distance_name(reg):
    with pytest.raises(ValueError, match="unknown distance"):
        reg.search_by_vector("chunk", [1.0, 0.0, 0.0, 0.0], distance="manhattan")


def test_unique_violation(reg):
    with pytest.raises(UniqueViolation):
        reg.insert_rows(
            "chunk",
            [{"uid": 2, "tag": "a", "text": "dup tag", "vec": [0.0, 1.0, 0.0, 0.0]}],
        )


def test_select_unknown_field(reg):
    with pytest.raises(SchemaError):
        reg.select_by("chunk", fields=["uid", "no_such_col"])


def test_duplicate_column_declaration():
    with pytest.raises(SchemaError, match="duplicate column"):
        TableSpec("t", [Column("a", "int"), Column("a", "string")])


def test_empty_bm25_query_returns_empty(reg):
    assert reg.search_by_keyword("chunk", "!!! ...").count() == 0
