"""Pipeline staging + atomic publish (reference transaction semantics,
tests/test_table.py:261-298: failure leaves no partial rows)."""

import pytest
from pyspark.sql import functions as F

from vechord_spark.plans.pipeline import PipelineRun, VechordPipeline, inject_stage
from vechord_spark.registry import VechordRegistry
from vechord_spark.spec import Column, TableSpec
from pyspark.sql import types as T


@pytest.fixture()
def reg(spark, tmp_path):
    r = VechordRegistry("pipe", str(tmp_path), spark)
    r.register(TableSpec("document", [Column("uid", "int", primary_key=True), Column("text", "string")]))
    r.register(
        TableSpec(
            "chunk",
            [Column("uid", "string", primary_key=True), Column("doc_id", "int"), Column("text", "string")],
        )
    )
    return r


def test_two_stage_pipeline_commits_both(reg, spark):
    def load_docs(run, _):
        df = spark.createDataFrame(
            [(1, "alpha. beta"), (2, "gamma. delta")], "uid int, text string"
        )
        return run.stage("document", df)

    def chunk_docs(run, docs):
        chunks = docs.select(
            F.col("uid").alias("doc_id"),
            F.posexplode(F.split("text", "\\. ")).alias("seq", "ctext"),
        ).select(
            F.concat_ws("-", "doc_id", "seq").alias("uid"),
            "doc_id",
            F.col("ctext").alias("text"),
        )
        return run.stage("chunk", chunks)

    VechordPipeline(reg, [load_docs, chunk_docs]).run()
    assert reg.load("document").count() == 2
    assert reg.load("chunk").count() == 4


def test_failed_pipeline_leaves_no_partial_rows(reg, spark):
    def load_docs(run, _):
        df = spark.createDataFrame([(1, "alpha")], "uid int, text string")
        return run.stage("document", df)

    def explode_fail(run, docs):
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        VechordPipeline(reg, [load_docs, explode_fail]).run()
    # all-or-nothing: stage 1's rows must not be visible
    assert reg.load("document").count() == 0


def test_stage_output_visible_to_next_stage_only(reg, spark):
    """The run-id staging replaces the reference's xmin transaction
    buffer (vechord/client.py:221-222): downstream sees this run's rows
    before commit, external readers do not."""
    run = PipelineRun(reg)
    staged = run.stage(
        "document", spark.createDataFrame([(9, "x")], "uid int, text string")
    )
    assert staged.count() == 1  # downstream view
    assert reg.load("document").count() == 0  # external view
    run.commit()
    assert reg.load("document").count() == 1


def test_inject_stage_fan_out(reg, spark):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("piece", T.StringType()),
        ]
    )
    fn = lambda row: [
        {"doc_id": row["uid"], "piece": p} for p in row["text"].split(" ")
    ]
    stage = inject_stage(fn, schema, input_fields=["uid", "text"])
    df = spark.createDataFrame([(1, "a b c"), (2, "d")], "uid long, text string")
    out = stage(df).collect()
    assert len(out) == 4
