import pytest

from vechord_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("vechord-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture()
def sf_dir():
    return SF_DIR


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture()
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
