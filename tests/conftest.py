import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import (BinaryType, StringType, StructField,
                               StructType, TimestampType)

from guackg.session import get_spark
from guackg.testing.gen import generate_corpus

N_TEST_PAGES = 400

PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("GUACKG_SHUFFLE_PARTITIONS", "8")
    s = get_spark("guackg-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    """Deterministic synthetic corpus + golden fixtures (pandas)."""
    return generate_corpus(N_TEST_PAGES)


@pytest.fixture(scope="session")
def pages_df(spark, corpus):
    return spark.createDataFrame(corpus["pages"], schema=PAGES_SCHEMA)


@pytest.fixture(scope="session")
def alias_df(spark, corpus):
    return spark.createDataFrame(corpus["alias_dict"])


@pytest.fixture(scope="session")
def assertions_df(spark, corpus):
    return spark.createDataFrame(corpus["assertions"])
