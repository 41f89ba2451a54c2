from __future__ import annotations

import os

import pytest

from hangarbay_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="hangarbay_spark_tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[8]"),
        shuffle_partitions=os.environ.get(
            "SPARK_GRAFT_TEST_SHUFFLE", "8"
        ),
    )
    yield spark
