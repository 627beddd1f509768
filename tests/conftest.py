from __future__ import annotations

import os

import pytest

from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
HDFC_CSV = "/root/reference/src/main/resources/HDFC.csv"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="engine-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def hdfc_path():
    if not os.path.exists(HDFC_CSV):
        pytest.skip("reference HDFC.csv not available")
    return HDFC_CSV


@pytest.fixture(scope="session")
def quotes(spark, hdfc_path):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.sources import (
        read_quotes_csv,
    )

    return read_quotes_csv(spark, hdfc_path).cache()
