from __future__ import annotations

import os

import pytest

# the local harness runs the driver contract at sf0.001; pin the env
# var BOTH test_entry_contract.SF_DIR and the path-bearing oracles
# (__spark_entry__._oracle_sf_dir) resolve, so Spark queries and
# DuckDB oracles always read the same files
os.environ.setdefault("SPARK_GRAFT_SF_DIR_SMALL",
                      "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("cerberus-cpp-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()
