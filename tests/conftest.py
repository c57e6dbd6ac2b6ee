"""Shared fixtures: one SparkSession per test session + DuckDB oracle."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_dist_spark.catalog import TESTDATA_TABLES, table_path
from datafusion_dist_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    wh = tempfile.mkdtemp(prefix="ddspark-warehouse-")
    spark = build_session(
        "ddspark-tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.execution.pyspark.udf.faulthandler.enabled": "false",
            "spark.sql.warehouse.dir": wh,
        },
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()
