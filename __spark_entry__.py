"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``datafusion_dist_spark``: the registry in
``datafusion_dist_spark/registry.py`` holds one named entry per
implemented operator from SURVEY.md §2 (Spark implementation + DuckDB
oracle SQL); this module just re-exports it in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafusion_dist_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-style
    star join (shuffle fact-fact join + broadcast dims + two-phase
    agg) — the reference's canonical partitioned-hash-join shape
    (README.md:23-56) at warehouse scale."""
    from datafusion_dist_spark.queries.tpch import tpch_q5

    return tpch_q5(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    return registry.oracle_sql()
