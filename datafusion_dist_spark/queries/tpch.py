"""TPC-H-style headline queries over the driver's star schema.

These are the bench.py workload: multi-way joins + two-phase
aggregation + TopK, the shapes that dominate a 100 TB warehouse run.
Plans to expect (verified in tests/test_plans.py): dimension joins go
broadcast, fact-fact joins go sort-merge on co-partitioned shuffles,
aggregates are partial+final, ORDER BY+LIMIT is TopK.

Money arithmetic uses integer cents end-to-end (exact; see
registry.py), divided back to doubles once at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_dist_spark.catalog import load_table
from datafusion_dist_spark.registry import register


def _cents(col) -> F.Column:
    return F.round(F.col(col) * 100).cast("bigint")


@register(
    "tpch_q1",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0
                 AS sum_base_price,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS sum_disc_price,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                        * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS DOUBLE)
                 / 1000000.0 AS sum_charge,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE) / count(*)
                 AS avg_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
                 / count(*) / 100.0 AS avg_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: scan-heavy two-phase aggregation "
    "with 8 aggregates (pyspark_guide 'Common OLAP patterns').",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round("l_quantity").cast("bigint")
    price_c = _cents("l_extendedprice")
    disc_c = _cents("l_discount")
    tax_c = _cents("l_tax")
    disc_price_c4 = price_c * (F.lit(100) - disc_c)
    charge_c6 = disc_price_c4 * (F.lit(100) + tax_c)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            (F.sum(price_c).cast("double") / 100.0).alias("sum_base_price"),
            (F.sum(disc_price_c4).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(charge_c6).cast("double") / 1000000.0).alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price_c).cast("double") / F.count("*") / 100.0).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q3",
    oracle="""
        SELECT l.l_orderkey,
               CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS revenue,
               CAST(o.o_orderdate AS DATE) AS o_orderdate,
               o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey ASC
        LIMIT 10
    """,
    doc="TPC-H Q3 shipping priority: selective dim filter → 3-way join "
    "→ agg → TopK. customer side broadcast-eligible after the segment "
    "filter; lineitem⋈orders is the shuffle join.",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    rev_c4 = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg((F.sum(rev_c4).cast("double") / 10000.0).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "tpch_q5",
    oracle="""
        SELECT n.n_name,
               CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n.n_name
    """,
    doc="TPC-H Q5 local-supplier volume: 6-way join (fact-fact shuffle "
    "+ 4 broadcast dims) + aggregation. The canonical star-join shape "
    "at 100 TB: only lineitem⋈orders shuffles; everything else is "
    "broadcast, so the fact table crosses the network once.",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev_c4 = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(rev_c4).cast("double") / 10000.0).alias("revenue"))
    )


@register(
    "tpch_q6",
    oracle="""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE)
                 / 10000.0 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND ROUND(l_discount*100) BETWEEN 5 AND 7
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecasting revenue: pure scan+filter+global agg — "
    "the predicate-pushdown benchmark (all filters reach the parquet "
    "scan; verified in tests/test_plans.py).",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_c = _cents("l_discount")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & disc_c.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(_cents("l_extendedprice") * disc_c).cast("double") / 10000.0).alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_q10",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS revenue,
               n.n_name
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey ASC
        LIMIT 20
    """,
    doc="TPC-H Q10 returned-item reporting: join + group by customer + "
    "TopK by revenue.",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev_c4 = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(rev_c4).cast("double") / 10000.0).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
