"""Sorts, limits, top-k, and window functions (SURVEY §2.C).

Spark's distributed sort is range-partition + per-partition sort —
semantically identical to the reference's SortExec(preserve_partitioning)
+ SortPreservingMergeExec pipeline (``slt:58-63``, golden plan
``planner.rs(tests):195-218``). ORDER BY ... LIMIT k compiles to TopK
(TakeOrderedAndProject), which never materializes the full sort at
scale.

NULL-ordering defaults differ between engines (Spark ASC=NULLS FIRST,
DataFusion/DuckDB ASC=NULLS LAST) — every ordering here is explicit
(SURVEY §7 risk register).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_dist_spark.catalog import load_table
from datafusion_dist_spark.registry import register, register_sql

# window_dense_ntile's executed-once dim-table guard (see its body).
_DIM_GUARD_OK: set[tuple[str, str]] = set()


@register(
    "sort_multi_nulls",
    oracle="""
        SELECT s_suppkey, NULLIF(s_nationkey % 5, 0) AS grp,
               CAST(ROUND(s_acctbal*100) AS BIGINT) AS bal_c
        FROM supplier
        ORDER BY NULLIF(s_nationkey % 5, 0) ASC NULLS FIRST, bal_c DESC NULLS LAST
    """,
    doc="Multi-key ORDER BY, mixed ASC/DESC with explicit NULLS "
    "FIRST/LAST (slt:170-204). Content-checked; ordering asserted in "
    "tests/ (the driver's hash is order-insensitive).",
)
def sort_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    grp = F.nullif(F.col("s_nationkey") % 5, F.lit(0))
    bal = F.round(F.col("s_acctbal") * 100).cast("bigint")
    return (
        s.select(
            "s_suppkey", grp.alias("grp"), bal.alias("bal_c")
        ).orderBy(F.col("grp").asc_nulls_first(), F.col("bal_c").desc_nulls_last())
    )


@register(
    "limit_offset",
    oracle="""
        SELECT o_orderkey, o_custkey FROM orders
        ORDER BY o_orderkey LIMIT 100 OFFSET 50
    """,
    doc="LIMIT + OFFSET over a deterministic order (slt:206-243).",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey").orderBy("o_orderkey").offset(50).limit(100)


@register(
    "limit_zero",
    oracle="SELECT o_orderkey FROM orders LIMIT 0",
    doc="LIMIT 0 → empty result, stable schema (slt:220-ish).",
)
def limit_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select("o_orderkey").limit(0)


@register(
    "topk",
    oracle="""
        SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_c
        FROM orders ORDER BY price_c DESC, o_orderkey ASC LIMIT 10
    """,
    doc="ORDER BY + LIMIT = TopK (TakeOrderedAndProject — no full sort; "
    "slt:206-218). Deterministic tie-break on o_orderkey.",
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
        )
        .orderBy(F.col("price_c").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "limit_subquery_agg",
    oracle="""
        SELECT CAST(SUM(o_orderkey) AS BIGINT) AS sum_k, count(*) AS n FROM (
            SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 500
        )
    """,
    doc="Limit-in-subquery then aggregate (slt:230-243).",
)
def limit_subquery_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    top = o.select("o_orderkey").orderBy("o_orderkey").limit(500)
    return top.agg(
        F.sum("o_orderkey").cast("bigint").alias("sum_k"), F.count("*").alias("n")
    )


@register(
    "window_rank_top1",
    oracle="""
        SELECT c_nationkey, c_custkey, bal_c, rk FROM (
            SELECT c_nationkey, c_custkey,
                   CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c,
                   rank() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY CAST(ROUND(c_acctbal*100) AS BIGINT) DESC NULLS LAST
                   ) AS rk
            FROM customer
        ) WHERE rk = 1
    """,
    doc="The reference's signature window query: rank() OVER "
    "(PARTITION BY ... ORDER BY ... DESC NULLS LAST) + top-1-per-group "
    "filter (slt:65-71, golden plan planner.rs(tests):220-249, stress "
    "shape sqllogictest.rs:34).",
)
def window_rank_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bal = F.round(F.col("c_acctbal") * 100).cast("bigint")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("bal_c").desc_nulls_last())
    return (
        c.select("c_nationkey", "c_custkey", bal.alias("bal_c"))
        .withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
    )


@register(
    "window_analytics",
    oracle="""
        SELECT event_id, user_id,
               row_number() OVER w AS rn,
               lag(event_id) OVER w AS prev_event,
               lead(event_id) OVER w AS next_event,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS running_value_c
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Analytic window functions: row_number / lag / lead / running "
    "sum with an explicit ROWS frame (SURVEY §2.C windows: 'rest cheap' "
    "— covered here beyond the reference's rank()-only corpus).",
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val_c = F.round(F.col("value") * 100).cast("bigint")
    return e.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.sum(val_c).over(wsum).cast("bigint").alias("running_value_c"),
    )


@register(
    "window_dense_ntile",
    oracle="""
        SELECT s_suppkey,
               dense_rank() OVER (ORDER BY CAST(ROUND(s_acctbal*100) AS BIGINT) DESC)
                 AS drk,
               ntile(4) OVER (ORDER BY CAST(ROUND(s_acctbal*100) AS BIGINT) DESC)
                 AS quartile
        FROM supplier
    """,
    doc="dense_rank + ntile over a global ordering (window library parity).",
)
def window_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deliberate global window (no partitionBy): window-library parity
    # over the SUPPLIER DIM TABLE, whose size is bounded by contract —
    # all rows flow through one task, which is fine for a dim table and
    # fatal for a fact table. The guard makes the contract executable
    # instead of a silent single-task stall if a future caller points
    # this at fact-scale input; the distributed form for unbounded
    # input is operators.common.global_row_number. Checked ONCE per
    # (session, sf_dir) — a straight count() (vectorized empty-column
    # scan, no shuffle; a limit+count form would funnel rows through
    # one partition), then remembered so bench/correctness repeats pay
    # no per-call job.
    _DIM_BOUND = 10_000_000
    s = load_table(spark, sf_dir, "supplier")
    guard_key = (spark.sparkContext.applicationId, sf_dir)
    if guard_key not in _DIM_GUARD_OK:
        if s.count() > _DIM_BOUND:
            raise ValueError(
                f"window_dense_ntile input exceeds the {_DIM_BOUND}-row "
                "dim-table contract; use operators.common.global_row_number "
                "for fact-scale global ranking"
            )
        _DIM_GUARD_OK.add(guard_key)
    bal = F.round(F.col("s_acctbal") * 100).cast("bigint")
    w = Window.orderBy(bal.desc())
    return s.select(
        "s_suppkey",
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
    )


register_sql(
    "window_frames_rows",
    spark_sql="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS DOUBLE)/100.0 AS rolling3_price,
               first_value(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS first_key,
               last_value(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_key,
               nth_value(o_orderkey, 2) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_key
        FROM orders WHERE o_custkey < 100
    """,
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS DOUBLE)/100.0 AS rolling3_price,
               first_value(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS first_key,
               last_value(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_key,
               nth_value(o_orderkey, 2) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_key
        FROM orders WHERE o_custkey < 100
    """,
    doc="ROWS frame specs: 3-row rolling sum, first/last/nth_value over "
    "the full-partition frame (ordered by the unique o_orderkey → "
    "deterministic).",
)


register_sql(
    "window_range_frame",
    spark_sql="""
        SELECT l_orderkey, l_linenumber, l_quantity,
               count(*) OVER (
                   PARTITION BY l_returnflag ORDER BY CAST(ROUND(l_quantity) AS BIGINT)
                   RANGE BETWEEN 5 PRECEDING AND CURRENT ROW
               ) AS n_within_5qty
        FROM lineitem WHERE l_orderkey < 400
    """,
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity,
               count(*) OVER (
                   PARTITION BY l_returnflag ORDER BY CAST(ROUND(l_quantity) AS BIGINT)
                   RANGE BETWEEN 5 PRECEDING AND CURRENT ROW
               ) AS n_within_5qty
        FROM lineitem WHERE l_orderkey < 400
    """,
    doc="RANGE (value-based) frame: count of rows within 5 quantity "
    "units preceding, per returnflag partition.",
)


register_sql(
    "window_cume_percent",
    spark_sql="""
        SELECT s_suppkey,
               round(percent_rank() OVER w, 6) AS pr,
               round(cume_dist() OVER w, 6) AS cd
        FROM supplier
        WINDOW w AS (ORDER BY s_suppkey)
    """,
    oracle="""
        SELECT s_suppkey,
               round(percent_rank() OVER w, 6) AS pr,
               round(cume_dist() OVER w, 6) AS cd
        FROM supplier
        WINDOW w AS (ORDER BY s_suppkey)
    """,
    doc="Distribution window functions: percent_rank / cume_dist over "
    "a named WINDOW clause.",
)


@register(
    "window_ignore_nulls",
    oracle="""
        SELECT event_id, user_id, v,
               last_value(v IGNORE NULLS) OVER w_run AS fill_v,
               first_value(v IGNORE NULLS) OVER w_run AS first_v,
               nth_value(v, 2 IGNORE NULLS) OVER w_full AS second_v
        FROM (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_type = 'view' THEN NULL
                        ELSE CAST(ROUND(value*100) AS BIGINT) END AS v
            FROM events
        )
        WINDOW
            w_run AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            w_full AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
    """,
    doc="IGNORE NULLS window semantics: last_value over a running "
    "frame is the canonical distributed forward-fill (carry the last "
    "observed reading over a gap), first_value/nth_value pin the "
    "full-frame variants. One shuffle on the partition key serves "
    "all three (shared WINDOW frame).",
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "view", F.lit(None)).otherwise(
        F.round(F.col("value") * 100).cast("bigint")
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select("event_id", "user_id", "ts", v.alias("v")).select(
        "event_id",
        "user_id",
        "v",
        F.last("v", ignorenulls=True).over(w_run).alias("fill_v"),
        F.first("v", ignorenulls=True).over(w_run).alias("first_v"),
        F.nth_value("v", 2, ignoreNulls=True).over(w_full).alias("second_v"),
    )
