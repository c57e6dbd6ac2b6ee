"""Event-time operators over the ``events`` table.

The reference has no stream-time semantics ("streaming" there means
pipelined delivery, SURVEY §1.4) — these are engine extensions. Each
batch query here has a Structured-Streaming twin in
``datafusion_dist_spark/streaming/`` (same logical plan run with
``readStream`` + watermark); the batch form is what the DuckDB oracle
verifies.

Scale notes: tumbling windows are a pure groupBy on a derived key (no
extra shuffle vs any agg); the as-of join uses max_by within an
equi-join group instead of a sort-merge-per-key, so it stays a single
shuffle; sessionization is one window function pass per user partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_dist_spark.catalog import load_table
from datafusion_dist_spark.registry import register


@register(
    "events_window_tumble",
    oracle="""
        SELECT CAST(time_bucket(INTERVAL 6 HOUR, ts) AS VARCHAR) AS win_start,
               event_type,
               count(*) AS n,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        FROM events
        GROUP BY time_bucket(INTERVAL 6 HOUR, ts), event_type
    """,
    doc="Tumbling event-time window aggregation (batch form of the "
    "Structured Streaming windowed agg; F.window ≡ time_bucket).",
)
def events_window_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_value_c"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "sum_value_c",
        )
    )


@register(
    "events_sessionize",
    oracle="""
        WITH gaps AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                        THEN 0 ELSE 1 END AS new_session
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts, event_id,
                   CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_id
            FROM gaps
        )
        SELECT user_id, session_id, count(*) AS n_events,
               CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
               CAST(epoch_us(max(ts)) AS BIGINT) AS session_end_us
        FROM sess GROUP BY user_id, session_id
    """,
    doc="Sessionization (30-min inactivity gap): lag + gap flag + "
    "running sum → session ids (pyspark_guide 'Common OLAP patterns'). "
    "Streaming twin: session_window(ts, '30 minutes').",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_session = F.when(gap_s <= 30 * 60, F.lit(0)).otherwise(F.lit(1))
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(cum).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
        )
    )


@register(
    "join_asof",
    oracle="""
        SELECT e.event_id, e.user_id,
               arg_max(o.o_orderkey,
                       CAST(epoch(o.o_orderdate) AS BIGINT) * 100000000
                         + o.o_orderkey) AS last_orderkey
        FROM (SELECT * FROM events WHERE event_id < 2000) e
        LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        GROUP BY e.event_id, e.user_id
    """,
    doc="As-of join: latest order at-or-before each event for the same "
    "user (SURVEY §2.C joins, stretch row; DuckDB ASOF JOIN semantics, "
    "with o_orderkey as deterministic same-date tie-break). Spark impl: "
    "equi-join on user + time filter + max_by argmax — one shuffle, no "
    "per-key sort.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    joined = e.join(
        o, (e.user_id == o.o_custkey) & (o.o_orderdate <= e.ts), "left_outer"
    )
    # Argmax per event: latest o_orderdate wins; o_orderkey breaks
    # same-date ties deterministically (single bigint sort key).
    tie_key = (
        F.unix_seconds(F.col("o_orderdate").cast("timestamp")) * F.lit(100000000)
        + F.col("o_orderkey")
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.max_by("o_orderkey", tie_key).alias("last_orderkey")
    )


@register(
    "join_range_interval",
    oracle="""
        SELECT e.event_id,
               count(o.o_orderkey) AS n_orders_7d
        FROM (SELECT * FROM events WHERE event_id < 1000) e
        LEFT JOIN orders o
          ON e.user_id = o.o_custkey
         AND o.o_orderdate >= e.ts - INTERVAL 1825 DAY
         AND o.o_orderdate <  e.ts - INTERVAL 1818 DAY
        GROUP BY e.event_id
    """,
    doc="Interval/range join: orders in a 7-day window per event "
    "(equi key + range predicate → shuffle join with residual filter; "
    "range-only joins would use bucketized band join).",
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    o = load_table(spark, sf_dir, "orders")
    lo = F.col("ts") - F.expr("INTERVAL 1825 DAYS")
    hi = F.col("ts") - F.expr("INTERVAL 1818 DAYS")
    joined = e.join(
        o,
        (e.user_id == o.o_custkey) & (o.o_orderdate >= lo) & (o.o_orderdate < hi),
        "left_outer",
    )
    return joined.groupBy("event_id").agg(F.count("o_orderkey").alias("n_orders_7d"))
