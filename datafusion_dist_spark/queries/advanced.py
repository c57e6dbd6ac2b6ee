"""Advanced SQL surface: subqueries, CTEs, VALUES, pivot/unpivot,
JSON/array expressions, statistical aggregates.

None of these are exercised by the reference's test corpus (its SQL
surface comes wholesale from the DataFusion dependency, SURVEY §2.C
"Scalar functions" note) — they are pinned here so the engine's parity
claim covers the query shapes a DataFusion user would actually run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_dist_spark.catalog import load_table
from datafusion_dist_spark.functions.hashing import tokens_oracle

_TOKS = tokens_oracle("text")
from datafusion_dist_spark.registry import register, register_sql

# -- subqueries ------------------------------------------------------------

register_sql(
    "subquery_scalar",
    spark_sql="""
        SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_c
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM orders)
    """,
    oracle="""
        SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_c
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM orders)
    """,
    doc="Uncorrelated scalar subquery in a predicate (threshold is "
    "computed once and broadcast).",
)

register_sql(
    "subquery_in",
    spark_sql="""
        SELECT c_custkey, c_name FROM customer
        WHERE c_nationkey IN (
            SELECT n_nationkey FROM nation WHERE n_regionkey = 2
        )
    """,
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE c_nationkey IN (
            SELECT n_nationkey FROM nation WHERE n_regionkey = 2
        )
    """,
    doc="IN subquery → left semi join.",
)

register_sql(
    "subquery_not_in_3vl",
    spark_sql="""
        SELECT s_suppkey FROM supplier
        WHERE s_nationkey NOT IN (
            SELECT NULLIF(n_nationkey, 3) FROM nation WHERE n_regionkey = 1
        )
    """,
    oracle="""
        SELECT s_suppkey FROM supplier
        WHERE s_nationkey NOT IN (
            SELECT NULLIF(n_nationkey, 3) FROM nation WHERE n_regionkey = 1
        )
    """,
    doc="NOT IN against a list containing NULL — three-valued-logic "
    "semantics (null-aware anti join); the clause is NULL-poisoned "
    "only when the probe value matches nothing.",
)

register_sql(
    "subquery_correlated_exists",
    spark_sql="""
        SELECT n_nationkey, n_name FROM nation n
        WHERE EXISTS (
            SELECT 1 FROM supplier s
            WHERE s.s_nationkey = n.n_nationkey AND s.s_acctbal > 5000
        )
    """,
    oracle="""
        SELECT n_nationkey, n_name FROM nation n
        WHERE EXISTS (
            SELECT 1 FROM supplier s
            WHERE s.s_nationkey = n.n_nationkey AND s.s_acctbal > 5000
        )
    """,
    doc="Correlated EXISTS subquery (decorrelated to a semi join).",
)

register_sql(
    "cte_multi",
    spark_sql="""
        WITH big_orders AS (
            SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 300000
        ),
        per_cust AS (
            SELECT o_custkey, count(*) AS n_big FROM big_orders GROUP BY o_custkey
        )
        SELECT c.c_nationkey, CAST(SUM(p.n_big) AS BIGINT) AS total_big
        FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    """,
    oracle="""
        WITH big_orders AS (
            SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 300000
        ),
        per_cust AS (
            SELECT o_custkey, count(*) AS n_big FROM big_orders GROUP BY o_custkey
        )
        SELECT c.c_nationkey, CAST(SUM(p.n_big) AS BIGINT) AS total_big
        FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    """,
    doc="Chained CTEs feeding a join + aggregation.",
)

register_sql(
    "values_inline",
    spark_sql="""
        SELECT v.k, v.label, r.r_name
        FROM VALUES (0, 'zero'), (2, 'two'), (4, 'four') AS v(k, label)
        JOIN region r ON r.r_regionkey = v.k
    """,
    oracle="""
        SELECT v.k, v.label, r.r_name
        FROM (VALUES (0, 'zero'), (2, 'two'), (4, 'four')) AS v(k, label)
        JOIN region r ON r.r_regionkey = v.k
    """,
    doc="Inline VALUES relation joined to a table (the MemTable-style "
    "literal source, reference data.rs:36-57 analog).",
)

register_sql(
    "select_distinct",
    spark_sql="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    doc="SELECT DISTINCT — same physical shape as UNION-distinct "
    "(partial+final agg on all columns).",
)


# -- pivot / unpivot -------------------------------------------------------


@register(
    "pivot_status",
    oracle="""
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
        FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot (explicit value list → conditional aggregates).",
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("f_cnt"),
        F.coalesce("O", F.lit(0)).alias("o_cnt"),
        F.coalesce("P", F.lit(0)).alias("p_cnt"),
    )


@register(
    "unpivot_measures",
    oracle="""
        SELECT s_suppkey, 'acctbal_c' AS measure,
               CAST(ROUND(s_acctbal*100) AS BIGINT) AS val
        FROM supplier
        UNION ALL
        SELECT s_suppkey, 'nationkey' AS measure, CAST(s_nationkey AS BIGINT) AS val
        FROM supplier
    """,
    doc="Unpivot / melt: wide columns → (measure, value) rows.",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.round(F.col("s_acctbal") * 100).cast("bigint").alias("acctbal_c"),
        F.col("s_nationkey").cast("bigint").alias("nationkey"),
    )
    return s.unpivot(
        "s_suppkey", ["acctbal_c", "nationkey"], "measure", "val"
    )


# -- JSON / arrays ---------------------------------------------------------


@register(
    "json_extract_props",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
                    THEN 'high' ELSE 'low' END AS k_band
        FROM events WHERE event_id < 500
    """,
    doc="JSON extraction from a string column (events.props) + derived "
    "banding — Spark get_json_object ≡ DuckDB json_extract_string.",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.select(
        "event_id",
        k.alias("k_val"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "array_ops",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   {_TOKS} AS toks
            FROM documents WHERE doc_id < 50
        )
        SELECT doc_id,
               toks[1] AS first_tok,
               toks[len(toks)] AS last_tok,
               CAST(len(toks) AS INTEGER) AS n,
               array_to_string(list_slice(toks, 1, 3), '-') AS head3,
               CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END AS has_spark,
               list_sort(list_distinct(list_slice(toks, 1, 5)))[1] AS min_head
        FROM t
    """,
    doc="Array expression surface: index, slice, contains, distinct, "
    "sort — all JVM-side higher-order functions.",
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_dist_spark.functions.hashing import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    t = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    return t.select(
        "doc_id",
        F.element_at("toks", 1).alias("first_tok"),
        F.element_at("toks", -1).alias("last_tok"),
        F.size("toks").alias("n"),
        F.concat_ws("-", F.slice("toks", 1, 3)).alias("head3"),
        F.array_contains("toks", "spark").cast("int").alias("has_spark"),
        F.element_at(F.array_sort(F.array_distinct(F.slice("toks", 1, 5))), 1).alias(
            "min_head"
        ),
    )


@register(
    "struct_nested",
    oracle="""
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_c,
               o_orderstatus AS status
        FROM orders WHERE o_orderkey < 100
    """,
    doc="Struct construction + field access (nested types round-trip; "
    "oracle compares the flattened projection).",
)
def struct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
            F.col("o_orderstatus").alias("status"),
        ).alias("info"),
    )
    return nested.select(
        "o_orderkey",
        F.col("info.price_c").alias("price_c"),
        F.col("info.status").alias("status"),
    )


@register(
    "fn_regexp",
    oracle="""
        SELECT p_partkey,
               regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
               CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS INTEGER)
                 AS vowel_runs,
               regexp_replace(p_type, '[AEIOU]', '*', 'g') AS type_masked,
               CASE WHEN regexp_matches(p_name, '^[a-z]+ ') THEN 1 ELSE 0 END
                 AS starts_word
        FROM part WHERE p_partkey < 150
    """,
    doc="Regexp surface: extract / extract_all count / replace / match.",
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 150)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"#([0-9]+)", 1).alias("brand_num"),
        F.size(F.regexp_extract_all("p_name", F.lit(r"[aeiou]+"), F.lit(0))).alias(
            "vowel_runs"
        ),
        F.regexp_replace("p_type", r"[AEIOU]", "*").alias("type_masked"),
        F.col("p_name").rlike(r"^[a-z]+ ").cast("int").alias("starts_word"),
    )


# -- statistical aggregates ------------------------------------------------


@register(
    "agg_stats",
    oracle="""
        SELECT c_nationkey,
               round(stddev_samp(c_acctbal), 2) AS sd_bal,
               round(var_samp(c_acctbal), 1) AS var_bal,
               round(avg(c_acctbal), 4) AS avg_bal,
               round(corr(c_acctbal, CAST(c_custkey AS DOUBLE)), 6) AS corr_bal_key
        FROM customer GROUP BY c_nationkey
    """,
    doc="Statistical aggregates: stddev/variance/avg/corr (merged "
    "moment sketches; rounded to absorb sub-ulp engine differences).",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.round(F.stddev_samp("c_acctbal"), 2).alias("sd_bal"),
        F.round(F.var_samp("c_acctbal"), 1).alias("var_bal"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        F.round(F.corr("c_acctbal", F.col("c_custkey").cast("double")), 6).alias(
            "corr_bal_key"
        ),
    )


@register(
    "agg_percentiles",
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(CAST(ROUND(l_extendedprice*100) AS BIGINT), 0.25), 4)
                 AS p25_c,
               round(median(CAST(ROUND(l_extendedprice*100) AS BIGINT)), 4) AS p50_c,
               round(quantile_cont(CAST(ROUND(l_extendedprice*100) AS BIGINT), 0.75), 4)
                 AS p75_c
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact percentiles/median over integer cents (continuous "
    "interpolation — deterministic on exact ints).",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return li.select("l_returnflag", cents.alias("price_c")).groupBy(
        "l_returnflag"
    ).agg(
        F.round(F.percentile("price_c", F.lit(0.25)), 4).alias("p25_c"),
        F.round(F.median("price_c"), 4).alias("p50_c"),
        F.round(F.percentile("price_c", F.lit(0.75)), 4).alias("p75_c"),
    )


register_sql(
    "tpch_q21_waiting",
    spark_sql="""
        SELECT s.s_name, count(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F' AND l1.l_quantity > 30
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_quantity > l1.l_quantity
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 10
    """,
    oracle="""
        SELECT s.s_name, count(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F' AND l1.l_quantity > 30
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_quantity > l1.l_quantity
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 10
    """,
    doc="TPC-H Q21-shaped waiting-supplier query (adapted predicates: "
    "no commit/receipt dates): correlated EXISTS + NOT EXISTS with "
    "inequality correlation, aggregation, TopK.",
)


register_sql(
    "subquery_lateral",
    spark_sql="""
        SELECT c.c_custkey, t.o_orderkey, t.price
        FROM customer c,
        LATERAL (
            SELECT o_orderkey,
                   CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) AS DOUBLE)/100.0
                     AS price
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 2
        ) t
        WHERE c.c_custkey < 100
    """,
    oracle="""
        SELECT c.c_custkey, t.o_orderkey, t.price
        FROM customer c,
        LATERAL (
            SELECT o_orderkey,
                   CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) AS DOUBLE)/100.0
                     AS price
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 2
        ) t
        WHERE c.c_custkey < 100
    """,
    doc="Correlated LATERAL subquery with per-row ORDER BY + LIMIT "
    "(top-2 orders per customer). Catalyst decorrelates to a ranked "
    "join; deterministic via the o_orderkey tiebreak.",
)


@register(
    "agg_salted_twophase",
    oracle="""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
                 AS sum_price_c
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Skew-proof salted aggregation: partial aggregate on "
    "(key, salt) spreads a hot key over N reducers, final aggregate "
    "re-combines per key — provably equal to the plain groupBy (the "
    "oracle). The manual form of what AQE skew handling + map-side "
    "partial aggregation do; pinned as an operator because hot-key "
    "aggs at 100 TB sometimes need explicit salt. "
    "(operators/joins.py documents the join-side equivalent)",
)
def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn("_salt", (F.crc32(F.col("l_orderkey").cast("string")) % 16))
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("ps"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").cast("bigint").alias("n"),
        F.sum("ps").cast("bigint").alias("sum_price_c"),
    )


_REGR_SQL = """
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
               CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT)
                 AS sy,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
               CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                      * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT)
                 AS syy,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT)
                 AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           round((CAST(sy AS DOUBLE)
                - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
               * CAST(n * sxy - sx * sy AS DOUBLE)
               / (CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
    FROM m
"""

register_sql(
    "agg_regression_moments",
    spark_sql=_REGR_SQL,
    oracle=_REGR_SQL,
    doc="Linear-regression aggregates (regr_slope / intercept / r2 "
    "semantics) per group, computed from EXACT integer moments: one "
    "partial-aggregated pass collects n, Σx, Σy, Σx², Σy², Σxy as "
    "BIGINTs (discount as cents), then the closed forms divide once "
    "in double — deterministic under any aggregation order, unlike "
    "native float regr_* which drift per partitioning. Single "
    "shuffle of 6 integers per group.",
)


@register(
    "fn_higher_order",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   {_TOKS} AS toks
            FROM documents WHERE doc_id < 50
        )
        SELECT doc_id,
               CAST(len(list_filter(toks, x -> length(x) > 4)) AS INTEGER)
                 AS n_long,
               CAST(list_sum(list_transform(toks, x -> length(x)))
                    AS BIGINT) AS total_chars,
               CASE WHEN len(list_filter(toks, x -> length(x) = 5)) > 0
                    THEN 1 ELSE 0 END AS has_len5,
               CASE WHEN len(list_filter(toks, x -> length(x) = 0)) = 0
                    THEN 1 ELSE 0 END AS all_nonempty,
               array_to_string(
                   list_slice(
                       list_transform(range(1, len(toks) + 1),
                           i -> toks[i] || '.' || toks[len(toks) - i + 1]),
                       1, 3),
                   '-') AS zip3
        FROM t
    """,
    doc="Higher-order lambda functions over arrays: transform, filter, "
    "exists, forall, aggregate (fold), zip_with — all evaluated "
    "JVM-side inside the scan projection, no explode, no shuffle; "
    "the idiomatic replacement for row-at-a-time UDFs on array "
    "columns.",
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_dist_spark.functions.hashing import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    t = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    zipped = F.zip_with(
        "toks",
        F.reverse(F.col("toks")),
        lambda x, y: F.concat(x, F.lit("."), y),
    )
    return t.select(
        "doc_id",
        F.size(F.filter("toks", lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.exists("toks", lambda x: F.length(x) == 5)
        .cast("int")
        .alias("has_len5"),
        F.forall("toks", lambda x: F.length(x) > 0)
        .cast("int")
        .alias("all_nonempty"),
        F.concat_ws("-", F.slice(zipped, 1, 3)).alias("zip3"),
    )


_MOMENTS_SQL = """
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
        FROM lineitem GROUP BY l_returnflag
    ),
    d AS (
        SELECT l_returnflag, n,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
               CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS q2,
               CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS q3,
               CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS q4
        FROM m
    )
    SELECT l_returnflag, n,
           round(mean, 6) AS mean,
           round(q2 - mean * mean, 6) AS var_pop,
           round((q3 - 3 * mean * q2 + 2 * mean * mean * mean)
               / ((q2 - mean * mean) * sqrt(q2 - mean * mean)), 6)
             AS skew_pop,
           round((q4 - 4 * mean * q3 + 6 * mean * mean * q2
                - 3 * mean * mean * mean * mean)
               / ((q2 - mean * mean) * (q2 - mean * mean)) - 3, 6)
             AS kurt_excess
    FROM d
"""

register_sql(
    "agg_higher_moments",
    spark_sql=_MOMENTS_SQL,
    oracle=_MOMENTS_SQL,
    doc="Population variance, skewness and excess kurtosis per group "
    "from EXACT integer power sums (n, Σx..Σx⁴ as BIGINTs) — one "
    "partial-aggregated pass, then closed-form doubles; m2^1.5 is "
    "written m2·sqrt(m2) because sqrt is correctly rounded in every "
    "engine while pow() is not. Deterministic under any partitioning, "
    "unlike native float skewness/kurtosis.",
)


_RECURSIVE_SQL = """
    WITH RECURSIVE chain(custkey, root, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
        UNION ALL
        SELECT c.c_custkey, ch.root, ch.depth + 1
        FROM customer c
        JOIN chain ch
          ON CAST(floor(c.c_custkey / 10.0) AS BIGINT) = ch.custkey
         AND c.c_custkey >= 10
    )
    SELECT root, count(*) AS n_reachable, max(depth) AS max_depth
    FROM chain GROUP BY root
"""

register_sql(
    "cte_recursive",
    spark_sql=_RECURSIVE_SQL,
    oracle=_RECURSIVE_SQL,
    doc="Recursive CTE (Spark 4 WITH RECURSIVE): transitive closure of "
    "the custkey -> floor(custkey/10) hierarchy from single-digit "
    "roots — per-root reachable-node counts and chain depth. Each "
    "recursion step is one join against the previous frontier; the "
    "engine unions frontiers until fixpoint (the SQL-native form of "
    "the connected-components / org-chart traversals that otherwise "
    "need driver-side loops).",
)


# -- graph analytics -------------------------------------------------------

def _pagerank_oracle() -> str:
    from datafusion_dist_spark.operators.graph import pagerank_iter_oracle

    iters = ",".join(
        pagerank_iter_oracle(f"s{i}", f"s{i + 1}") for i in range(3)
    )
    return f"""
        WITH pairs AS (
            SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        ),
        edges AS (
            SELECT 'c:' || CAST(ck AS VARCHAR) AS src,
                   's:' || CAST(sk AS VARCHAR) AS dst FROM pairs
            UNION ALL
            SELECT 's:' || CAST(sk AS VARCHAR) AS src,
                   'c:' || CAST(ck AS VARCHAR) AS dst FROM pairs
        ),
        deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        s0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS score
               FROM deg),
        {iters}
        SELECT node, CAST(score AS BIGINT) AS score FROM s3
    """


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    doc="Fixed-point-integer PageRank (3 iterations, damping 85/100) "
    "over the customer-supplier interaction graph distilled from "
    "orders x lineitem. Each iteration is one score-edge join plus "
    "one destination aggregation chained LAZILY into a single plan — "
    "no driver-side state between rounds, the repeated edge subtree "
    "is a ReuseExchange target, and integer div/sum arithmetic makes "
    "every engine's scores bit-identical regardless of partitioning. "
    "(operators/graph.py:pagerank)",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_dist_spark.operators.graph import bipartite_edges, pagerank

    edges = bipartite_edges(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
    return pagerank(edges, iterations=3)


register_sql(
    "fn_variant",
    spark_sql="""
        SELECT event_id,
               variant_get(parse_json(props), '$.k', 'long') AS k_long,
               CAST(parse_json(props) AS STRING) AS vjson,
               schema_of_variant(parse_json(props)) AS vschema
        FROM events WHERE event_id < 500
    """,
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
               CAST(json(props) AS VARCHAR) AS vjson,
               'OBJECT<k: BIGINT>' AS vschema
        FROM events WHERE event_id < 500
    """,
    doc="VARIANT semi-structured type (Spark 4): parse_json into the "
    "binary variant encoding, typed path extraction via variant_get, "
    "string round-trip, and schema_of_variant introspection — the "
    "open-format successor to string-JSON columns; oracle mirrors "
    "with DuckDB JSON extraction and normalization.",
)


@register(
    "graph_triangle_count",
    oracle="""
        WITH cp AS (
            SELECT DISTINCT l.l_partkey AS pk, o.o_custkey AS ck
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_quantity >= 45
        ),
        small AS (SELECT pk FROM cp GROUP BY pk HAVING count(*) <= 20),
        edges AS (
            SELECT DISTINCT a.ck AS u, b.ck AS v
            FROM cp a
            JOIN small s ON s.pk = a.pk
            JOIN cp b ON a.pk = b.pk AND a.ck < b.ck
        ),
        tris AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM edges e1
            JOIN edges e2 ON e1.v = e2.u
            JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        corners AS (
            SELECT a AS node FROM tris
            UNION ALL SELECT b FROM tris
            UNION ALL SELECT c FROM tris
        )
        SELECT node, count(*) AS n_triangles FROM corners GROUP BY node
    """,
    doc="Per-customer triangle counts over the co-purchase graph "
    "(customers linked by a shared high-quantity part; hot parts "
    "capped before pair enumeration — the posting-list skew "
    "discipline). The Spark plan uses degree-ordered orientation so "
    "the wedge self-join is bounded by O(sqrt(|E|)) per node on any "
    "graph — hub-safe at 100 TB — while the oracle enumerates the "
    "same triangle set with the plain a<b<c SQL form (orientation "
    "changes join sizes, never results). "
    "(operators/graph.py:triangle_count)",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_dist_spark.operators.graph import (
        copurchase_edges,
        triangle_count,
    )

    edges = copurchase_edges(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        min_quantity=45,
        max_group=20,
    )
    return triangle_count(edges)


@register(
    "subquery_any_all",
    oracle="""
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice*100) AS BIGINT) > ALL (
                   SELECT CAST(ROUND(o_totalprice*100) AS BIGINT)
                   FROM orders WHERE o_custkey % 100 = 3
               ) AS gt_all,
               CAST(ROUND(o_totalprice*100) AS BIGINT) > ANY (
                   SELECT CAST(ROUND(o_totalprice*100) AS BIGINT)
                   FROM orders WHERE o_custkey % 100 = 7
               ) AS gt_any
        FROM orders WHERE o_orderkey < 3000
    """,
    doc="Quantified subquery comparisons (x > ALL / > ANY), which "
    "Spark SQL does not parse: the engine rewrites them to scalar "
    "aggregates — x > ALL(s) ≡ s empty OR x > max(s); x > ANY(s) ≡ "
    "s non-empty AND x > min(s) (exact for non-null s; the demo "
    "column is NOT NULL — a nullable s adds the NOT-IN-style 3VL "
    "CASE, see subquery_not_in_3vl). The two 1-row aggregate scalars "
    "broadcast onto a single scan: no join, no shuffle, regardless "
    "of either subquery's size. DuckDB runs the REAL quantified "
    "predicates, proving the rewrite.",
)
def subquery_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    price_c = F.round(F.col("o_totalprice") * 100).cast("bigint")
    s1 = o.filter(F.col("o_custkey") % 100 == 3).agg(
        F.max(price_c).alias("mx1"), F.count("*").alias("cnt1")
    )
    s2 = o.filter(F.col("o_custkey") % 100 == 7).agg(
        F.min(price_c).alias("mn2"), F.count("*").alias("cnt2")
    )
    return (
        o.filter(F.col("o_orderkey") < 3000)
        .crossJoin(F.broadcast(s1))
        .crossJoin(F.broadcast(s2))
        .select(
            "o_orderkey",
            ((F.col("cnt1") == 0) | (price_c > F.col("mx1"))).alias("gt_all"),
            ((F.col("cnt2") > 0) & (price_c > F.col("mn2"))).alias("gt_any"),
        )
    )
