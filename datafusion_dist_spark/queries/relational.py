"""Scans, projections, filters, and every join kind (SURVEY §2.C).

Reference evidence cited per query (``integration-tests/tests/
sqllogictest.slt`` = ``slt``). The reference's outer joins are a
declared gap with wrong results through its dist path (``slt:160-164``);
Spark's are correct and covered here — we intentionally exceed the
reference on that row of the inventory.

Scale notes: equi-joins here are expressed declaratively so Catalyst
picks broadcast vs sort-merge by size (AQE re-plans at runtime); the
dimension sides (region/nation/supplier) are explicitly broadcast where
the cardinality asymmetry is structural, matching what a 100 TB run
needs (no shuffle of the fact table against a 25-row dim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_dist_spark.catalog import load_table
from datafusion_dist_spark.operators import joins
from datafusion_dist_spark.registry import register

# -- scans / projections / filters ----------------------------------------


@register(
    "scan_full",
    oracle="SELECT r_regionkey, r_name FROM region",
    doc="Full table scan + column projection (slt:1-6; DataSourceExec).",
)
def scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register(
    "projection_expr",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c,
               CAST(ROUND(l_extendedprice*100)*(100 - ROUND(l_discount*100)) AS BIGINT)
                 AS discounted_c4,
               upper(l_returnflag) AS flag_u
        FROM lineitem WHERE l_orderkey < 100
    """,
    doc="Expression projection with aliasing (ProjectionExec, slt:290-300).",
)
def projection_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_c = F.round(F.col("l_discount") * 100).cast("bigint")
    return li.filter(F.col("l_orderkey") < 100).select(
        "l_orderkey",
        "l_linenumber",
        price_c.alias("price_c"),
        (price_c * (F.lit(100) - disc_c)).alias("discounted_c4"),
        F.upper("l_returnflag").alias("flag_u"),
    )


@register(
    "constant_projection",
    oracle="SELECT 1 AS one, n_nationkey FROM nation",
    doc="Constant projection over a source (SELECT 1 FROM t, slt:249-264).",
)
def constant_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "nation").select(
        F.lit(1).alias("one"), "n_nationkey"
    )


@register(
    "select_one",
    oracle="SELECT 1 AS one",
    doc="Sourceless SELECT 1 — the reference's health-check fast path "
    "(dist/src/util.rs:31-51); Spark: OneRowRelation, never leaves driver.",
)
def select_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql("SELECT 1 AS one")


@register(
    "filter_basic",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus
        FROM orders
        WHERE o_totalprice > 300000 AND o_orderstatus = 'O'
    """,
    doc="FilterExec with conjunctive predicate, pushed to parquet scan "
    "(slt:86-88; PushedFilters visible in .explain).",
)
def filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter((F.col("o_totalprice") > 300000) & (F.col("o_orderstatus") == "O")).select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )


@register(
    "filter_empty",
    oracle="SELECT c_custkey, c_name FROM customer WHERE c_custkey = -999",
    doc="Filter matching nothing → empty result, stable schema (slt:266-269).",
)
def filter_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") == -999).select("c_custkey", "c_name")


# -- joins -----------------------------------------------------------------


@register(
    "join_cross",
    oracle="""
        SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
    doc="Cross join (CrossJoinExec, slt:8-15).",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "join_inner_broadcast",
    oracle="""
        SELECT n.n_name, r.r_name
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    doc="Inner equi join, small side broadcast — the Spark analog of "
    "HashJoinExec mode=CollectLeft (slt:44-49; scheduler colocation at "
    "dist/src/scheduler.rs:187-191 replaced by broadcast).",
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("n_name", "r_name")
    )


@register(
    "join_inner_shuffle",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
               CAST(ROUND(l.l_extendedprice*100) AS BIGINT) AS price_c
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
    """,
    doc="Inner equi join, both sides large → shuffle (HashJoinExec "
    "mode=Partitioned, slt:23-35, README.md:23-56). At 100 TB this is a "
    "sort-merge join on co-partitioned shuffle output; AQE handles skew.",
)
def join_inner_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        "o_custkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
    )


@register(
    "join_theta",
    oracle="""
        SELECT s.s_suppkey, count(*) AS n_poorer
        FROM supplier s JOIN customer c ON s.s_acctbal > c.c_acctbal
        GROUP BY s.s_suppkey
    """,
    doc="Theta (non-equi) join → BroadcastNestedLoopJoin "
    "(NestedLoopJoinExec, slt:17-21).",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        s.join(c, s.s_acctbal > c.c_acctbal)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_poorer"))
    )


@register(
    "join_self_alias",
    oracle="""
        SELECT n1.n_name AS name_a, n2.n_name AS name_b
        FROM nation n1 JOIN nation n2
          ON n1.n_regionkey = n2.n_regionkey AND n1.n_name < n2.n_name
    """,
    doc="Self-join with aliases (slt:10,19,32).",
)
def join_self_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    n1, n2 = n.alias("n1"), n.alias("n2")
    return n1.join(
        n2,
        (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
        & (F.col("n1.n_name") < F.col("n2.n_name")),
    ).select(F.col("n1.n_name").alias("name_a"), F.col("n2.n_name").alias("name_b"))


_BIG_ORDER = 400000  # o_totalprice threshold that leaves some customers unmatched


@register(
    "join_left_outer",
    oracle=f"""
        SELECT c.c_custkey, o.o_orderkey
        FROM customer c LEFT JOIN (
            SELECT * FROM orders WHERE o_totalprice > {_BIG_ORDER}
        ) o ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey < 200
    """,
    doc="LEFT OUTER join — a declared gap in the reference "
    "(slt:160-164: left-preserved rows lost through the dist path); "
    "covered correctly here.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > _BIG_ORDER)
    return c.join(o, c.c_custkey == o.o_custkey, "left_outer").select(
        "c_custkey", "o_orderkey"
    )


@register(
    "join_right_outer",
    oracle=f"""
        SELECT o.o_orderkey, c.c_custkey
        FROM (
            SELECT * FROM orders WHERE o_totalprice > {_BIG_ORDER}
        ) o RIGHT JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey < 200
    """,
    doc="RIGHT OUTER join (reference gap, slt:160-164).",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > _BIG_ORDER)
    return o.join(c, c.c_custkey == o.o_custkey, "right_outer").select(
        "o_orderkey", "c_custkey"
    )


@register(
    "join_full_outer",
    oracle="""
        SELECT a.o_orderkey AS left_key, b.l_orderkey AS right_key
        FROM (SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 3 = 0) a
        FULL JOIN (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_orderkey % 3 = 1) b
          ON a.o_orderkey = b.l_orderkey
    """,
    doc="FULL OUTER join with unmatched rows on both sides "
    "(reference gap, slt:160-164).",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey")
        .distinct()
    )
    b = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 3 == 1)
        .select("l_orderkey")
        .distinct()
    )
    return a.join(b, a.o_orderkey == b.l_orderkey, "full_outer").select(
        F.col("o_orderkey").alias("left_key"), F.col("l_orderkey").alias("right_key")
    )


@register(
    "join_semi",
    oracle=f"""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {_BIG_ORDER}
        )
    """,
    doc="LEFT SEMI join (EXISTS) — stretch parity beyond the reference "
    "corpus (SURVEY §2.C joins table, last row).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > _BIG_ORDER)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle=f"""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {_BIG_ORDER}
        )
    """,
    doc="LEFT ANTI join (NOT EXISTS) — stretch parity (SURVEY §2.C).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > _BIG_ORDER)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "merge_upsert",
    oracle="""
        WITH tgt AS (
            SELECT c_custkey, c_name,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
            FROM customer
        ),
        upd AS (
            SELECT c_custkey AS u_key, c_name AS u_name,
                   CAST(bal_c + 5000 AS BIGINT) AS u_bal
            FROM tgt WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT c_custkey + 1000000, 'NEW:' || c_name, CAST(100 AS BIGINT)
            FROM tgt WHERE c_custkey % 97 = 0
        )
        SELECT coalesce(u.u_key, t.c_custkey) AS c_custkey,
               coalesce(u.u_name, t.c_name) AS c_name,
               CAST(coalesce(u.u_bal, t.bal_c) AS BIGINT) AS bal_c,
               CASE WHEN u.u_key IS NOT NULL AND t.c_custkey IS NOT NULL
                      THEN 'update'
                    WHEN t.c_custkey IS NULL THEN 'insert'
                    ELSE 'keep' END AS action
        FROM tgt t FULL OUTER JOIN upd u ON t.c_custkey = u.u_key
    """,
    doc="MERGE INTO semantics (WHEN MATCHED UPDATE / WHEN NOT MATCHED "
    "INSERT) as a full-outer join + coalesce — the copy-on-write "
    "upsert shape of a lakehouse table. Both sides shuffle on the "
    "merge key once (sort-merge); at scale the update set is usually "
    "small enough that file-level pruning (or a broadcast existence "
    "pass) cuts the rewrite to touched partitions. Balances are exact "
    "cents (BIGINT).",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    tgt = c.select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_c"),
    )
    upd = (
        tgt.filter(F.col("c_custkey") % 10 == 0)
        .select(
            F.col("c_custkey").alias("u_key"),
            F.col("c_name").alias("u_name"),
            (F.col("bal_c") + 5000).alias("u_bal"),
        )
        .unionByName(
            tgt.filter(F.col("c_custkey") % 97 == 0).select(
                (F.col("c_custkey") + 1000000).alias("u_key"),
                F.concat(F.lit("NEW:"), F.col("c_name")).alias("u_name"),
                F.lit(100).cast("bigint").alias("u_bal"),
            )
        )
    )
    t, u = tgt.alias("t"), upd.alias("u")
    m = t.join(u, F.col("t.c_custkey") == F.col("u.u_key"), "full_outer")
    action = (
        F.when(
            F.col("u.u_key").isNotNull() & F.col("t.c_custkey").isNotNull(),
            "update",
        )
        .when(F.col("t.c_custkey").isNull(), "insert")
        .otherwise("keep")
    )
    return m.select(
        F.coalesce(F.col("u.u_key"), F.col("t.c_custkey")).alias("c_custkey"),
        F.coalesce(F.col("u.u_name"), F.col("t.c_name")).alias("c_name"),
        F.coalesce(F.col("u.u_bal"), F.col("t.bal_c")).alias("bal_c"),
        action.alias("action"),
    )


@register(
    "join_skew_salted",
    oracle="""
        SELECT c.c_nationkey, count(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o.o_totalprice*100) AS BIGINT))
                    AS DOUBLE)/100.0 AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    """,
    doc="Explicitly SALTED shuffle join: the fact side's join key gets "
    "a salt in [0,8), the customer side is replicated 8x with every "
    "salt, and the join runs on (key, salt) — the manual lever for a "
    "hot key that is heavy on BOTH sides, where AQE's skew split (which "
    "only subdivides the probe side's partitions) cannot help. The key "
    "is orders.o_custkey deliberately: that is the key the zipf scale "
    "rehearsal remaps onto a 64-key hot set (scale.py, #1 key ~4.2% of "
    "all fact rows), so BENCH_SCALE_SKEW measures this entry against a "
    "genuine heavy hitter, not a uniform key. Salting is pure routing: "
    "the oracle is the PLAIN join, and the hash-match proves "
    "result-identity. At 100 TB the cost model is (moderate side x 8) "
    "shuffle volume bought for straggler-free reducers. "
    "(operators/joins.py:salted_join; AQE's automatic counterpart is "
    "probed separately in the skew rehearsal.)",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    # hint forces the shuffle path: at bench SFs Catalyst would broadcast
    # the replicated customer side, which is exactly the regime where
    # salting is pointless — the entry demonstrates the big-dim shape.
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    ).hint("shuffle_hash")
    j = joins.salted_join(o, cust, "o_custkey", "c_custkey", salt=8)
    return j.groupBy("c_nationkey").agg(
        F.count("*").alias("n_orders"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("double") / 100.0
        ).alias("revenue"),
    )


@register(
    "join_runtime_bloom",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_items,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))
                    AS DOUBLE)/100.0 AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
        GROUP BY o_orderpriority
    """,
    doc="Shuffle join with Catalyst's RUNTIME Bloom-filter pruning "
    "(InjectRuntimeFilter): the selective dimension filter "
    "(o_orderpriority/o_totalprice) is compiled into a bloom_filter_agg "
    "over the creation side's join keys, and a might_contain prefilter "
    "is planted above the FACT scan — so at 100 TB the lineitem side "
    "drops non-matching rows BEFORE paying the shuffle, the engine-"
    "native generalization of the manual broadcast-Bloom prefilter in "
    "decontaminate_bloom_verify. The filter is lossy-safe (false "
    "positives pass through to the exact join; results identical to "
    "the plain join, which is the oracle). Demonstrated where it "
    "matters: a too-big-to-broadcast dimension (the local session "
    "scopes autoBroadcastJoinThreshold=-1 and the scan-size floor to "
    "model that regime via spark.newSession(), leaving the shared "
    "session untouched); the executed-plan gate asserts might_contain "
    "actually injected. (planner.rs:132-133 covers the partitioned "
    "hash join itself; runtime filtering is beyond-reference.)",
)
def join_runtime_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Confs are scoped to a child session (shared SparkContext, own
    # SQLConf) because Catalyst reads them at EXECUTION time — a
    # set/restore around the build would be a no-op for the caller
    # who collects later, and setting them on the shared session
    # would perturb every other query's join planning.
    ns = spark.newSession()
    ns.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    ns.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )
    ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    orders = load_table(ns, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000)
    )
    li = load_table(ns, sf_dir, "lineitem")
    j = li.join(
        orders.hint("shuffle_hash"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        (
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("double")
            / 100.0
        ).alias("sum_price"),
    )
