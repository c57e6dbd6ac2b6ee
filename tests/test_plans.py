"""Plan-quality gates (SURVEY §5 layer 2, behavioral not textual).

The reference pins golden plan strings; Spark plan text is version-
volatile, so these assert the *facts* that matter at 100 TB: dimension
joins broadcast, fact-fact joins shuffle once, filters reach the
parquet scan, ORDER BY+LIMIT compiles to TopK, aggregates are
two-phase (partial before the exchange).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_dist_spark.catalog import load_table
from datafusion_dist_spark.plans import formatted_plan, plan_facts
from datafusion_dist_spark.queries.tpch import tpch_q3, tpch_q5, tpch_q6
from datafusion_dist_spark.queries.sorts_windows import topk
from tests.conftest import SF_DIR


def test_q5_star_join_broadcasts_dims(spark):
    facts = plan_facts(tpch_q5(spark, SF_DIR))
    # All four dims broadcast; only lineitem⋈orders may shuffle.
    assert facts["n_broadcast_joins"] >= 4, facts
    assert facts["n_sortmerge_joins"] + facts["n_shuffledhash_joins"] <= 1, facts


def test_q3_topk_and_broadcast(spark):
    facts = plan_facts(tpch_q3(spark, SF_DIR))
    assert facts["has_topk"], "ORDER BY+LIMIT must compile to TakeOrderedAndProject"
    assert facts["n_broadcast_joins"] >= 1, facts


def test_q6_filters_pushed_to_scan(spark):
    plan = formatted_plan(tpch_q6(spark, SF_DIR))
    assert "PushedFilters" in plan
    # The shipdate range must reach the parquet reader.
    assert "l_shipdate" in plan.split("PushedFilters", 1)[1][:400], plan[:2000]


def test_scan_prunes_columns(spark):
    df = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    plan = formatted_plan(df)
    read_schema = plan.split("ReadSchema", 1)[1][:200]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_topk_no_global_sort(spark):
    facts = plan_facts(topk(spark, SF_DIR))
    assert facts["has_topk"], "top-k query must avoid a full global sort"


def test_groupby_is_two_phase(spark):
    df = (
        load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    plan = formatted_plan(df)
    # Partial aggregate appears before the exchange, final after.
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange" in plan


def test_broadcast_join_no_shuffle_of_fact(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    supp = load_table(spark, SF_DIR, "supplier")
    df = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey).select(
        "l_orderkey", "s_name"
    )
    facts = plan_facts(df)
    assert facts["n_broadcast_joins"] == 1
    assert facts["n_exchanges"] == 0, "broadcast join must not shuffle the fact side"
