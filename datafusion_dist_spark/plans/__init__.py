"""Physical-plan inspection utilities.

The reference pins golden plan *strings* (``integration-tests/tests/
planner.rs``); Spark plan text is version-volatile, so per SURVEY §5 we
pin *behavioral* facts instead: which exchanges exist, which joins went
broadcast, whether filters reached the scan. These helpers extract
those facts from ``explain`` output for tests and for the bench's
plan-quality report.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_facts(df: DataFrame) -> dict:
    """Extract scale-relevant facts from the physical plan.

    After AQE has (partially) executed a plan, ``explain formatted``
    prints both the final and the initial plan — only the final one
    counts, so everything after the "Initial Plan" marker is dropped.
    """
    plan = formatted_plan(df).split("Initial Plan")[0]
    # `formatted` prints each node twice: once in the plan tree, once
    # in the numbered detail list. Count operators in the tree only.
    tree = re.split(r"\n\(\d+\) ", plan)[0]
    return {
        "n_exchanges": len(re.findall(r"\bExchange\b", tree)),
        "n_broadcast_joins": len(re.findall(r"BroadcastHashJoin", tree)),
        "n_sortmerge_joins": len(re.findall(r"SortMergeJoin", tree)),
        "n_shuffledhash_joins": len(re.findall(r"ShuffledHashJoin", tree)),
        "n_bnl_joins": len(re.findall(r"BroadcastNestedLoopJoin", tree)),
        "has_topk": "TakeOrderedAndProject" in tree,
        "n_wholestage_codegen": len(re.findall(r"WholeStageCodegen", tree)),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "partial_aggregate": "HashAggregate" in tree or "SortAggregate" in tree,
    }


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    facts = plan_facts(df)
    joined = "; ".join(facts["pushed_filters"])
    assert fragment in joined, f"filter '{fragment}' not pushed; got: {joined}"
