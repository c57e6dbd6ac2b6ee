"""Shared operator helpers."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_EXCHANGE_RE = re.compile(r"Exchange\b")


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition a small-file input to full parallelism before a
    CPU-heavy per-row transform.

    A corpus read from one small parquet file arrives in 1-2 splits, so
    an expensive downstream pipeline (shingling, hashing, Pandas UDFs)
    would run on 1-2 cores. Round-robin keeps the partitions balanced
    regardless of key skew.

    At 100 TB the input already arrives in thousands of splits, so the
    repartition is skipped entirely: shuffling the raw text/vector
    payload before shingling/hashing would be the single biggest
    avoidable cost at scale. Only an under-parallel input (fewer
    partitions than the target) pays the shuffle.

    Laziness discipline: the partition-count decision must not execute
    anything at plan-build time. Under AQE, ``df.rdd`` forces
    ``getFinalPhysicalPlan()``, which EXECUTES every shuffle stage in
    the input plan and throws the work away — so that probe is only
    taken for shuffle-free plans (where it is pure planning, no jobs).
    A plan that already contains a shuffle exchange emerges with
    ``spark.sql.shuffle.partitions`` (or AQE-coalesced) partitions —
    already parallel — and passes through unprobed.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    # Physical-plan *text* is lazy to produce (explain never runs
    # jobs). ANY exchange (shuffle or broadcast) makes the .rdd probe
    # eager under AQE, and a shuffle output is already parallel — so
    # exchange-bearing plans pass through unprobed.
    plan = df._jdf.queryExecution().executedPlan().toString()
    if _EXCHANGE_RE.search(plan):
        return df
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
