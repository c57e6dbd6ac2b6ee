"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
