"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition a small-file input to full parallelism before a
    CPU-heavy per-row transform.

    A corpus read from one small parquet file arrives in 1-2 splits, so
    an expensive downstream pipeline (shingling, hashing, Pandas UDFs)
    would run on 1-2 cores. At 100 TB inputs arrive in thousands of
    splits and this is a no-op cost-wise; locally it is a trivial
    shuffle of the raw rows that unlocks every core. Round-robin keeps
    the partitions balanced regardless of key skew.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)
