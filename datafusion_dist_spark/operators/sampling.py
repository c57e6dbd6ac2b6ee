"""Deterministic sampling for large-scale pipeline reproducibility.

``df.sample()`` draws from a per-partition RNG — results change with
partitioning and are impossible to reproduce in another engine. For a
training-data pipeline, sampling must be a *pure function of the row*:
hash the stable key, keep rows whose hash falls under the rate
threshold. Same rows selected on any cluster size, any engine, any
day — and the sample of a superset is a superset of the sample.

Hashes are md5-prefix (functions/hashing.py) so the DuckDB oracle
selects bit-identical row sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_dist_spark.functions.hashing import hash_hex, hash_hex_oracle

# 4 hex chars = 16 bits of hash → rate granularity 1/65536.
_SPACE = 1 << 16


def _bucket(key: Column, seed: int | str) -> Column:
    return F.conv(hash_hex(key.cast("string"), seed, width=4), 16, 10).cast("int")


def bucket_oracle(key_expr: str, seed: int | str) -> str:
    return (
        f"CAST(('0x' || {hash_hex_oracle(f'CAST({key_expr} AS VARCHAR)', seed, 4)})"
        f" AS INTEGER)"
    )


def hash_sample(
    df: DataFrame, key: str, rate: float, seed: int | str = "smp"
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key``."""
    return df.filter(_bucket(F.col(key), seed) < int(rate * _SPACE))


def stratified_hash_sample(
    df: DataFrame, key: str, stratum: str, rates: dict[str, float],
    default_rate: float = 0.0, seed: int | str = "smp",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample common
    sources, keep rare ones whole). ``rates`` maps stratum value →
    keep-rate; strata not listed use ``default_rate``."""
    threshold = F.lit(int(default_rate * _SPACE))
    for value, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum) == value, F.lit(int(rate * _SPACE))
        ).otherwise(threshold)
    return df.filter(_bucket(F.col(key), seed) < threshold)
