"""Join strategies beyond the built-ins: skew salting, as-of.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most skew automatically; explicit salting is the
tool for the pathological case AQE can't fix — a hot key on BOTH the
probe and a large build side, or aggregations on a hot key. Pinned here
as a first-class operator with a correctness test proving it equals the
plain join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting: the (skewed) left side gets a random
    salt in [0, salt); the right side is replicated ``salt`` times with
    every salt value. The hot key's rows spread over ``salt`` reducers
    instead of one straggler task.

    Cost model: right side shuffle volume × salt — use for a moderate
    right side against a skewed-heavy left. Result is identical to the
    plain join (verified in tests/test_operators.py).
    """
    salted_left = left.withColumn(
        "_salt", (F.rand(seed=42) * salt).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    salted_right = right.select("*", salts)
    joined = salted_left.join(
        salted_right,
        (salted_left[left_key] == salted_right[right_key])
        & (salted_left["_salt"] == salted_right["_salt"]),
        how,
    )
    return joined.drop("_salt")


def skew_stats(df: DataFrame, key: str, top: int = 5) -> DataFrame:
    """Per-key frequency for skew diagnosis: the planning input for
    choosing between AQE skew-split, salting, and broadcast."""
    n = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("cnt"))
        .withColumn("fraction", F.round(F.col("cnt") / F.lit(float(n)), 6))
        .orderBy(F.col("cnt").desc(), F.col(key).asc())
        .limit(top)
    )
