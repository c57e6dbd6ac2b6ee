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
    plain join for inner / left joins (verified in
    tests/test_operators.py). Right/full outer are rejected: the right
    side is replicated per salt value, so an unmatched right row would
    surface ``salt`` null-padded times instead of once — salting that
    direction requires salting the other side instead.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"):
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched "
            "replicated-side rows; salt the other side instead"
        )
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
    choosing between AQE skew-split, salting, and broadcast.

    One scan: the total row count is derived from the per-key counts
    (a one-row aggregate cross-joined back) instead of a second
    ``df.count()`` pass over the full table."""
    counts = df.groupBy(key).agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("fraction", F.round(F.col("cnt") / F.col("_n").cast("double"), 6))
        .drop("_n")
        .orderBy(F.col("cnt").desc(), F.col(key).asc())
        .limit(top)
    )
