"""Embedding similarity search over an ``array<float>`` column.

Two strategies, one semantics:

- ``cosine_topk_bruteforce`` — exact: score every vector against the
  query with a JVM-side fold (zip_with + aggregate, no Python, no UDF),
  then TopK. The right baseline and, at 100 TB, still the right
  *verifier* for sampled queries: one scan, no shuffle (TopK is
  partial-per-partition then merged).
- ``lsh_bucket_topk`` — approximate scale path: sign-bit bucketing
  (axis-aligned random-hyperplane LSH) assigns every vector to a
  2^nbits bucket at write time; queries probe only the buckets within
  Hamming distance 1 of the query's bucket, turning top-k into a
  selective scan. On a cluster the bucket id is a partition/cluster
  key, so a probe reads a handful of files.

All scores are computed in double and rounded to 6dp (see registry.py
exactness rules).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_dist_spark.operators.common import spread


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays, computed in double."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = spread(embeddings).select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def sign_bucket(vec: Column, nbits: int = 4) -> Column:
    """LSH bucket id: bit i = sign(vec[i]), packed to an int.

    Axis-aligned hyperplanes keep the oracle expressible in SQL; swap
    the element lookup for a dot product against random hyperplanes for
    production-grade recall (same plan shape).
    """
    bucket = F.lit(0)
    for i in range(nbits):
        bucket = bucket + F.when(
            F.element_at(vec, i + 1) >= 0, F.lit(2**i)
        ).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nbits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the query's sign bucket plus all buckets
    at Hamming distance 1 (multi-probe), exact cosine within probes."""
    q_bucket = 0
    for i in range(nbits):
        if float(query_vec[i]) >= 0:
            q_bucket += 2**i
    probes = [q_bucket] + [q_bucket ^ (1 << i) for i in range(nbits)]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = (
        spread(embeddings).withColumn("bucket", sign_bucket(F.col(vec_col), nbits))
        .filter(F.col("bucket").isin(probes))
        .select(
            F.col(id_col),
            F.col("bucket"),
            F.round(cosine(F.col(vec_col), q), 6).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    nbits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by sign bucket.

    Only pairs sharing a bucket are scored (near-identical vectors
    agree on sign bits with high probability); exact cosine verifies.
    At scale the bucket equi-join replaces the quadratic cross join.
    """
    b = spread(embeddings).select(
        F.col(id_col), F.col(vec_col), sign_bucket(F.col(vec_col), nbits).alias("bucket")
    )
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    )
    score = F.round(cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")), 6)
    return (
        pairs.select(
            F.col(f"l.{id_col}").alias("a_id"),
            F.col(f"r.{id_col}").alias("b_id"),
            score.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
