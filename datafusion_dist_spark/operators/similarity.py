"""Embedding similarity search over an ``array<float>`` column.

Two strategies, one semantics:

- ``cosine_topk_bruteforce`` — exact: score every vector against the
  query with a JVM-side dot product, then TopK. The right baseline and,
  at 100 TB, still the right *verifier* for sampled queries: one scan,
  no shuffle (TopK is partial-per-partition then merged).
- ``lsh_bucket_topk`` — approximate scale path: sign-bit bucketing
  (axis-aligned random-hyperplane LSH) assigns every vector to a
  2^nbits bucket at write time; queries probe only the buckets within
  Hamming distance 1 of the query's bucket, turning top-k into a
  selective scan. On a cluster the bucket id is a partition/cluster
  key, so a probe reads a handful of files.

Dot products: when the dimension is known (probed once from the data)
the sum is unrolled into a fixed chain of ``element_at`` products —
plain codegen-able expressions that stay inside WholeStageCodegen. The
higher-order ``aggregate``/``zip_with`` fold (interpreted per element,
~5-10x slower) remains the fallback for unknown dims. Both produce the
identical left-to-right double summation, so results are bit-equal.

All scores are computed in double and rounded to 6dp (see registry.py
exactness rules). Near-dup pair scoring pre-computes each row's norm
once (N norms instead of one per pair).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_dist_spark.operators.common import spread


def _dot_fold(a: Column, b: Column) -> Column:
    """Interpreted fallback when the dimension is unknown."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product; identical summation order in both implementations."""
    if dim is None:
        return _dot_fold(a, b)
    s = F.element_at(a, 1).cast("double") * F.element_at(b, 1).cast("double")
    for i in range(2, dim + 1):
        s = s + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
    return s


def _probe_dim(df: DataFrame, vec_col: str) -> int | None:
    """One-row action to learn the (assumed uniform) vector length."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).head()
    return int(row.d) if row and row.d is not None and row.d > 0 else None


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity of two float arrays, computed in double."""
    return _dot(a, b, dim) / (F.sqrt(_dot(a, a, dim)) * F.sqrt(_dot(b, b, dim)))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector. The
    query-side norm is a foldable expression Catalyst evaluates once."""
    dim = len(query_vec)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = spread(embeddings).select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q, dim), 6).alias("score"),
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
    dim = len(query_vec)
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
            F.round(cosine(F.col(vec_col), q, dim), 6).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def ivf_assignments(
    embeddings: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: assign every vector to its nearest
    centroid (max cosine, deterministic centroid-id tiebreak).

    Centroids here are the first ``n_centroids`` vectors by id — a
    deterministic stand-in for a k-means codebook (training a codebook
    is an offline iterative job; the *serving* plan shape, which is
    what scales, is identical). The assignment is a broadcast cross
    join (N × K rows) + per-vector top-1 — one scan, no shuffle of the
    vector column beyond the window partition.
    """
    from pyspark.sql import Window

    if dim is None:
        dim = _probe_dim(embeddings, vec_col)
    cents = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )
    scored = spread(embeddings).join(F.broadcast(cents)).select(
        id_col,
        vec_col,
        "cid",
        F.round(cosine(F.col(vec_col), F.col("cvec"), dim), 6).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cid"))
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "cid", "csim")
    )
    return assigned, cents


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k: score the query against the codebook, probe the
    ``nprobe`` nearest inverted lists, exact cosine within them.

    At 100 TB the assignment is precomputed at ingest and ``cid`` is
    the partition key, so a probe reads nprobe/n_centroids of the data.
    """
    dim = len(query_vec)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    assigned, cents = ivf_assignments(embeddings, n_centroids, id_col, vec_col, dim)
    # Probe ranking touches only K codebook rows — the interpreted
    # fold avoids compiling another unrolled expression for 8 rows
    # (identical summation order, so the rounded scores are bit-equal).
    probe_rows = (
        cents.select("cid", F.round(cosine(F.col("cvec"), q, None), 6).alias("qsim"))
        .orderBy(F.desc("qsim"), F.asc("cid"))
        .limit(nprobe)
        .collect()
    )
    probe_cids = [r.cid for r in probe_rows]
    scored = assigned.filter(F.col("cid").isin(probe_cids)).select(
        id_col,
        "cid",
        F.round(cosine(F.col(vec_col), q, dim), 6).alias("score"),
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
    Each row's norm is computed once before the join, so a pair costs
    one dot product, not three.
    """
    dim = _probe_dim(embeddings, vec_col)
    b = spread(embeddings).select(
        F.col(id_col),
        F.col(vec_col),
        sign_bucket(F.col(vec_col), nbits).alias("bucket"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col), dim)).alias("_norm"),
    )
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    )
    score = F.round(
        _dot(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"), dim)
        / (F.col("l._norm") * F.col("r._norm")),
        6,
    )
    return (
        pairs.select(
            F.col(f"l.{id_col}").alias("a_id"),
            F.col(f"r.{id_col}").alias("b_id"),
            score.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization: per-vector scale = 127 / max|x|,
    q_i = round(x_i * scale). The storage-side optimization of a
    100 TB vector store (4x smaller than float32, dot products stay
    SIMD-able); one projection, no shuffle.

    Output keeps the quantized array plus scalar audit columns
    (scale, quantized-value checksum, max reconstruction error) so the
    result is hashable cross-engine.
    """
    v = F.col(vec_col)
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.lit(127.0) / max_abs
    quant = F.transform(v, lambda x: F.round(x.cast("double") * scale).cast("int"))
    recon_err = F.array_max(
        F.zip_with(
            quant,
            v,
            lambda q, x: F.abs(q.cast("double") / scale - x.cast("double")),
        )
    )
    return embeddings.select(
        F.col(id_col),
        quant.alias("q_vec"),
        F.round(scale, 6).alias("scale"),
        F.aggregate(quant, F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "q_sum"
        ),
        F.round(recon_err, 6).alias("max_err"),
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """KNN join: for every query vector, its k nearest corpus vectors
    by cosine (self-matches excluded) — the batch primitive behind
    embedding dedup and retrieval-evaluation pipelines.

    Shape for |Q| << |corpus| (the practical case): the query set is
    broadcast, the corpus scan is the only big side, and each side's
    norm is computed once before pairing so a pair costs one dot
    product. Per-query top-k is a row_number window keyed by q_id;
    at 100 TB you first cut candidates with the IVF/LSH route
    (ivf_topk, lsh_bucket_topk) and keep this exact join for the
    shortlist — same output contract.
    """
    dim = _probe_dim(corpus, vec_col)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col), dim)).alias("q_norm"),
    )
    c = spread(corpus).select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col), dim)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "c_id",
            F.round(
                _dot(F.col("c_vec"), F.col("q_vec"), dim)
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", "score", "rn")
    )
