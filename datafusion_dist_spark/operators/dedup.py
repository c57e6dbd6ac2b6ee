"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB dedup pass of a training-data pipeline:

- *exact*: one hash-groupBy on a content digest — a single shuffle of
  (digest, doc_id) pairs, never of the payload.
- *MinHash + LSH*: per-doc signatures are one explode + groupBy
  (shuffle carries (doc, shingle-hash)); banding turns the quadratic
  all-pairs problem into an equi-join on band keys, so candidate
  generation is a plain shuffle join — skew-safe under AQE; verification
  touches only candidate pairs.
- *SimHash*: fixed-width bit aggregation per doc, then a band join on
  bit-blocks for Hamming candidates.
- *n-gram Jaccard*: exact verify via an inverted-index join (shingle →
  docs), intersection counts from a groupBy — no cross join anywhere.

All sketch hashes are md5-hex (see functions/hashing.py) so the DuckDB
oracle reproduces every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datafusion_dist_spark.functions.hashing import (
    hash_hex,
    shingle_array,
    tokens,
)

# -- exact ----------------------------------------------------------------


def exact_dedup_keep_min(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup on content digest; keep the smallest doc_id per
    group. Returns (digest, n_copies, keep_id) for duplicated groups."""
    digest = F.md5(F.col(text_col)).alias("digest")
    return (
        docs.select(digest, "doc_id")
        .groupBy("digest")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


# -- shingles + MinHash ---------------------------------------------------


def doc_shingles(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded, distinct per doc."""
    sh = shingle_array(tokens(F.col(text_col)), k)
    return (
        docs.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """Per-doc MinHash signature: sig_i = MIN(md5_i(shingle)).

    One aggregation, ``num_hashes`` min() columns — the shuffle carries
    one row per (doc, shingle); signature width is a constant.
    Fixed-width hex min == numeric min (see functions/hashing.py).
    """
    aggs = [
        F.min(hash_hex(F.col("shingle"), seed=i)).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a
    candidate pair (a_id < b_id). Equi-join on (band_id, band_key)."""
    num_hashes = bands * rows_per_band
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    "|",
                    *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    assert num_hashes <= sum(1 for c in signatures.columns if c.startswith("mh"))
    banded = signatures.select(
        "doc_id", F.explode(band_entries).alias("band")
    ).select("doc_id", "band.band_id", "band.band_key")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    bands: int = 4,
    rows_per_band: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → signature → band
    join → estimate Jaccard as matching-signature-component fraction;
    keep pairs ≥ threshold."""
    num_hashes = bands * rows_per_band
    shingles = doc_shingles(docs, text_col, k)
    sigs = minhash_signatures(shingles, num_hashes)
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band)
    sa = sigs.alias("sa")
    sb = sigs.alias("sb")
    matches = sum(
        F.when(F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    est = (matches.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard")
    return (
        cands.join(sa, cands.a_id == F.col("sa.doc_id"))
        .join(sb, cands.b_id == F.col("sb.doc_id"))
        .select("a_id", "b_id", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


# -- SimHash --------------------------------------------------------------


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """Per-doc SimHash over distinct tokens: bit_j = sign of
    sum(+1/-1 per token according to bit j of the token hash).

    Token hash = 32-bit int from md5 (cross-engine stable); ``bits``
    bit-columns summed in one aggregation, then packed to one BIGINT.
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    h = F.conv(hash_hex(F.col("tok"), seed="sim"), 16, 10).cast("bigint")
    toks = toks.withColumn("h", h)
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    per_bit = toks.groupBy("doc_id").agg(*aggs)
    packed = sum(
        F.when(F.col(f"b{j}") > 0, F.lit(2**j)).otherwise(F.lit(0)) for j in range(bits)
    )
    return per_bit.select("doc_id", packed.cast("bigint").alias("simhash"))


def simhash_hamming_pairs(
    sims: DataFrame, bits: int = 16, max_distance: int = 3
) -> DataFrame:
    """Near-dup candidates by SimHash: block on bit-halves (a pair
    within distance d must agree on ≥1 of d+1 blocks — pigeonhole),
    then verify exact Hamming distance via bit_count(xor)."""
    n_blocks = max_distance + 1
    block_bits = bits // n_blocks
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("block_id"),
                F.shiftright(F.col("simhash"), i * block_bits)
                .bitwiseAND(2**block_bits - 1)
                .alias("block_key"),
            )
            for i in range(n_blocks)
        ]
    )
    blocked = sims.select("doc_id", "simhash", F.explode(blocks).alias("blk")).select(
        "doc_id", "simhash", "blk.block_id", "blk.block_key"
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    dist = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cands.select(
        "a_id", "b_id", dist.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_distance)


# -- exact n-gram Jaccard -------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard similarity via inverted-index join.

    |A∩B| comes from a groupBy over the shingle-join (each shared
    shingle contributes once — shingle sets are distinct per doc);
    |A∪B| = |A|+|B|-|A∩B|. No pair enumeration beyond docs that share
    at least one shingle.
    """
    shingles = doc_shingles(docs, text_col, k)
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = shingles.alias("a"), shingles.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_inter") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")
    )
    return (
        inter.join(sa, F.col("a_id") == F.col("sa.doc_id"))
        .join(sb, F.col("b_id") == F.col("sb.doc_id"))
        .select("a_id", "b_id", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
