"""Property-based cross-engine parity and operator invariants.

The reference ships no randomized tests (SURVEY §5: "No randomized/
property-based tests"); these go beyond it. Hypothesis generates
adversarial inputs once per example and each example is compared in a
single Spark job + a single DuckDB query (batch-shaped, so the suite
stays fast).

Known caveat pinned below: Unicode one-to-many case folding (İ,
U+0130) diverges between java.lang.String.toLowerCase and DuckDB's
lower(); the tokenizer contract is exact on ASCII and on case-stable
Unicode. Corpus text in the testdata is pure ASCII (verified:
octet_length == length for every document).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datafusion_dist_spark.functions.hashing import (
    hash_hex,
    hash_hex_oracle,
    shingle_array,
    shingle_array_oracle,
    tokens,
    tokens_oracle,
)

# Printable ASCII + case-stable non-ASCII (CJK, emoji, accented latin
# whose lower() is a single codepoint in both engines).
_ALPHABET = st.sampled_from(
    list(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789 .,;:!?-_/()[]{}@#$%^&*+='\"\t\n"
    )
    + list("汉字日本語한국어éèüñçøå😀🌍")
)
_TEXTS = st.lists(
    st.text(alphabet=_ALPHABET, max_size=60), min_size=20, max_size=20
)


def _both(spark, pdf: pd.DataFrame, spark_cols, oracle_select: str):
    sdf = (
        spark.createDataFrame(pdf)
        .select("i", *spark_cols)
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    with duckdb.connect() as con:
        con.register("t", pdf)
        odf = con.execute(
            f"SELECT i, {oracle_select} FROM t ORDER BY i"
        ).fetchdf()
    return sdf, odf


@settings(max_examples=3, deadline=None)
@given(_TEXTS)
def test_tokenizer_and_hash_parity(spark, texts):
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    sdf, odf = _both(
        spark,
        pdf,
        [
            tokens(F.col("text")).alias("toks"),
            hash_hex(F.col("text"), seed="p").alias("h"),
            shingle_array(tokens(F.col("text")), 3).alias("shs"),
        ],
        f"{tokens_oracle('text')} AS toks, "
        f"{hash_hex_oracle('text', 'p', 8)} AS h, "
        f"{shingle_array_oracle(tokens_oracle('text'), 3)} AS shs",
    )
    for i in range(len(texts)):
        assert list(sdf.toks[i]) == list(odf.toks[i]), repr(texts[i])
        assert sdf.h[i] == odf.h[i], repr(texts[i])
        assert list(sdf.shs[i]) == list(odf.shs[i]), repr(texts[i])


def test_known_unicode_casefold_divergence(spark):
    """İ (U+0130) lowercases to 'i' + COMBINING DOT ABOVE in the JVM
    but to plain 'i' in DuckDB — a real, documented engine divergence.
    This test pins the behavior so a silent convergence (or any change
    in either engine) is noticed."""
    pdf = pd.DataFrame({"i": [0], "text": ["İstanbul"]})
    sdf, odf = _both(
        spark,
        pdf,
        [tokens(F.col("text")).alias("toks")],
        f"{tokens_oracle('text')} AS toks",
    )
    assert list(sdf.toks[0]) == ["i", "stanbul"]  # JVM: combining mark splits
    assert list(odf.toks[0]) == ["istanbul"]  # DuckDB: folds to plain i


def test_hash_sample_thresholds_nest(spark):
    """Deterministic sampling must be monotone: the rate-r1 sample is a
    subset of the rate-r2 sample for r1 < r2 (the property that makes
    hash sampling reproducible under data growth). Runs hash_sample
    ITSELF per rate — asserting on raw buckets would hold by set
    theory no matter what the operator does."""
    from datafusion_dist_spark.catalog import load_table
    from datafusion_dist_spark.operators.sampling import hash_sample

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id"
    )
    rates = [0.05, 0.2, 0.5, 0.9]
    kept = [
        {r.doc_id for r in hash_sample(docs, "doc_id", rate).collect()}
        for rate in rates
    ]
    assert 0 < len(kept[0]) < len(kept[-1])  # rates actually bite
    for small, big in zip(kept, kept[1:]):
        assert small <= big


def test_chunk_documents_covers_every_token(spark):
    """Chunk invariants: chunk 0 starts at 0, consecutive starts differ
    by the stride, and the final chunk reaches the last token — so the
    chunk set covers the whole document."""
    from datafusion_dist_spark.catalog import load_table
    from datafusion_dist_spark.functions.hashing import tokens as toks_fn
    from datafusion_dist_spark.operators.text import chunk_documents

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    chunks = chunk_documents(docs, size=64, stride=48)
    per_doc = chunks.groupBy("doc_id").agg(
        F.min("start_tok").alias("first_start"),
        F.max(F.col("start_tok") + F.col("chunk_tokens")).alias("covered"),
        F.count("*").alias("n_chunks"),
        F.max("start_tok").alias("last_start"),
    )
    n_tok = docs.select(
        "doc_id", F.size(toks_fn(F.col("text"))).alias("n")
    ).filter(F.col("n") > 0)
    joined = per_doc.join(n_tok, "doc_id").toPandas()
    assert (joined.first_start == 0).all()
    assert (joined.covered == joined.n).all()
    assert (joined.last_start == (joined.n_chunks - 1) * 48).all()
    # No chunk may be fully contained in its predecessor: every
    # non-first chunk must extend past the previous chunk's end,
    # i.e. contribute more than the 16-token overlap.
    redundant = chunks.filter(
        (F.col("chunk_idx") > 0) & (F.col("chunk_tokens") <= 16)
    ).count()
    assert redundant == 0


def test_minhash_finds_exact_duplicates(spark):
    """Identical documents have identical signatures, hence share every
    band: the LSH pipeline must report every exact-duplicate pair with
    est_jaccard exactly 1.0 (a recall guarantee that holds
    deterministically, unlike near-dup recall)."""
    from datafusion_dist_spark.queries.llm import _corpus, dedup_minhash_lsh

    sf = "/root/testdata/sf0.001"
    pairs = dedup_minhash_lsh(spark, sf).toPandas()
    docs = _corpus(spark, sf).toPandas()
    by_text = docs.groupby("text")["doc_id"].apply(list)
    expected = {
        (min(a, b), max(a, b))
        for ids in by_text
        if len(ids) > 1
        for a in ids
        for b in ids
        if a < b
    }
    found = {
        (r.a_id, r.b_id): r.est_jaccard for r in pairs.itertuples()
    }
    for pair in expected:
        assert pair in found, f"exact duplicate pair {pair} missed"
        assert found[pair] == 1.0


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=15,
        max_size=15,
        unique=True,
    )
)
def test_sampling_bucket_parity_on_adversarial_keys(spark, keys):
    """The deterministic-sampling bucket must agree across engines for
    ANY key value (negative, huge) — sampling membership is defined by
    this function, so a parity break silently selects different rows."""
    from datafusion_dist_spark.operators.sampling import _bucket, bucket_oracle

    pdf = pd.DataFrame({"i": range(len(keys)), "k": keys})
    sdf = (
        spark.createDataFrame(pdf)
        .select("i", _bucket(F.col("k"), "smp").alias("b"))
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    with duckdb.connect() as con:
        con.register("t", pdf)
        odf = con.execute(
            f"SELECT i, {bucket_oracle('k', 'smp')} AS b FROM t ORDER BY i"
        ).fetchdf()
    assert list(sdf.b) == list(odf.b), keys


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100.0, max_value=100.0, width=32, allow_nan=False
            ),
            min_size=16,
            max_size=16,
        ),
        min_size=8,
        max_size=12,
    )
)
def test_numpy_scorer_matches_sql_fold(spark, vecs):
    """The IVF numpy scorer must be BIT-IDENTICAL to the unrolled SQL
    fold on raw (unrounded) doubles — equality of rounded values is
    not enough, because a 1-ULP divergence can flip the rounded 6dp
    value and with it the argmax assignment. Zero-norm rows are
    excluded (no such vectors exist in data; Spark double/0 → NULL
    while numpy → inf, a documented divergence)."""
    import math

    import numpy as np

    from datafusion_dist_spark.operators.similarity import (
        _dot_sql,
        _lit_norm,
        _numpy_ivf_scorer,
    )

    dim = 16
    vecs = [v for v in vecs if any(x != 0.0 for x in v)]
    if len(vecs) < 4:
        return
    cents = vecs[:3]
    qvec = vecs[3]
    # float32 storage like the real embedding column
    rows = [(i, [float(np.float32(x)) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents64 = [[float(np.float32(x)) for x in c] for c in cents]
    q64 = [float(np.float32(x)) for x in qvec]
    scorer = _numpy_ivf_scorer(
        cents64, [_lit_norm(c) for c in cents64], q64, _lit_norm(q64)
    )
    got = (
        df.select("vec_id", scorer(F.col("embedding")).alias("s"))
        .selectExpr("vec_id", "s.qscore AS qscore", "s.csims AS csims")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    vd = df.selectExpr(
        "vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS vd"
    ).selectExpr(
        "vec_id",
        f"sqrt({_dot_sql('@vd', '@vd', dim)}) AS norm",
        f"{_dot_sql('@vd', q64, dim)} AS qdot",
        *[f"{_dot_sql('@vd', c, dim)} AS dot{j}" for j, c in enumerate(cents64)],
    )
    want = vd.toPandas().sort_values("vec_id").reset_index(drop=True)
    qn = _lit_norm(q64)
    for i in range(len(want)):
        norm = float(want.norm[i])
        exp_q = float(want.qdot[i]) / (norm * qn)
        assert math.isclose(got.qscore[i], exp_q, rel_tol=0.0, abs_tol=0.0), (
            i,
            got.qscore[i],
            exp_q,
        )
        for j, c in enumerate(cents64):
            exp_c = float(want[f"dot{j}"][i]) / (norm * _lit_norm(c))
            assert got.csims[i][j] == exp_c, (i, j, got.csims[i][j], exp_c)


def test_ngram_cap_bounds_stop_shingle_pairs(spark):
    """Skew guard (VERDICT r1 #4): plant one stop-shingle across N
    docs. Uncapped, the posting list alone yields N·(N-1)/2 candidate
    pairs in ONE task; with the cap the shingle is dropped before pair
    enumeration, and pairs from non-degenerate shingles are untouched
    (same rows, capped scores ≤ exact scores)."""
    from datafusion_dist_spark.operators.dedup import ngram_jaccard_pairs

    n = 30
    boiler = "the quick brown fox jumps over"  # shared 6-token prefix
    rows = [(i, f"{boiler} unique{i} tail{i} body{i} end{i}") for i in range(n)]
    # Two true near-dups sharing their whole text except one token.
    rows += [(100, "alpha beta gamma delta epsilon zeta eta"),
             (101, "alpha beta gamma delta epsilon zeta theta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = ngram_jaccard_pairs(
        docs, threshold=0.0, max_list_len=None
    ).toPandas()
    capped = ngram_jaccard_pairs(docs, threshold=0.0, max_list_len=8).toPandas()

    # The boilerplate shingles pair up all 30 planted docs uncapped...
    boiler_pairs_un = uncapped[(uncapped.a_id < n) & (uncapped.b_id < n)]
    assert len(boiler_pairs_un) == n * (n - 1) // 2
    # ...and are fully suppressed by the cap (their ONLY shared
    # shingles are the stop-shingles).
    boiler_pairs_cap = capped[(capped.a_id < n) & (capped.b_id < n)]
    assert len(boiler_pairs_cap) == 0
    # The true near-dup pair survives the cap with its exact score.
    for frame in (uncapped, capped):
        hit = frame[(frame.a_id == 100) & (frame.b_id == 101)]
        assert len(hit) == 1
    cap_score = capped[(capped.a_id == 100)].jaccard.iloc[0]
    un_score = uncapped[(uncapped.a_id == 100)].jaccard.iloc[0]
    assert cap_score == un_score
    # Capped scores never exceed exact scores anywhere.
    merged = capped.merge(uncapped, on=["a_id", "b_id"], suffixes=("_c", "_u"))
    assert (merged.jaccard_c <= merged.jaccard_u).all()


def test_ngram_default_is_capped(spark):
    """r6: the NO-ARG text-dedup calls carry the skew guard — a stop
    shingle whose posting list exceeds DEFAULT_MAX_LIST_LEN is dropped
    by default; the exact quadratic form needs an explicit
    max_list_len=None opt-out."""
    from datafusion_dist_spark.operators.dedup import (
        DEFAULT_MAX_LIST_LEN,
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    n = DEFAULT_MAX_LIST_LEN + 20
    boiler = "the quick brown fox jumps over"
    rows = [(i, f"{boiler} unique{i} tail{i} body{i} end{i}") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    assert ngram_jaccard_pairs(docs, threshold=0.0).count() == 0
    assert ngram_containment_pairs(docs, threshold=0.0).count() == 0
    exact = ngram_jaccard_pairs(docs, threshold=0.0, max_list_len=None)
    assert exact.count() == n * (n - 1) // 2


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100.0, max_value=100.0, width=32, allow_nan=False
            ),
            min_size=16,
            max_size=16,
        ),
        min_size=4,
        max_size=12,
    )
)
def test_semantic_dedup_matches_bruteforce_oracle(spark, vecs):
    """The grouped-numpy pairwise scorer (rank-1-update accumulation +
    conservative raw prefilter) must reproduce the brute-force
    all-pairs DuckDB decision EXACTLY on adversarial float32 vectors:
    the prefilter may never drop a pair whose rounded cosine reaches
    the threshold, and the in-plan round must make the final decision.
    Single-centroid setup puts every vector in one cluster so the
    brute force needs no assignment CTE."""
    import numpy as np

    from datafusion_dist_spark.operators.similarity import (
        semantic_dedup_decisions,
    )
    from tests.oracle_compare import assert_frames_match

    vecs = [v for v in vecs if any(x != 0.0 for x in v)]
    if len(vecs) < 3:
        return
    rows = [(i, [float(np.float32(x)) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = semantic_dedup_decisions(df, n_centroids=1, threshold=0.5).toPandas()
    con = duckdb.connect()
    pdf = pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [r[1] for r in rows],
        }
    )
    con.register("embeddings", pdf)
    exp = con.execute(
        """
        WITH dups AS (
            SELECT y.vec_id, min(x.vec_id) AS dup_of, count(*) AS n_dups
            FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
            WHERE round(CAST(list_cosine_similarity(
                      CAST(x.embedding AS DOUBLE[]),
                      CAST(y.embedding AS DOUBLE[])) AS DOUBLE), 6) >= 0.5
            GROUP BY y.vec_id
        )
        SELECT e.vec_id, CAST(0 AS BIGINT) AS cid, d.dup_of,
               CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups
        FROM embeddings e LEFT JOIN dups d USING (vec_id)
        """
    ).fetchdf()
    assert_frames_match(got, exp, "semantic_dedup_property")


@given(st.binary(max_size=256))
@settings(max_examples=300, deadline=None)
def test_flightsql_parsers_never_raise_on_garbage(buf):
    """The wire-facing FlightSQL parsers must return None (fall through
    to the next command form) on ANY byte string — a malformed or
    malicious client must never crash get_flight_info/do_get with an
    unhandled exception."""
    from datafusion_dist_spark import flightsql

    for fn in (
        flightsql.parse_statement_query,
        flightsql.parse_prepared_query,
        flightsql.parse_ticket,
        flightsql.parse_metadata_command,
        flightsql.parse_create_prepared_request,
        flightsql.parse_close_prepared_request,
        flightsql.parse_create_prepared_result,
    ):
        fn(buf)  # any return is fine; raising is the failure


@given(st.binary(max_size=64), st.binary(max_size=64))
@settings(max_examples=100, deadline=None)
def test_flightsql_any_envelope_roundtrip(handle, value):
    """encode→parse is the identity for every envelope we mint."""
    from datafusion_dist_spark import flightsql

    assert flightsql.parse_ticket(flightsql.encode_ticket(handle)) == handle
    t, v = flightsql.decode_any(flightsql.encode_any("x.y/Z", value))
    assert (t, v) == ("x.y/Z", value)


@given(st.integers(min_value=0, max_value=10_000_000))
@settings(max_examples=500, deadline=None)
def test_adaptive_nbits_ladder_matches_log_formula(n):
    """The integer threshold ladder IS floor(log2(n/125)) clamped to
    [4, 8] — the ladder exists only so Python and SQL agree bit-for-bit
    at bucket-doubling boundaries where libm log2 could differ in the
    last ulp. Bucket population n / 2^nbits therefore stays inside
    [125, 250) across the whole supported range (above the 4-bit floor
    and below the 8-bit ceiling)."""
    import math

    from datafusion_dist_spark.queries.llm import _adaptive_nbits

    nbits = _adaptive_nbits(n)
    if n >= 125 << 4:
        expect = min(8, int(math.floor(math.log2(n / 125))))
    else:
        expect = 4
    assert nbits == expect
    if 125 << 4 <= n < 125 << 9:  # between the floor and the ceiling
        assert 125 <= n / (1 << nbits) < 250


@given(st.integers(min_value=0, max_value=10_000_000))
@settings(max_examples=200, deadline=None)
def test_adaptive_ivf_k_keeps_list_size_bounded(n):
    """K = max(8, n // 250) keeps the mean inverted-list size <= 250
    above the floor (constant per-query candidate work), and K never
    exceeds n/125 + 8 (lists never get pathologically small either)."""
    from datafusion_dist_spark.queries.llm import _IVF_LIST_SIZE

    k = max(8, n // _IVF_LIST_SIZE)
    if n >= 8 * _IVF_LIST_SIZE:
        assert n / k <= _IVF_LIST_SIZE + _IVF_LIST_SIZE / k  # ceil slack
        assert n / k > _IVF_LIST_SIZE / 2


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=12,
        max_size=12,
        unique=True,
    )
)
def test_countmin_bucket_parity_on_adversarial_keys(spark, keys):
    """Every CMS hash row's bucket must agree across engines for ANY
    key value (negative, huge) — the sketch's counters and estimates
    are defined by these buckets, so a parity break makes the DuckDB
    oracle count different cells while both sides still look
    internally consistent."""
    from datafusion_dist_spark.operators.sketch import _bucket, bucket_oracle

    pdf = pd.DataFrame({"i": range(len(keys)), "k": keys})
    sdf = (
        spark.createDataFrame(pdf)
        .select(
            "i", *[_bucket(F.col("k"), h, 256).alias(f"b{h}") for h in range(3)]
        )
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    with duckdb.connect() as con:
        con.register("t", pdf)
        cols = ", ".join(
            f"{bucket_oracle('k', h, 256)} AS b{h}" for h in range(3)
        )
        odf = con.execute(f"SELECT i, {cols} FROM t ORDER BY i").fetchdf()
    for h in range(3):
        assert list(sdf[f"b{h}"]) == list(odf[f"b{h}"]), (h, keys)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=12,
        max_size=12,
        unique=True,
    )
)
def test_hll_register_parity_on_adversarial_keys(spark, keys):
    """Every key's (register, rho) pair must agree across THREE
    implementations for ANY key value — Spark, the DuckDB oracle SQL
    (``hll_registers_oracle`` executed verbatim, so a DuckDB-side
    regression in the hex cast / ``//`` / ``bin()`` semantics surfaces
    here and not only in full sweeps), and an independent hashlib
    reimplementation. Register placement AND the leading-zero count
    define the sketch, so a parity break yields internally-consistent
    but cross-engine-divergent estimates. Pins the full integer bit
    path: 60-bit md5 window, modulo register, shiftright remainder,
    binary-string-length rho, and the w=0 saturation case."""
    import hashlib

    from datafusion_dist_spark.operators.sketch import (
        HLL_P,
        hll_registers,
        hll_registers_oracle,
        hll_rho_max,
    )

    m = 1 << HLL_P
    rho_max = hll_rho_max()
    pdf = pd.DataFrame({"k": keys})
    got = {
        r["register"]: r["max_rho"]
        for r in hll_registers(
            spark.createDataFrame(pdf), "k"
        ).collect()
    }
    with duckdb.connect() as con:
        con.register("t", pdf)
        oracle = {
            int(reg): int(rho)
            for reg, rho in con.execute(
                hll_registers_oracle("k", "t")
            ).fetchall()
        }
    want: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(f"0:{k}".encode()).hexdigest()[:15], 16)
        w = h >> HLL_P
        rho = rho_max if w == 0 else rho_max - w.bit_length()
        reg = h % m
        want[reg] = max(want.get(reg, 0), rho)
    assert got == want, keys
    assert oracle == want, keys


def _simulate_hll_registers(n_true: int, hash_bits: int, p: int, seed: int):
    """Exact distributional plant of the register table a ``hash_bits``
    -wide ideal hash would produce over ``n_true`` distinct keys —
    2^31 keys cost 2^p draws, not 2^31 md5s. Collisions enter through
    the expected surviving-distinct-hash count D = H*(1-(1-1/H)^n)
    (the quantity an HLL actually sees: it estimates distinct HASH
    values, not distinct keys); D hashes multinomial-split over the
    registers; each register's max-rho sampled by inverting
    P(max<=k) = (1-2^-k)^n, capped at the width's saturation value."""
    import numpy as np

    m = 1 << p
    H = 2.0**hash_bits
    rho_max = hash_bits - p + 1
    d_distinct = int(round(H * -math.expm1(n_true * math.log1p(-1.0 / H))))
    rng = np.random.default_rng(seed)
    counts = rng.multinomial(d_distinct, [1.0 / m] * m)
    u = rng.random(m)
    regs = {}
    for r in range(m):
        n = int(counts[r])
        if n == 0:
            continue
        k = 1
        while k < rho_max and n * math.log1p(-(2.0**-k)) < math.log(u[r]):
            k += 1
        regs[r] = k
    return d_distinct, regs


def test_hll_widened_hash_unbiased_at_planted_2pow31_cardinality(spark):
    """VERDICT r9 task 2's 'Done' check: at a planted 2^31 true
    cardinality — billions of distinct users, the brief's 100 TB
    regime — the 60-bit register hash keeps the shipped estimator
    inside its rsd band, while the r9 32-bit design demonstrably
    biases low (its hash space is only 2x the key count, so ~21% of
    keys vanish into collisions before the sketch ever sees them).
    Both arms run through the SAME shipped Spark estimator
    (hll_estimate is width-agnostic given the registers); the planted
    register tables differ only by each width's collision loss and
    rho saturation. Seed-pinned: the simulated estimates are
    deterministic (60-bit lands ~0.96N, 32-bit ~0.73N)."""
    from datafusion_dist_spark.operators.sketch import (
        HLL_HASH_BITS,
        HLL_P,
        hll_estimate,
    )

    n_true = 2**31
    rsd3 = 3 * 1.04 / math.sqrt(1 << HLL_P)  # 3 sigma ~= 0.195
    estimates = {}
    for bits in (HLL_HASH_BITS, 32):
        _, regs = _simulate_hll_registers(n_true, bits, HLL_P, seed=7)
        pdf = pd.DataFrame(
            {"register": list(regs), "max_rho": list(regs.values())}
        )
        est = hll_estimate(spark.createDataFrame(pdf)).collect()[0]
        estimates[bits] = est["est_distinct"]
    assert abs(estimates[HLL_HASH_BITS] / n_true - 1) < rsd3, estimates
    assert estimates[32] < 0.85 * n_true, estimates
    # The 32-bit arm is not broken math — it faithfully estimates the
    # collision-shrunk distinct-hash count; the loss is structural.
    d32 = 2.0**32 * -math.expm1(n_true * math.log1p(-(2.0**-32)))
    assert abs(estimates[32] / d32 - 1) < rsd3, (estimates, d32)
