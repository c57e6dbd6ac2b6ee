"""Constant-state sketches: count-min (frequency) + HyperLogLog-style
registers (cardinality) — engine extensions.

The reference's only sketch-adjacent surface is approximate distinct
counting; a training-data pipeline also needs frequency estimation over
key spaces too large to hold exactly (heavy-hitter domains, hot-URL
detection, per-user rate screens at crawl scale). Count-min is the
standard answer: a ``depth x width`` grid of counters whose size is
FIXED regardless of input rows or distinct keys.

Scale design (the whole point of the sketch):
- ``countmin_cells`` is one scan → explode each row into ``depth``
  (h, bucket) cells → two-phase hash aggregate. The explode is map-side
  CPU only; the shuffle carries at most depth*width partial cells PER
  TASK, independent of input size. At 100 TB the sketch build is
  scan-bound with a constant-size shuffle.
- ``countmin_lookup`` broadcasts the cells (depth*width rows, a few KB)
  and answers estimates for a candidate-key DataFrame in one scan of
  the candidates — the big table is never re-joined.
- Hashes are the cross-engine md5 windows from functions/hashing.py, so
  a DuckDB oracle reproduces every counter and estimate bit-for-bit
  (the estimate is a deterministic function of the data, not a random
  variable per run).

Estimate semantics: est(k) = min over depth rows of counter[h][bucket
(k)] — an upper bound on the true count (collisions only inflate),
within eps*N with probability 1-delta for width=e/eps, depth=ln(1/
delta). Keys absent from the build side read whatever their buckets
hold (>= 0) — classic CMS behavior, preserved here by the left join +
zero fill. NULL is not a key: NULL build rows would land in (h, NULL)
cells no probe can join (md5 of NULL is NULL), silently breaking the
upper-bound invariant, so both build and lookup drop NULL keys —
count NULLs separately if they matter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_dist_spark.functions.hashing import (
    hash_hex_wide,
    hash_hex_wide_oracle,
    hash_int32,
    hash_int32_oracle,
)


def _bucket(key: Column, h: int, width: int) -> Column:
    """Row ``h``'s bucket for ``key``: 16-bit md5 window mod width.

    The depth hash functions are disjoint 4-hex-char windows of ONE
    md5 digest (functions/hashing.py:wide_hash_window — the same
    packing minhash uses), so a build row costs one md5 for any
    depth <= 8, not depth md5s.
    """
    return (
        F.conv(hash_hex_wide(key.cast("string"), h, 4), 16, 10).cast("int")
        % F.lit(width)
    )


def bucket_oracle(key_expr: str, h: int, width: int) -> str:
    """DuckDB mirror of ``_bucket`` (same md5 window, same mod)."""
    hx = hash_hex_wide_oracle(f"CAST({key_expr} AS VARCHAR)", h, 4)
    return f"(CAST(('0x' || {hx}) AS INTEGER) % {width})"


def countmin_cells(
    df: DataFrame,
    key: str,
    depth: int = 3,
    width: int = 256,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Build the sketch: (*group_cols, h, b, cnt) for every touched cell.

    One scan; the explode-to-depth-rows happens inside the same stage
    as the partial aggregation, so the exchange after it carries cell
    partials (<= depth*width per task and group), never the exploded
    rows. NULL keys are dropped (see module docstring), which also
    keeps the grid-size bound exact: cells.count() <= depth * width
    per group. ``group_cols`` builds one independent grid per group —
    e.g. per time window — at depth*width state per group, the
    windowed-rate-monitor shape.
    """
    cells = df.where(F.col(key).isNotNull()).select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(h).alias("h"),
                        _bucket(F.col(key), h, width).alias("b"),
                    )
                    for h in range(depth)
                ]
            )
        ).alias("cell"),
    )
    return cells.groupBy(
        *group_cols, F.col("cell.h").alias("h"), F.col("cell.b").alias("b")
    ).agg(F.count("*").alias("cnt"))


def watch_buckets(
    keys: list, depth: int = 3, width: int = 256
) -> list[tuple]:
    """Driver-side probe rows for a LITERAL watchlist: (key, h, b)
    triples computed with hashlib's md5 — bit-identical to ``_bucket``
    (same ``wide_hash_window`` packing; parity pinned in
    tests/test_operators.py). Lets a watchlist query skip the
    distinct-key enumeration scan entirely: the probes are a tiny
    inline DataFrame joined against the (broadcast or grouped) cells.
    """
    import hashlib

    from datafusion_dist_spark.functions.hashing import wide_hash_window

    out = []
    for k in keys:
        for h in range(depth):
            group, start = wide_hash_window(h, width=4)  # 1-based offset
            digest = hashlib.md5(f"{group}:{k}".encode()).hexdigest()
            b = int(digest[start - 1 : start - 1 + 4], 16) % width
            out.append((k, h, b))
    return out


HLL_P = 8  # 2^p registers; p=8 -> 256 registers, ~6.5% rel. error


def hll_registers(
    df: DataFrame,
    key: str,
    p: int = HLL_P,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Cardinality-sketch register table: (register, max_rho) — the
    distinct-count sibling of ``countmin_cells`` (frequency). State is
    2^p integer registers FOREVER, regardless of rows or distinct keys,
    and registers are MAX-mergeable across shards/batches (property-
    tested), which is what makes the sketch a distributed/streaming
    aggregate the way the CMS grid is.

    Construction (cross-engine exact, no libm): the 32-bit md5 hash
    splits into ``register = h32 % 2^p`` and a ``(32-p)``-bit remainder
    ``w``; ``rho(w)`` — the 1-based position of w's leftmost set bit,
    ``(32-p+1)`` when w = 0 — is computed as ``(32-p+1) - len(bin(w))``
    (binary-string length, an integer op both engines share), never a
    float log2. One scan; the explode-free projection keeps the partial
    max inside the scan stage, so the exchange carries at most 2^p
    register partials per task. NULL keys are dropped (NULL is not a
    key — same contract as the CMS build). ``group_cols`` builds one
    independent register set per group (e.g. distinct users per event
    type) at 2^p state per group — one scan, never a per-group
    distinct shuffle of the key space."""
    m = 1 << p
    rho_max = 32 - p + 1
    h32 = hash_int32(F.col(key).cast("string"))
    w = F.shiftright(h32, p)
    rho = F.when(w == 0, F.lit(rho_max)).otherwise(
        F.lit(rho_max) - F.length(F.bin(w))
    )
    return (
        df.where(F.col(key).isNotNull())
        .select(
            *group_cols,
            (h32 % m).cast("int").alias("register"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_registers_oracle(
    key_expr: str,
    table_sql: str,
    p: int = HLL_P,
    group_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB mirror of ``hll_registers`` (same md5 hash, same integer
    bit math), for oracle SQL strings."""
    m = 1 << p
    rho_max = 32 - p + 1
    h = hash_int32_oracle(f"CAST({key_expr} AS VARCHAR)")
    gsel = "".join(f"{g}, " for g in group_cols)
    return f"""
        SELECT {gsel}CAST(h32 % {m} AS INTEGER) AS register,
               CAST(MAX(CASE WHEN (h32 // {m}) = 0 THEN {rho_max}
                             ELSE {rho_max} - length(bin(h32 // {m}))
                        END) AS INTEGER) AS max_rho
        FROM (SELECT {gsel}{h} AS h32 FROM {table_sql}
              WHERE {key_expr} IS NOT NULL)
        GROUP BY ALL
    """


def hll_estimate(
    registers: DataFrame,
    p: int = HLL_P,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """HyperLogLog cardinality estimate from a register table:
    (*group_cols, est_distinct, zero_registers, touched_registers) —
    one row per group (one row total when ungrouped; pass the SAME
    ``group_cols`` the registers were built with, else registers from
    different groups silently pool into one wrong estimate).

    The harmonic sum stays in exact dyadic arithmetic — ``2^-max_rho``
    is ``1.0 / (1 << max_rho)`` (integer shift, never pow()), every
    term a multiple of 2^-(32-p+1) and the total < 2^p, so the double
    sum is EXACT and the alpha*m^2/S division is one deterministic
    IEEE op both engines share. Untouched registers contribute 2^0
    each: S = (m - touched) + sum(2^-max_rho). Linear counting takes
    over below 2.5*m when zero registers remain (the standard
    small-range correction; its ln() is the one float op, rounded to
    4 decimals in outputs)."""
    aggs = [
        F.count("*").alias("touched"),
        F.sum(rho_inverse_pow2("max_rho")).alias("s_touched"),
    ]
    agg = (
        registers.groupBy(*group_cols).agg(*aggs)
        if group_cols
        else registers.agg(*aggs)
    )
    zeros = F.lit(1 << p) - F.col("touched")
    return agg.select(
        *group_cols,
        hll_estimate_expr(F.col("touched"), F.col("s_touched"), p).alias(
            "est_distinct"
        ),
        zeros.cast("int").alias("zero_registers"),
        F.col("touched").cast("int").alias("touched_registers"),
    )


def rho_inverse_pow2(col_name: str = "max_rho") -> Column:
    """``2^-<col>`` as exact dyadic arithmetic: ``1.0 / (1 << rho)``
    via the SQL shiftleft (the Python shiftleft() wants a literal
    count, hence the column NAME argument), never pow()."""
    return F.lit(1.0) / F.expr(f"shiftleft(CAST(1 AS BIGINT), {col_name})")


def hll_estimate_expr(
    touched: Column, s_touched: Column, p: int = HLL_P
) -> Column:
    """The round-4 HLL estimate as a column expression over register
    summary columns (``touched`` register count, ``s_touched`` =
    sum of 2^-max_rho over touched registers) — shared by the plain /
    grouped estimates and the set-algebra entries so the estimator
    math exists exactly once on the Spark side."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    zeros = F.lit(m) - touched
    # coalesce: an EMPTY input has no touched registers (sum -> NULL);
    # S must then be m ones, which routes into linear counting with
    # V = m and an exact est of m*ln(1) = 0.
    s = F.coalesce(s_touched, F.lit(0.0)) + zeros.cast("double")
    raw = F.lit(alpha * m * m) / s
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return F.round(est, 4)


def countmin_lookup(
    keys: DataFrame, cells: DataFrame, key: str, depth: int = 3, width: int = 256
) -> DataFrame:
    """Estimate counts for candidate ``keys``: (key, est).

    The cells grid is broadcast (constant bytes by construction); the
    candidates are scanned once. Unseen-bucket probes read 0 via the
    left join so absent keys get the true CMS estimate instead of
    silently dropping out. NULL candidates are dropped (NULL is not a
    key; its probe buckets would be NULL and never match). ``cells``
    must be an UNGROUPED grid: joining a per-group grid (built with
    ``group_cols``) on (h, b) alone would min() counters across groups
    into a plausible-looking wrong number, so that is rejected here —
    probe grouped grids with an explicit join on the group keys (see
    queries/temporal.py:events_cms_watchlist).
    """
    extra = set(cells.columns) - {"h", "b", "cnt"}
    if extra:
        raise ValueError(
            "countmin_lookup needs an ungrouped cells grid; got extra "
            f"columns {sorted(extra)} — join grouped grids explicitly "
            "on their group keys"
        )
    probes = keys.where(F.col(key).isNotNull()).select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(h).alias("h"),
                        _bucket(F.col(key), h, width).alias("b"),
                    )
                    for h in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key, F.col("cell.h").alias("h"), F.col("cell.b").alias("b"))
    return (
        probes.join(F.broadcast(cells), ["h", "b"], "left")
        .fillna({"cnt": 0})
        .groupBy(key)
        .agg(F.min("cnt").alias("est"))
    )
