"""Frequency sketches: count-min cells + point lookups (engine extension).

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
