"""Streaming job builders + a synchronous local runner."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_dist_spark.catalog import pin_session_confs, table_path


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded view of the events table: parquet file source with an
    explicit schema (streaming requires one); at scale this is Kafka or
    a growing object-store prefix — same downstream plan."""
    pin_session_confs(spark)
    schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # The file streaming source requires a directory: stream the sf
    # dir with a glob selecting only the events file.
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # Normalize ts exactly like the batch path (catalog.load_table):
    # the driver has shipped both TIMESTAMP(NANOS) — raw long under
    # nanosAsLong — and TIMESTAMP(MICROS) — timestamp_ntz.
    ts_type = dict(stream.dtypes)["ts"]
    if ts_type == "bigint":
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if ts_type != "timestamp":
        return stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def streaming_tumble_agg(events: DataFrame, window: str = "6 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming twin of
    queries/temporal.py:events_window_tumble (same groupBy plan with a
    watermark for state eviction and late-data handling)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_value_c"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "sum_value_c",
        )
    )


def run_stream_to_memory(
    agg: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drive a streaming DataFrame to completion into a memory sink.

    ``processAllAvailable`` + ``stop`` make the run synchronous; the
    result is queryable as the ``query_name`` temp view.
    """
    with tempfile.TemporaryDirectory(prefix="ddspark-ckpt-") as ckpt:
        q = (
            agg.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()


def streaming_hopping_agg(events: DataFrame) -> DataFrame:
    """Sliding-window twin of queries/temporal.py:events_hopping
    (6 h windows every 3 h; each event lands in exactly two windows)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours", "3 hours").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_value_c"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "sum_value_c",
        )
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session aggregation via the built-in session_window
    (works identically over a stream with a watermark or a batch
    DataFrame — the batch form is the exactness oracle in tests)."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", "1 hour")
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def stateful_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator: per-user sessionization with
    ``applyInPandasWithState`` (the escape hatch for stateful logic the
    built-in windowed aggs cannot express — reference has no stateful
    streaming at all, SURVEY §1.4).

    Emits every *closed* session (a newer event arrived more than
    ``gap_minutes`` later); the still-open tail session stays in state.
    State per user is one (start, last_ts, count) triple — constant
    size, shuffle-partitioned by user, exactly the
    `applyInPandasWithState` scale model.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
        ]
    )
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        ts_us = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        ts_us.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed = []
        for t in ts_us:
            if start is None:
                start, last, n = t, t, 1
            elif t - last <= gap_us:
                # Cross-batch out-of-order events can arrive with
                # t <= last; merge them by extending the session
                # bounds instead of rewinding last (which could later
                # emit a session whose end precedes its start).
                start, last, n = min(start, t), max(last, t), n + 1
            else:
                closed.append((user_id, start, last, n))
                start, last, n = t, t, 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stream_click_view_join(
    clicks: DataFrame, views: DataFrame, within: str = "30 minutes"
) -> DataFrame:
    """Stream-stream inner join: each click matched to the same user's
    views that happen within ``within`` after it.

    Both sides carry watermarks and the join condition bounds event
    time in both directions, so Spark can size the join state and
    evict it — the canonical funnel/attribution join. State is
    shuffle-partitioned by user_id; at scale the watermark delay is
    the knob that bounds state (reference has no stream joins at all,
    SURVEY §1.4). Works identically on batch DataFrames (the
    exactness oracle in tests) — watermarks are streaming-only, so
    they are applied only when the inputs stream.
    """
    if clicks.isStreaming:
        clicks = clicks.withWatermark("ts", "1 hour")
    if views.isStreaming:
        views = views.withWatermark("ts", "2 hours")
    c, v = clicks.alias("c"), views.alias("v")
    return c.join(
        v,
        (F.col("c.user_id") == F.col("v.user_id"))
        & (F.col("v.ts") >= F.col("c.ts"))
        & (F.col("v.ts") <= F.col("c.ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("c.event_id").alias("click_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("c.user_id").alias("user_id"),
        F.unix_micros(F.col("c.ts").cast("timestamp")).alias("click_us"),
        F.unix_micros(F.col("v.ts").cast("timestamp")).alias("view_us"),
    )


def streaming_dedup_keys(events: DataFrame) -> DataFrame:
    """Streaming exact dedup: first event per (user_id, event_type)
    key, duplicates dropped inside the watermark horizon via
    ``dropDuplicatesWithinWatermark`` (state evicts once the watermark
    passes, so state size tracks the delay window, not the corpus —
    the streaming twin of dedup_exact)."""
    return (
        events.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


def run_stream_foreach_batch_parquet(
    df: DataFrame, out_dir: str
) -> None:
    """Drive a stream through a ``foreachBatch`` parquet sink: each
    micro-batch is appended as ordinary batch output. foreachBatch is
    the escape hatch for sinks with no native streaming writer
    (JDBC, MERGE upserts); idempotence at scale comes from writing
    by (batch_id)-deterministic paths or transactional targets."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    with tempfile.TemporaryDirectory(prefix="ddspark-ckpt-") as ckpt:
        q = (
            df.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()


def stream_static_enrich_agg(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join + aggregation: every micro-batch joins the
    (bounded) dimension — Spark re-broadcasts it per batch, so a
    dimension refresh is picked up without restarting the query. The
    canonical streaming-enrichment topology (clickstream × user dim).
    Counts per dimension attribute in complete mode."""
    enriched = events.join(F.broadcast(dim), "user_id")
    # count_distinct is unsupported on streams; exact-cents value sum
    # keeps the compare vs batch bit-exact.
    return enriched.groupBy("tier").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_c"),
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Arbitrary stateful streaming via ``transformWithStateInPandas``
    (Spark 4's successor to applyInPandasWithState): a ValueState per
    user carries (event count, cents total) across micro-batches and
    each batch emits the user's updated running totals.

    Exactness discipline: the cents column is computed IN-PLAN
    (round(value*100) as BIGINT) before the stateful operator, so
    Python only ever adds integers — no pandas banker's-rounding in
    the state path. State is two longs per user: at scale this is the
    canonical online-feature/running-aggregate operator with state
    bounded by cardinality, not history; requires the RocksDB state
    store provider (set by the runner/test conf).
    """
    import pandas as pd

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, sum_value_c BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, sc = self._totals.get()
            else:
                n, sc = 0, 0
            for pdf in rows:
                n += len(pdf)
                sc += int(pdf["value_c"].sum())
            self._totals.update((n, sc))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "sum_value_c": [sc]}
            )

        def close(self) -> None:
            pass

    cents = events.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("value_c"),
    )
    return cents.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id BIGINT, n BIGINT, sum_value_c BIGINT",
        outputMode="Update",
        timeMode="None",
    )


def streaming_countmin_cells(
    events: DataFrame, key: str = "user_id", depth: int = 3, width: int = 256
) -> DataFrame:
    """Streaming count-min build: the same explode→groupBy plan as the
    batch sketch (operators/sketch.py:countmin_cells), run over the
    unbounded stream in complete mode.

    This is the rare aggregation that is SAFE without a watermark on an
    unbounded stream: its state is the depth×width counter grid — a
    few KB, constant FOREVER by construction, regardless of stream
    volume or key cardinality. That constant-state property is exactly
    why a crawl-scale pipeline keeps frequency state as a sketch
    instead of a per-key count (whose state grows with distinct keys).
    Batch-twin equality is pinned in tests/test_streaming.py; grid
    mergeability (cells are sum-mergeable across shards/batches) in
    tests/test_operators.py.
    """
    from datafusion_dist_spark.operators.sketch import countmin_cells

    return countmin_cells(events.select(key), key, depth, width)


def streaming_hll_registers(
    events: DataFrame, key: str = "user_id", p: int = 8
) -> DataFrame:
    """Streaming HyperLogLog build: the same hash→register→max plan as
    the batch sketch (operators/sketch.py:hll_registers), run over the
    unbounded stream in complete mode.

    Like the CMS grid, this is an aggregation that is SAFE without a
    watermark on an unbounded stream: state is 2^p integer registers
    FOREVER (max is monotone — late or replayed data can only raise a
    register, never corrupt it), which is why a crawl-scale pipeline
    tracks distinct-key cardinality as registers instead of a per-key
    distinct whose state grows with every new key. Batch-twin equality
    and the state bound are pinned in tests/test_streaming.py.
    """
    from datafusion_dist_spark.operators.sketch import hll_registers

    return hll_registers(events.select(key), key, p)
