"""Structured Streaming twins: the streaming tumble agg must produce
exactly the batch query's result when driven over the same files."""

from __future__ import annotations

import pytest

from datafusion_dist_spark.queries.temporal import events_window_tumble
from datafusion_dist_spark.streaming import run_stream_to_memory, streaming_tumble_agg
from datafusion_dist_spark.streaming.jobs import read_events_stream
from tests.conftest import SF_DIR
from tests.oracle_compare import assert_frames_match


def test_streaming_tumble_matches_batch(spark):
    stream = read_events_stream(spark, SF_DIR)
    agg = streaming_tumble_agg(stream, window="6 hours")
    run_stream_to_memory(agg, "stream_tumble", output_mode="complete")
    streamed = spark.sql("SELECT * FROM stream_tumble").toPandas()
    batch = events_window_tumble(spark, SF_DIR).toPandas()
    assert_frames_match(streamed, batch, "streaming_tumble_vs_batch")


def test_streaming_hopping_matches_batch(spark):
    from datafusion_dist_spark.queries.temporal import events_hopping
    from datafusion_dist_spark.streaming.jobs import streaming_hopping_agg

    stream = read_events_stream(spark, SF_DIR)
    run_stream_to_memory(
        streaming_hopping_agg(stream), "stream_hop", output_mode="complete"
    )
    streamed = spark.sql("SELECT * FROM stream_hop").toPandas()
    batch = events_hopping(spark, SF_DIR).toPandas()
    assert_frames_match(streamed, batch, "streaming_hopping_vs_batch")


def test_streaming_session_window_matches_batch(spark):
    """session_window over the stream == session_window over the same
    data as a batch DataFrame (complete mode, all data in one run)."""
    from datafusion_dist_spark.catalog import load_table
    from datafusion_dist_spark.streaming.jobs import session_window_agg

    stream = read_events_stream(spark, SF_DIR)
    run_stream_to_memory(
        session_window_agg(stream), "stream_sess", output_mode="complete"
    )
    streamed = spark.sql("SELECT * FROM stream_sess").toPandas()
    batch = session_window_agg(load_table(spark, SF_DIR, "events")).toPandas()
    assert_frames_match(streamed, batch, "streaming_session_vs_batch")


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with a watermark: rows arriving after
    the watermark passed their window are dropped, earlier finalized
    windows are emitted exactly once."""
    from pyspark.sql import functions as F

    import time

    src = tmp_path / "src"
    src.mkdir()

    def write_batch(rows, name):
        df = spark.createDataFrame(rows, "id long, ts_s string").select(
            "id", F.col("ts_s").cast("timestamp").alias("ts")
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(src / name))
        time.sleep(1.1)  # distinct mtimes → deterministic batch order

    # Batch 0 opens the [00:00, 01:00) window; batch 1 advances the
    # watermark past its end (10:00 - 1h = 09:00); batch 2 is the batch
    # in which that window is finalized+evicted (eviction happens in
    # the first batch that RUNS with the advanced watermark, not at the
    # moment the watermark advances); batch 3's 00:20 event then hits
    # evicted state and must be dropped as late.
    write_batch([(1, "2024-01-01 00:10:00")], "f1")
    write_batch([(2, "2024-01-01 10:00:00")], "f2")
    write_batch([(4, "2024-01-01 10:05:00")], "f3")
    write_batch([(3, "2024-01-01 00:20:00")], "f4")
    schema = "id long, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src / "*"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"), "n")
    )
    run_stream_to_memory(agg, "late_test", output_mode="append")
    rows = spark.sql("SELECT * FROM late_test").collect()
    early = [r for r in rows if r.ws == "2024-01-01 00:00:00"]
    # The 00:00 window was finalized with ONLY the on-time event; the
    # late id=3 event (00:20 after watermark 01:30) must not reopen it
    # — and finalized windows are emitted EXACTLY once (a duplicate
    # re-emission would be a second row, not a changed count).
    assert len(early) == 1, rows
    assert early[0].n == 1, rows


def test_stateful_sessions_match_batch_closed_sessions(spark):
    """applyInPandasWithState sessionization: emitted (closed) sessions
    equal the batch sessionization minus each user's final session."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from datafusion_dist_spark.catalog import load_table
    from datafusion_dist_spark.streaming.jobs import stateful_sessions

    stream_events = (
        read_events_stream(spark, SF_DIR)
        .filter(F.col("user_id") < 20)
        .select("user_id", "ts")
    )
    run_stream_to_memory(
        stateful_sessions(stream_events, gap_minutes=30),
        "stateful_sess",
        output_mode="append",
    )
    out = spark.sql("SELECT * FROM stateful_sess").toPandas()
    events = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id") < 20)
        .select("user_id", "ts")
    )

    w = Window.partitionBy("user_id").orderBy("ts")
    sess = (
        events.withColumn(
            "new_sess",
            (
                F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
                > 1800
            ).cast("int"),
        )
        .withColumn("sess_id", F.sum(F.coalesce("new_sess", F.lit(0))).over(w))
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    wlast = Window.partitionBy("user_id")
    closed_batch = (
        sess.withColumn("max_sess", F.max("sess_id").over(wlast))
        .filter(F.col("sess_id") < F.col("max_sess"))
        .select("user_id", "session_start", "session_end", "n_events")
        .toPandas()
    )
    assert_frames_match(out, closed_batch, "stateful_sessions_vs_batch")


def test_stream_stream_join_matches_batch(spark):
    """Stream-stream interval join (clicks x views per user) produces
    exactly the batch join's pairs when driven over the same files."""
    from datafusion_dist_spark.catalog import load_table
    from datafusion_dist_spark.streaming.jobs import (
        stream_stream_click_view_join,
    )
    from pyspark.sql import functions as F

    stream = read_events_stream(spark, SF_DIR)
    s_clicks = stream.filter(F.col("event_type") == "click")
    s_views = stream.filter(F.col("event_type") == "view")
    joined = stream_stream_click_view_join(s_clicks, s_views)
    run_stream_to_memory(joined, "stream_ssj", output_mode="append")
    streamed = spark.sql("SELECT * FROM stream_ssj").toPandas()

    batch = load_table(spark, SF_DIR, "events")
    b_clicks = batch.filter(F.col("event_type") == "click")
    b_views = batch.filter(F.col("event_type") == "view")
    expected = stream_stream_click_view_join(b_clicks, b_views).toPandas()
    assert len(expected) > 0
    assert_frames_match(streamed, expected, "stream_stream_join_vs_batch")


def test_streaming_dedup_matches_batch_distinct(spark):
    """dropDuplicatesWithinWatermark emits exactly one row per key:
    the emitted key set equals the batch DISTINCT key set (no key is
    emitted twice even across micro-batches)."""
    from datafusion_dist_spark.catalog import load_table
    from datafusion_dist_spark.streaming.jobs import streaming_dedup_keys

    stream = read_events_stream(spark, SF_DIR)
    run_stream_to_memory(
        streaming_dedup_keys(stream), "stream_dedup", output_mode="append"
    )
    streamed = spark.sql("SELECT * FROM stream_dedup").toPandas()
    expected = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_type")
        .distinct()
        .toPandas()
    )
    assert_frames_match(streamed, expected, "streaming_dedup_vs_distinct")


def test_foreach_batch_parquet_sink_complete(spark, tmp_path):
    """foreachBatch parquet sink: every source row lands exactly once
    (count + integer value checksum match the batch read) across
    GENUINELY multiple micro-batches — the source is split into 3
    files with maxFilesPerTrigger=1, so a sink that double-writes or
    drops rows after the first batch fails the checksum."""
    from datafusion_dist_spark.catalog import load_table
    from datafusion_dist_spark.streaming.jobs import (
        run_stream_foreach_batch_parquet,
    )
    from pyspark.sql import functions as F

    src_dir = str(tmp_path / "events_split")
    load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "value"
    ).repartition(3).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    out = str(tmp_path / "events_sink")
    run_stream_foreach_batch_parquet(stream, out)
    sunk = spark.read.parquet(out)
    checks = sunk.agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_c"),
        F.countDistinct("batch_id").alias("n_batches"),
    ).collect()[0]
    src = load_table(spark, SF_DIR, "events")
    src_checks = src.agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_c"),
    ).collect()[0]
    assert checks.n == src_checks.n
    assert checks.sum_c == src_checks.sum_c
    assert checks.n_batches >= 2, checks  # multi-batch path exercised


def test_stream_static_join_matches_batch(spark):
    from pyspark.sql import functions as F

    from datafusion_dist_spark.catalog import load_table
    from datafusion_dist_spark.streaming.jobs import stream_static_enrich_agg

    batch_events = load_table(spark, SF_DIR, "events")
    dim = (
        batch_events.select("user_id")
        .distinct()
        .withColumn("tier", F.col("user_id") % 3)
    )
    stream = read_events_stream(spark, SF_DIR)
    agg = stream_static_enrich_agg(stream, dim)
    run_stream_to_memory(agg, "stream_static_enrich", output_mode="complete")
    streamed = spark.sql("SELECT * FROM stream_static_enrich").toPandas()
    expect = (
        batch_events.join(F.broadcast(dim), "user_id")
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_c"
            ),
        )
        .toPandas()
    )
    assert_frames_match(streamed, expect, "stream_static_vs_batch")


def test_transform_with_state_running_totals_match_batch(spark):
    """transformWithStateInPandas (Spark 4 arbitrary state): after the
    stream drains, each user's ValueState-carried running totals must
    equal the batch groupBy — integer cents end-to-end, so equality
    is exact. Mirrors the reference's stateful-runtime behaviors the
    way stateful_sessions does for applyInPandasWithState.

    The operator's state-server protocol needs google.protobuf, which
    this container does not ship (no installs per the build
    contract) — skip there; the job builder itself is plain PySpark
    and runs wherever protobuf exists."""
    pytest.importorskip("google.protobuf.descriptor")
    from datafusion_dist_spark.streaming.jobs import (
        read_events_stream,
        run_stream_to_memory,
        running_user_totals_tws,
    )
    from datafusion_dist_spark.catalog import load_table

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = running_user_totals_tws(read_events_stream(spark, SF_DIR))
        run_stream_to_memory(out, "tws_totals", output_mode="update")
        got = (
            spark.table("tws_totals")
            .groupBy("user_id")
            .agg(F.max_by("n", "n").alias("n"), F.max_by("sum_value_c", "n").alias("sum_value_c"))
            .toPandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        exp = (
            load_table(spark, SF_DIR, "events")
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                    "sum_value_c"
                ),
            )
            .toPandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert got["user_id"].tolist() == exp["user_id"].tolist()
        assert got["n"].tolist() == exp["n"].tolist()
        assert got["sum_value_c"].tolist() == exp["sum_value_c"].tolist()
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_incremental_dedup_over_arrow_dir(spark, tmp_path):
    """End-to-end incremental-ingest dedup: documents land in the
    Arrow-dir format in two commits; a stream ingests each commit as a
    microbatch and foreachBatch runs the minhash cross-set dedup of
    JUST that batch against the static index — the streaming twin of
    dedup_incremental (nightly crawl → continuous crawl). Every
    planted near-dup must be flagged in the batch it arrived in, and
    nothing is ever compared index-to-index or batch-to-batch."""
    from pyspark.sql import functions as F

    from datafusion_dist_spark.catalog import load_table
    from datafusion_dist_spark.operators import dedup
    from datafusion_dist_spark.sources.python_ds import register_sources
    from tests.conftest import SF_DIR

    register_sources(spark)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    index = docs.filter(F.col("doc_id") < 40)
    out = str(tmp_path / "crawl")
    ckpt = str(tmp_path / "ckpt")

    # Two crawl drops: each plants copies of some index docs.
    drop1 = index.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"), "text"
    )
    drop2 = index.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 600000).alias("doc_id"), "text"
    )

    flagged_per_batch: dict = {}

    def dedup_batch(batch_df, batch_id):
        pairs = dedup.minhash_dedup_pairs(
            index.unionByName(batch_df), threshold=0.5, split_id=40
        ).collect()
        flagged_per_batch[batch_id] = {r.b_id for r in pairs}

    def run():
        q = (
            spark.readStream.format("ddspark_arrow_dir")
            .option("path", out)
            .load()
            .writeStream.foreachBatch(dedup_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drop1.coalesce(1).write.format("ddspark_arrow_dir").option(
        "path", out
    ).mode("append").save()
    run()
    drop2.coalesce(1).write.format("ddspark_arrow_dir").option(
        "path", out
    ).mode("append").save()
    run()

    all_flagged = set().union(*flagged_per_batch.values())
    for r in drop1.collect():
        assert r.doc_id in all_flagged, f"drop1 plant {r.doc_id} missed"
    for r in drop2.collect():
        assert r.doc_id in all_flagged, f"drop2 plant {r.doc_id} missed"
    # The second run's batches contain only drop2 ids (checkpointed
    # offsets: drop1's file is never re-ingested).
    late_ids = set().union(
        *(v for k, v in flagged_per_batch.items() if k > 0)
    ) if len(flagged_per_batch) > 1 else set()
    assert all(i >= 600000 for i in late_ids), late_ids


def test_streaming_dedup_replay_out_of_order_matches_batch(spark, tmp_path):
    """Late/out-of-order delivery must not change dedup state: the same
    two crawl drops streamed in-order and REVERSED (the late-batch
    replay) accumulate the identical flagged-pair set, and both equal
    the one-shot batch oracle over index ∪ all drops. Holds by
    construction — each drop dedupes only against the static prebuilt
    index, never batch-to-batch — and this pins that construction:
    an operator change that introduced cross-batch state (or a
    non-deterministic index read) would fork the replay hash."""
    from pyspark.sql import functions as F

    from datafusion_dist_spark.catalog import load_table
    from datafusion_dist_spark.operators import dedup
    from datafusion_dist_spark.sources.python_ds import register_sources
    from tests.conftest import SF_DIR

    register_sources(spark)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    index = docs.filter(F.col("doc_id") < 40)
    index_path = str(tmp_path / "mh-index")
    dedup.minhash_index_build(index, index_path)

    drops = [
        index.filter(F.col("doc_id") % 9 == 0).select(
            (F.col("doc_id") + 300000).alias("doc_id"), "text"
        ),
        index.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 600000).alias("doc_id"), "text"
        ),
    ]

    def run_stream(order, tag):
        out = str(tmp_path / f"crawl-{tag}")
        ckpt = str(tmp_path / f"ckpt-{tag}")
        state: set = set()

        def dedup_batch(batch_df, batch_id):
            rows = dedup.minhash_dedup_pairs_prebuilt(
                spark, index_path, batch_df, split_id=300000, threshold=0.5
            ).collect()
            state.update((r.a_id, r.b_id, r.est_jaccard) for r in rows)

        for i in order:
            drops[i].coalesce(1).write.format("ddspark_arrow_dir").option(
                "path", out
            ).mode("append").save()
            q = (
                spark.readStream.format("ddspark_arrow_dir")
                .option("path", out)
                .load()
                .writeStream.foreachBatch(dedup_batch)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
        return state

    in_order = run_stream([0, 1], "fwd")
    replayed = run_stream([1, 0], "rev")
    assert in_order, "no pairs flagged"
    assert replayed == in_order, "replay order changed dedup state"

    # One-shot batch oracle: the whole crawl in a single pass.
    batch_all = {
        (r.a_id, r.b_id, r.est_jaccard)
        for r in dedup.minhash_dedup_pairs(
            index.unionByName(drops[0]).unionByName(drops[1]),
            threshold=0.5,
            split_id=300000,
        ).collect()
    }
    assert in_order == batch_all, "streamed state != batch oracle"


def test_streaming_countmin_grid_matches_batch(spark):
    """The streaming CMS grid after consuming the whole stream must be
    bit-identical to the batch grid — and its state is constant-size
    (<= depth*width rows) however long the stream runs."""
    from datafusion_dist_spark.catalog import load_table
    from datafusion_dist_spark.operators import sketch
    from datafusion_dist_spark.streaming import jobs

    stream = jobs.read_events_stream(spark, SF_DIR)
    jobs.run_stream_to_memory(
        jobs.streaming_countmin_cells(stream), "cms_stream"
    )
    got = {
        (r["h"], r["b"]): r["cnt"] for r in spark.table("cms_stream").collect()
    }
    ev = load_table(spark, SF_DIR, "events").select("user_id")
    want = {
        (r["h"], r["b"]): r["cnt"]
        for r in sketch.countmin_cells(ev, "user_id").collect()
    }
    assert got == want
    assert len(got) <= 3 * 256


def test_streaming_hll_registers_match_batch(spark):
    """The streaming HLL register table after consuming the whole
    stream must be bit-identical to the batch registers — and its
    state is constant-size (<= 2^p rows) however long the stream runs
    (max is monotone, so replay/late data cannot corrupt it)."""
    from datafusion_dist_spark.catalog import load_table
    from datafusion_dist_spark.operators import sketch
    from datafusion_dist_spark.streaming import jobs

    stream = jobs.read_events_stream(spark, SF_DIR)
    jobs.run_stream_to_memory(
        jobs.streaming_hll_registers(stream), "hll_stream"
    )
    got = {
        r["register"]: r["max_rho"]
        for r in spark.table("hll_stream").collect()
    }
    ev = load_table(spark, SF_DIR, "events").select("user_id")
    want = {
        r["register"]: r["max_rho"]
        for r in sketch.hll_registers(ev, "user_id").collect()
    }
    assert got == want
    assert len(got) <= 1 << sketch.HLL_P
