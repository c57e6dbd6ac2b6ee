"""Structured Streaming twins: the streaming tumble agg must produce
exactly the batch query's result when driven over the same files."""

from __future__ import annotations

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
