"""Structured Streaming twins of the temporal batch operators.

The reference is bounded-only ("streaming" = pipelined delivery,
SURVEY §1.4); these are engine extensions: the same logical plans as
``queries/temporal.py`` run as unbounded streams with event-time
watermarks. Local tests drive them with a file source over the
testdata parquet + a memory sink (`processAllAvailable` makes the run
synchronous and deterministic).
"""

from datafusion_dist_spark.streaming.jobs import (
    run_stream_to_memory,
    streaming_tumble_agg,
)

__all__ = ["run_stream_to_memory", "streaming_tumble_agg"]
