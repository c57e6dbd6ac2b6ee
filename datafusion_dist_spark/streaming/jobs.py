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
    # Under nanosAsLong (see catalog.pin_session_confs) ts arrives as
    # raw nanos — convert exactly like the batch path does.
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


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
