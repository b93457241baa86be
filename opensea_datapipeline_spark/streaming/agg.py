"""Structured Streaming variant of the daily-stats aggregation
(SURVEY.md §2.9 / §7.2 step 9).

The reference is batch-only, but its data model is an append-only event
log with event-time — stream-shaped. This module exposes the flagship
daily aggregate as a watermarked tumbling-window streaming query; with
``Trigger.AvailableNow`` over a static directory it produces exactly the
batch answer, which is how the oracle-parity path runs it.

At scale this runs against a file/Kafka source with the same plan:
watermark bounds state, the window aggregate is an incremental stateful
operator, late rows beyond the watermark are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import ensure_reader_confs, normalize_event_time


def streaming_daily_stats_df(stream: DataFrame, watermark: str = "1 day") -> DataFrame:
    """The streaming plan: event-time watermark + 1-day tumbling window +
    the daily aggregate (count / distinct-ish users / value stats).

    ``approx_count_distinct`` replaces exact countDistinct — exact distinct
    is not supported in streaming aggregations (documented deviation; the
    batch path keeps exact counts).
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("total_transactions"),
            F.approx_count_distinct("user_id").alias("approx_unique_users"),
            F.sum("value").alias("volume_total"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("event_date"),
            "total_transactions",
            "approx_unique_users",
            "volume_total",
            "value_min",
            "value_max",
        )
    )


def run_streaming_daily_stats(
    spark: SparkSession,
    events_path: str,
    schema_source_path: str | None = None,
    table_name: str = "streaming_daily_stats",
) -> DataFrame:
    """Run the streaming daily-stats query over a parquet directory with
    AvailableNow (process-everything-then-stop), complete-mode memory sink.
    Returns the final result table — deterministic over static input, so
    it is oracle-comparable (modulo the approx distinct column).

    ``maxFilesPerTrigger``-style chunking is left to the source defaults;
    with AvailableNow Spark splits the backlog into micro-batches itself.
    """
    import os
    import tempfile

    ensure_reader_confs(spark)
    schema = spark.read.parquet(schema_source_path or events_path).schema
    if os.path.isfile(events_path):
        # The file-stream source requires a directory; expose a single
        # parquet file through a symlink dir (testdata is read-only).
        stream_dir = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(events_path, os.path.join(stream_dir, os.path.basename(events_path)))
        events_path = stream_dir
    stream = spark.readStream.schema(schema).parquet(events_path)
    # testdata ts is INT64(ns) → read as long, truncate to µs timestamps
    stream = normalize_event_time(stream)
    result = streaming_daily_stats_df(stream)
    query = (
        result.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table_name)


def run_streaming_to_parquet(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "0 seconds",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming daily stats → parquet file sink with checkpointing.

    Append mode: a day's row is written exactly once, when the watermark
    passes the window end — the exactly-once file-sink contract that makes
    the aggregate restartable mid-backlog (checkpoint stores source
    offsets + operator state; rerunning with the same checkpoint resumes
    instead of recomputing).
    """
    ensure_reader_confs(spark)
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    stream = normalize_event_time(stream)
    result = streaming_daily_stats_df(stream, watermark=watermark)
    query = (
        result.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(out_dir)
