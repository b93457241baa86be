"""Stateful streaming sessionization — ``session_window`` + watermark.

The batch twin is ``operators.windows.sessionize`` (gap-cumsum); here the
engine's native stateful operator maintains open sessions in state,
merges events that arrive within the gap, and emits a session only once
the watermark passes its close (append mode). State is bounded by the
watermark horizon — the property that makes sessionization run
indefinitely on an unbounded stream.

Append-mode emission semantics matter for testing: a session is emitted
only after a *later* micro-batch advances the watermark past
session_end + gap. Over a static backlog this means the final batch's
still-open sessions stay in state; the test feeds the backlog as
multiple files (maxFilesPerTrigger=1) and asserts the emitted prefix
matches the batch computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import ensure_reader_confs, normalize_event_time


def streaming_sessions_df(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
    key_col: str = "user_id",
) -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def run_streaming_sessions(
    spark: SparkSession,
    events_dir: str,
    gap: str = "30 minutes",
    table_name: str = "streaming_sessions",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Run sessionization over a parquet directory, one file per
    micro-batch, append mode. Returns the emitted (finalized) sessions."""
    ensure_reader_confs(spark)
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    stream = normalize_event_time(stream)
    result = streaming_sessions_df(stream, gap=gap)
    query = (
        result.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table_name)
