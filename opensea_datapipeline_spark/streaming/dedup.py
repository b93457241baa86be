"""Streaming deduplication — stateful exact dedup over an event stream.

The batch engine dedups with a hash-groupBy (`operators/dedup.py`); on a
stream the same semantics need STATE: a key seen in micro-batch 3 must
suppress its duplicate arriving in micro-batch 7. Spark's stateful
``dropDuplicates`` keeps the seen-key set in the state store, giving
exactly the batch answer over any micro-batch slicing of the input —
that is what the parity test asserts by splitting the corpus into
multiple files and forcing one file per trigger.

State sizing is the scale question: an unbounded seen-key set grows with
corpus cardinality. Two honest modes:

- ``watermark=None`` — global dedup, state = one entry per distinct key
  (the md5 digest, ~16 bytes + overhead). Right for bounded key domains
  or backfill (AvailableNow) runs.
- ``watermark="<delay>"`` — ``dropDuplicatesWithinWatermark``: duplicates
  only suppressed within the watermark horizon, state is evicted as event
  time advances. Right for endless streams where re-emission after N days
  is acceptable (or the downstream batch dedup catches stragglers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import ensure_reader_confs, normalize_event_time


def streaming_dedup_df(
    stream: DataFrame,
    key_cols: list[str],
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Add a ``dedup_key`` digest of ``key_cols`` and drop duplicate keys
    statefully. With a watermark, state is bounded by the horizon;
    without, it grows with distinct keys (see module docstring)."""
    keyed = stream.withColumn(
        "dedup_key", F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols]))
    )
    if watermark is None:
        return keyed.dropDuplicates(["dedup_key"])
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["dedup_key"]
    )


def run_streaming_dedup(
    spark: SparkSession,
    src_dir: str,
    key_cols: list[str],
    table_name: str = "streaming_dedup",
    watermark: str | None = None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Stream ``src_dir`` (AvailableNow, one file per trigger) through
    stateful dedup into a memory sink; returns the deduplicated table.
    Multiple micro-batches exercise the cross-batch state path."""
    ensure_reader_confs(spark)
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    stream = normalize_event_time(stream)
    result = streaming_dedup_df(stream, key_cols, watermark=watermark)
    query = (
        result.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table_name)
