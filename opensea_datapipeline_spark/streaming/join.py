"""Watermarked stream-stream interval join (SURVEY.md §2.9 stretch —
the reference is batch-only; this is the standard Structured Streaming
pattern its event log is shaped for and the one stateful-join form the
streaming family did not yet cover).

Click→purchase attribution: every purchase joins every click by the
same user in the trailing ``lookback`` window. Both sides carry
event-time watermarks, so the join state is BOUNDED: Spark keeps click
rows only until the purchase-side watermark passes beyond their
join-window reach, then evicts them — the property that makes a
stream-stream join runnable forever at 100 TB/day, vs an unbounded
cache of the click stream. With ``Trigger.AvailableNow`` over a static
directory the result equals the batch inner join, which is how the
oracle-parity path grades it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import ensure_reader_confs, normalize_event_time


def streaming_click_attribution_df(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """The streaming plan: watermark both sides, inner equi-join on user
    plus an event-time interval predicate.

    The interval predicate (click_ts ∈ [purchase_ts − lookback,
    purchase_ts]) is what lets Spark derive a state eviction bound for
    BOTH sides from the two watermarks; without it the click state would
    grow forever. Inner-join rows emit as soon as both inputs arrive —
    the watermark governs state cleanup, not result completeness.

    Batch-equivalence caveat: AvailableNow over static input yields
    exactly the batch answer when everything lands in a single
    micro-batch, or when input arrives roughly time-ordered within the
    watermark delay. With multiple micro-batches and event times out of
    order by more than ``watermark``, below-watermark rows are dropped
    on arrival and their matches are silently lost vs the batch oracle —
    multi-batch replays of unordered logs must widen ``watermark`` to
    cover the data span (see ``run_streaming_click_attribution``).
    """
    c = (
        clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")
        ),
        "inner",
    )
    return joined.select(
        F.col("purchase_id"),
        F.col("click_id"),
        F.col("p_user").alias("user_id"),
        (
            F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
        ).alias("gap_us"),
        F.col("purchase_value"),
    )


def run_streaming_click_attribution(
    spark: SparkSession,
    events_path: str,
    lookback: str = "1 hour",
    table_name: str = "streaming_click_attribution",
    max_files_per_trigger: int | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Run the attribution join over a parquet events directory with
    AvailableNow and a memory sink (append mode — the only output mode a
    stream-stream inner join supports). Returns the result table;
    deterministic over static input, so oracle-comparable.

    ``max_files_per_trigger`` splits the replay into one micro-batch per
    N files, genuinely exercising cross-trigger join-state retention.
    Unordered multi-file input then needs ``watermark`` ≥ the event-time
    span, or below-watermark rows in later batches are dropped (see the
    caveat on ``streaming_click_attribution_df``)."""
    import os
    import tempfile

    ensure_reader_confs(spark)
    schema = spark.read.parquet(events_path).schema
    if os.path.isfile(events_path):
        stream_dir = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(
            events_path, os.path.join(stream_dir, os.path.basename(events_path))
        )
        events_path = stream_dir
    # two independent file-stream scans of the same log — the standard
    # shape when both sides come from one firehose topic
    def side(event_type: str) -> DataFrame:
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        s = reader.parquet(events_path)
        s = normalize_event_time(s)
        return s.filter(F.col("event_type") == event_type)

    result = streaming_click_attribution_df(
        side("click"), side("purchase"), lookback=lookback, watermark=watermark
    )
    query = (
        result.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table_name)
