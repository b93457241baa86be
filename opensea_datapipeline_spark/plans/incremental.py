"""Incremental maintenance of gold tables — process only the new batch,
merge into existing aggregates/facts instead of recomputing the world.

At 100 TB the daily pipeline cannot re-aggregate all history per run;
the combinable-statistics pattern makes the gold table a running merge:

- count/sum/min/max merge exactly (associative monoids);
- exact countDistinct does NOT merge — the incremental path either keeps
  it per-partition-key (new days never collide with old days, as here),
  or switches to a mergeable HLL sketch (documented deviation).

``upsert_by_key`` is the MERGE-less upsert for plain parquet: anti-join
the old table against the update keys, union the updates, write a new
version (VersionedOutputStore) — atomic at the directory-swap level.

Literature: the mergeable-summary framing is Agarwal et al., "Mergeable
summaries" (PODS 2012); the distinct sketch is HyperLogLog (Flajolet et
al., AofA 2007) via Spark's Apache DataSketches binding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_daily_stats(existing: DataFrame, new_daily: DataFrame) -> DataFrame:
    """Merge a new batch's daily aggregate into the existing daily table.

    Both sides carry the combinable columns (total_transactions,
    volume_total, value_min, value_max) keyed by event_date. Overlapping
    dates merge by monoid ops; disjoint dates pass through. One
    shuffle on the date key, sized by the number of *distinct dates*,
    not rows.
    """
    combined = existing.unionByName(new_daily)
    return combined.groupBy("event_date").agg(
        F.sum("total_transactions").cast("long").alias("total_transactions"),
        F.sum("volume_total").alias("volume_total"),
        F.min("value_min").alias("value_min"),
        F.max("value_max").alias("value_max"),
    )


def daily_stats_combinable(events: DataFrame) -> DataFrame:
    """The combinable per-day aggregate of an events batch (the mergeable
    subset of operators.aggregates.daily_stats)."""
    return events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("event_date")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("total_transactions"),
        F.sum("value").alias("volume_total"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )


def upsert_by_key(
    existing: DataFrame, updates: DataFrame, key_cols: list[str]
) -> DataFrame:
    """MERGE-less upsert: rows in ``updates`` replace same-key rows in
    ``existing``; all other existing rows survive. left_anti + union —
    two narrow shuffles on the key, no row comparisons.

    Write the result through VersionedOutputStore for the directory-swap
    commit; plain parquet has no transactional MERGE (that is the gap a
    table format like Delta/Iceberg fills — noted, not silently faked).
    """
    survivors = existing.join(
        updates.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    )
    return survivors.unionByName(updates)


def daily_uniques_sketch(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Per-day HLL sketch of distinct users — the mergeable form of
    unique_users. The sketch column is opaque binary state; unlike exact
    countDistinct it merges across batches (hll_union_agg), which is what
    makes incremental distinct maintenance possible at all."""
    return events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("event_date")
    ).agg(F.hll_sketch_agg(user_col).alias("users_sketch"))


def rolling_uniques_from_sketches(
    daily: DataFrame,
    window_days: int = 7,
    date_col: str = "event_date",
    sketch_col: str = "users_sketch",
) -> DataFrame:
    """Rolling distinct users from PERSISTED per-day HLL sketches — the
    100 TB form of rolling WAU: the raw fact table is scanned once (at
    sketch build / incremental merge time); every trailing-window
    distinct after that merges #window_days tiny sketches per day
    instead of re-scanning events. Each day's sketch EXPLODES into the
    ≤window_days later window-end days it contributes to (same linear
    contributing-days trick as the exact path, but over one row per DAY,
    not per (day, user)), then one ``hll_union_agg`` per window day.
    A semi-join against observed days drops window ends beyond the data.
    """
    d = F.to_date(date_col)
    days = daily.select(d.alias("wd")).distinct()
    contrib = daily.select(
        F.explode(
            F.sequence(d, F.date_add(d, window_days - 1))
        ).alias("wd"),
        sketch_col,
    )
    return (
        contrib.join(days, "wd", "left_semi")
        .groupBy("wd")
        .agg(F.hll_union_agg(sketch_col).alias("window_sketch"))
        .select(
            F.date_format("wd", "yyyy-MM-dd").alias(date_col),
            F.hll_sketch_estimate("window_sketch").cast("long").alias(
                "approx_window_users"
            ),
        )
    )


def merge_daily_uniques(existing: DataFrame, new_batch: DataFrame) -> DataFrame:
    """Merge per-day sketches from a new batch into the existing table and
    surface the estimated distinct count. Same-day sketches union
    losslessly (HLL union is idempotent for re-seen users — unlike the
    additive count merge, re-ingesting a user does not inflate it)."""
    combined = existing.unionByName(new_batch)
    return combined.groupBy("event_date").agg(
        F.hll_union_agg("users_sketch").alias("users_sketch")
    ).select(
        "event_date",
        F.hll_sketch_estimate("users_sketch").cast("long").alias("approx_unique_users"),
        "users_sketch",
    )
