"""Join operators (SURVEY.md §2.3, J1-J9).

Equi-joins are plain ``df.join`` — Catalyst picks broadcast-hash vs
sort-merge from statistics, and AQE re-plans at runtime. The interesting
operators here are the ones the reference implements as Python row loops:

- J6 interval join (regime labeling) — small interval table broadcast,
  non-equi conjuncts evaluated on the stream side;
- J7 range/as-of self-join (peer window aggregates) — keeps an equi
  conjunct so Catalyst uses a hash/sort-merge join with a range residual,
  never a broadcast-nested-loop over the fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .aggregates import det_mean


def semi_join_keys(
    df: DataFrame, keys_df: DataFrame, on: str | Sequence[str]
) -> DataFrame:
    """J5: key-set intersection as a left-semi join
    (`prepare_visual_market_data.py:98-125` does Python ``set &`` + is_in;
    left-semi is the distributed equivalent — no row duplication, the right
    side reduced to distinct keys)."""
    on = [on] if isinstance(on, str) else list(on)
    return df.join(keys_df.select(*on).distinct(), on=on, how="left_semi")


def broadcast_lookup(
    df: DataFrame, dim: DataFrame, on: str | Sequence[str], how: str = "left"
) -> DataFrame:
    """J6 (equi form): small-dimension lookup as an explicit broadcast join
    (replaces the reference's dict + ``map_elements``,
    `prepare_visual_market_data.py:260-277`). Broadcasting pins the plan to
    a map-side hash join — zero shuffle of the fact table."""
    on = [on] if isinstance(on, str) else list(on)
    return df.join(F.broadcast(dim), on=on, how=how)


def interval_join(
    fact: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    how: str = "left",
) -> DataFrame:
    """J6 (interval form): label fact rows by containing interval
    (`prepare_visual_market_data.py:197-246`: date-range regime labels
    applied via pandas ``.apply``).

    The interval table is tiny (5 regimes in the reference) → broadcast
    nested-loop is the *correct* physical plan: each fact partition scans
    the broadcast intervals; no shuffle of the fact side.
    """
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    return fact.join(F.broadcast(intervals), on=cond, how=how)


def range_self_join_aggregate(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    window_seconds: int,
    agg_aliases: dict[str, str] | None = None,
) -> DataFrame:
    """J7+A12: trailing-window peer aggregate — for each row, aggregate the
    *same entity's* earlier rows within ``window_seconds``.

    The reference does this as a per-row pandas loop
    (`analyze_peer_effects.py:140-185`); here it is a self-join with an
    equi conjunct on the entity key plus a range residual:

        a ⨝ b  ON  a.entity = b.entity  AND a.probe_bucket = b.bucket
               AND b.ts >= a.ts - window AND b.ts < a.ts

    Two scale levers (SURVEY.md §7.3 trap 9):

    1. The entity equi conjunct → shuffled hash / sort-merge join, never a
       broadcast-nested-loop over the fact table.
    2. **Time bucketing**: each side gets a coarse bucket key
       ``floor(epoch/window)``; the probe side is exploded to its two
       candidate buckets (a trailing window of length w can only reach
       buckets ``b`` and ``b-1``). The bucket joins the equi key set, so
       per-join-key fan-out is bounded by 2× the rows per (entity, window)
       — a hot entity with a year of events no longer produces a
       year×year intermediate. Skew beyond that is AQE-split.

    Output: one row per left row (rows with no peers get zero-count), with
    peer_count / peer_mean / peer_max / peer_sum over the window.
    """
    bucket = (F.unix_timestamp(F.col(ts_col)) / window_seconds).cast("long")
    a = (
        df.withColumn("_probe_bucket", F.explode(F.array(bucket, bucket - 1)))
        .alias("a")
    )
    b = df.withColumn("_bucket", bucket).alias("b")
    cond = (
        (F.col(f"a.{entity_col}") == F.col(f"b.{entity_col}"))
        & (F.col("a._probe_bucket") == F.col("b._bucket"))
        & (
            F.col(f"b.{ts_col}")
            >= F.col(f"a.{ts_col}") - F.expr(f"INTERVAL {window_seconds} SECONDS")
        )
        & (F.col(f"b.{ts_col}") < F.col(f"a.{ts_col}"))
    )
    joined = a.join(b, on=cond, how="left")
    out = joined.groupBy(
        F.col(f"a.{id_col}").alias(id_col),
        F.col(f"a.{entity_col}").alias(entity_col),
        F.col(f"a.{ts_col}").alias(ts_col),
        F.col(f"a.{value_col}").alias(value_col),
    ).agg(
        F.count(F.col(f"b.{id_col}")).alias("peer_count"),
        det_mean(F.col(f"b.{value_col}")).alias("peer_mean"),
        F.max(F.col(f"b.{value_col}")).alias("peer_max"),
        F.sum(F.col(f"b.{value_col}")).alias("peer_sum"),
    )
    return out


def neighbor_window_aggregate(
    sales: DataFrame,
    neighbors: DataFrame,
    token_col: str,
    neighbor_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    window_seconds: int,
) -> DataFrame:
    """J7 full form: peer-effect window aggregates over a KNN neighbor map
    (`analyze_peer_effects.py:128-237`): for each sale of token t, aggregate
    sales of t's *neighbors* in the trailing window.

    neighbors: (token_col, neighbor_col) exploded pairs — the distributed
    form of the reference's ``token_id → {neighbor_ids}`` JSON dict.

    Plan shape: fact ⨝ neighbors (equi, neighbor map is small → broadcast)
    then ⨝ fact again (equi on neighbor id AND coarse time bucket + range
    residual). Two hash joins, no nested loop; the bucket conjunct bounds
    per-key fan-out exactly as in range_self_join_aggregate (a trailing
    window of length w only reaches buckets b and b-1), so a hot
    neighbor's full history never materializes per probe row.
    """
    bucket = lambda side: (
        F.unix_timestamp(F.col(f"{side}.{ts_col}")) / window_seconds
    ).cast("long")
    a = sales.alias("a")
    n = neighbors.alias("n")
    b = sales.withColumn(
        "_bucket",
        (F.unix_timestamp(F.col(ts_col)) / window_seconds).cast("long"),
    ).alias("b")
    probed = (
        a.join(
            F.broadcast(n),
            on=F.col(f"a.{token_col}") == F.col(f"n.{token_col}"),
            how="inner",
        )
        .withColumn(
            "_probe_bucket", F.explode(F.array(bucket("a"), bucket("a") - 1))
        )
    )
    joined = probed.join(
        b,
        on=(
            (F.col(f"n.{neighbor_col}") == F.col(f"b.{token_col}"))
            & (F.col("_probe_bucket") == F.col("b._bucket"))
            & (
                F.col(f"b.{ts_col}")
                >= F.col(f"a.{ts_col}") - F.expr(f"INTERVAL {window_seconds} SECONDS")
            )
            & (F.col(f"b.{ts_col}") < F.col(f"a.{ts_col}"))
        ),
        how="inner",
    )
    return joined.groupBy(
        F.col(f"a.{id_col}").alias(id_col),
        F.col(f"a.{token_col}").alias(token_col),
        F.col(f"a.{ts_col}").alias(ts_col),
    ).agg(
        F.count(F.col(f"b.{id_col}")).alias("peer_sales"),
        det_mean(F.col(f"b.{value_col}")).alias("peer_mean_price"),
        F.median(F.col(f"b.{value_col}")).alias("peer_median_price"),
        F.max(F.col(f"b.{value_col}")).alias("peer_max_price"),
        F.countDistinct(F.col(f"b.{token_col}")).alias("peer_tokens"),
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    right_id_col: str,
) -> DataFrame:
    """As-of join (backward, inclusive): each left row picks the most
    recent right row with ``right.ts <= left.ts`` on the same key.

    Spark has no ASOF JOIN operator (DuckDB/kdb do); a naive theta join
    explodes quadratically per key. This is the scalable composition:
    union both sides tagged, ONE shuffle+sort per key, and a running
    ``last_value(..., ignoreNulls)`` window carries the latest right-side
    values forward onto left rows. O(n log n) per key, no row explosion —
    the same merge-scan shape a native as-of join would execute.
    """
    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col(right_id_col).alias("_rid"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_rid", F.lit(None).cast(r.schema["_rid"].dataType)
    )
    for c in value_cols:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(r.schema[f"_r_{c}"].dataType))
    combined = l.unionByName(r, allowMissingColumns=True)
    # rights sort before lefts at equal ts (_side 0 < 1) → inclusive match;
    # _rid breaks ties between simultaneous right rows deterministically.
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_side", "_rid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = combined
    for c in value_cols:
        carried = carried.withColumn(
            f"asof_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    carried = carried.withColumn(
        "asof_ts_epoch",
        F.when(
            F.last("_rid", ignorenulls=True).over(w).isNotNull(),
            F.unix_timestamp(
                F.max(F.when(F.col("_side") == 0, F.col(ts_col))).over(w)
            ),
        ).cast("long"),
    )
    drop = ["_side", "_rid"] + [f"_r_{c}" for c in value_cols]
    return carried.filter(F.col("_side") == 1).drop(*drop)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resilient equi-join: salt the big side's hot keys across
    ``n_salts`` buckets and replicate the small side once per salt, so a
    single hot key's rows spread over ``n_salts`` reducers instead of one.

    AQE's skew-join splitting (enabled in session defaults) handles most
    cases at runtime; explicit salting is the plan-level tool for joins
    AQE can't split (e.g. when the skewed side is the build side of a
    shuffled hash join, or under a fixed partitioning contract). The salt
    is a deterministic per-row hash — which bucket a row lands in doesn't
    affect results, only balance.
    """
    salt_values = list(range(n_salts))
    big_s = big.withColumn(
        "_salt", F.pmod(F.abs(F.hash(*[F.col(c) for c in big.columns])), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in salt_values]))
    )
    out = big_s.join(small_s, on=[key_col, "_salt"], how=how)
    return out.drop("_salt")
