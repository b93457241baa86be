"""Window-function operators (SURVEY.md §2.5, W1-W8).

The reference computes these with Polars ``shift().over()`` / pandas
``.rolling()`` on in-memory frames; here they are Spark window functions.
Scale note: every window below is partitioned by an entity key except the
global time-series frames (rolling mean over a *daily aggregate* series) —
those operate on already-reduced data (one row per day), so a single-task
window is fine even at 100 TB of raw input. Never put an unpartitioned
window over raw fact rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _series_window(partition_cols: Sequence[str] | None, global_ok: bool):
    """Window base for the time-series helpers below.

    An unpartitioned window serializes the whole input through one task, so
    it must be an explicit opt-in (``global_ok=True``), only for inputs
    already reduced to a small series (e.g. one row per day). Default args
    can never reach ``Window.partitionBy()``.
    """
    if partition_cols:
        return Window.partitionBy(*partition_cols)
    if not global_ok:
        raise ValueError(
            "unpartitioned window over a potentially unreduced input: pass "
            "partition_cols, or global_ok=True if the input is already "
            "reduced to a small series (e.g. daily aggregates)"
        )
    return Window.partitionBy()


def lead_gap(
    df: DataFrame,
    partition_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """W1+W2: next-event time per entity and the gap in days
    (`analyze_peer_effects.py:110-121`: ``shift(-1).over(token)`` after sort,
    then ``total_seconds()/86400``).

    ``tiebreak_col`` makes the ordering total — required for deterministic,
    oracle-stable output when timestamps collide.
    """
    w = Window.partitionBy(partition_col).orderBy(ts_col, tiebreak_col)
    nxt = F.lead(ts_col).over(w)
    return (
        df.withColumn("next_ts", nxt)
        .withColumn(
            "gap_seconds",
            F.unix_timestamp("next_ts") - F.unix_timestamp(ts_col),
        )
        .withColumn("gap_days", F.col("gap_seconds") / F.lit(86400.0))
    )


def rolling_mean(
    df: DataFrame,
    order_col: str,
    value_col: str,
    window_rows: int = 7,
    min_periods: int = 1,
    partition_cols: Sequence[str] | None = None,
    out_col: str | None = None,
    global_ok: bool = False,
) -> DataFrame:
    """W3/W4: trailing N-row rolling mean (`aggregate.py:303-307`;
    pandas ``rolling(n, min_periods=1)`` in
    `advanced_timeseries_analysis.py:135-137`).

    ``min_periods=1`` (pandas default in the reference's later scripts) is
    Spark's natural behavior; ``min_periods=window_rows`` reproduces Polars'
    null-for-first-rows behavior (`aggregate.py:303-307`) by masking on a
    row counter.
    """
    out_col = out_col or f"{value_col}_rolling_mean_{window_rows}"
    base = _series_window(partition_cols, global_ok)
    w = base.orderBy(order_col).rowsBetween(-(window_rows - 1), 0)
    df = df.withColumn(out_col, F.avg(value_col).over(w))
    if min_periods > 1:
        wc = base.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
        df = df.withColumn(
            out_col,
            F.when(F.count(F.lit(1)).over(wc) >= min_periods, F.col(out_col)),
        )
    return df


def rolling_std(
    df: DataFrame,
    order_col: str,
    value_col: str,
    window_rows: int = 7,
    partition_cols: Sequence[str] | None = None,
    out_col: str | None = None,
    global_ok: bool = False,
) -> DataFrame:
    """W4: trailing rolling sample std (`advanced_timeseries_analysis.py:
    155-156`)."""
    out_col = out_col or f"{value_col}_rolling_std_{window_rows}"
    base = _series_window(partition_cols, global_ok)
    w = base.orderBy(order_col).rowsBetween(-(window_rows - 1), 0)
    return df.withColumn(out_col, F.stddev_samp(value_col).over(w))


def pct_change(
    df: DataFrame,
    order_col: str,
    value_col: str,
    partition_cols: Sequence[str] | None = None,
    out_col: str = "pct_change",
    global_ok: bool = False,
) -> DataFrame:
    """W5: period-over-period change ``x/lag(x) - 1``
    (`prepare_visual_market_data.py:185`). A zero previous value makes
    the change undefined -> null (the bare division is an ANSI
    DIVIDE_BY_ZERO that aborts the job on a routine zero-valued period;
    r13 totality sweep class)."""
    base = _series_window(partition_cols, global_ok)
    w = base.orderBy(order_col)
    prev = F.lag(value_col).over(w)
    return df.withColumn(
        out_col, F.when(prev != 0, F.col(value_col) / prev - 1)
    )


def cumulative_sum(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "cumulative",
) -> DataFrame:
    """W6: cumulative sum per group (`advanced_timeseries_analysis.py:254`)."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def cumulative_product(
    df: DataFrame,
    order_col: str,
    returns_col: str,
    partition_cols: Sequence[str] | None = None,
    start_value: float = 100.0,
    out_col: str = "equity",
    global_ok: bool = False,
) -> DataFrame:
    """W7: backtest equity curve ``(1+r).cumprod() * 100``
    (`generate_research_visualizations.py:632-638`), expressed as
    ``exp(cumsum(log1p(r)))`` — associative, so it parallelizes as a window
    sum instead of a sequential product.

    Domain: ``log1p`` is undefined for returns ≤ −100%. A return of −1
    wipes the equity to 0 and any further value is meaningless, so once a
    prefix contains r ≤ −1 the curve is emitted as NULL from that row on
    (instead of silently propagating −inf/NaN).
    """
    base = _series_window(partition_cols, global_ok)
    w = base.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    wiped = F.max(
        F.when(F.col(returns_col) <= -1.0, F.lit(1)).otherwise(F.lit(0))
    ).over(w)
    curve = F.exp(F.sum(F.log1p(returns_col)).over(w)) * F.lit(start_value)
    return df.withColumn(out_col, F.when(wiped == 0, curve))


def top_k_per_group(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    k: int,
    tiebreak_cols: Sequence[str] = (),
    descending: bool = True,
) -> DataFrame:
    """W8: top-k rows per group via ``row_number``
    (`analyze_peer_effects.py:76-81`). Tie-break columns make row_number
    deterministic. Executes as one shuffle on the partition key + per-group
    sort — no global sort."""
    order = [F.desc(order_col) if descending else F.asc(order_col)]
    order += [F.col(c) for c in tiebreak_cols]
    w = Window.partitionBy(partition_col).orderBy(*order)
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= k)
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    id_col: str,
) -> DataFrame:
    """Gap-based sessionization over the event log: a new session starts
    when the time since the previous event of the same key exceeds
    ``gap_seconds``. session_id = running count of session starts — two
    stacked windows over ONE partition/sort (Catalyst reuses the sort).

    This is the batch twin of Structured Streaming's
    ``session_window(ts, gap)``; identical semantics over static input.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn("_new_session", is_new).withColumn(
        "session_id",
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_new_session")
