"""Datetime column expressions (SURVEY.md §2.8 date/time family).

Centralizes the cross-engine calendar conventions so every operator and
query uses the same definitions (SURVEY.md §7.3 trap 2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def iso_weekday(ts: Column | str) -> Column:
    """ISO weekday 1=Mon..7=Sun — Polars ``dt.weekday()`` and DuckDB
    ``isodow`` convention. Spark's ``dayofweek`` is 1=Sun..7=Sat, so the
    portable form is ``weekday() + 1`` (`advanced_timeseries_analysis
    .py:32`)."""
    return F.weekday(ts) + 1


def year_month(ts: Column | str) -> Column:
    """'YYYY-MM' month label (`generate_visualizations.py:163-164`,
    strftime '%Y-%m')."""
    return F.date_format(ts, "yyyy-MM")


def epoch_seconds(ts: Column | str) -> Column:
    """Whole-second unix epoch as BIGINT — the only timestamp form the
    engine returns to oracle-compared outputs (testdata is ns-precision;
    see queries module docstring)."""
    return F.unix_timestamp(ts).cast("long")


def days_between(later: Column | str, earlier: Column | str) -> Column:
    """Fractional days between two timestamps
    (`analyze_peer_effects.py:119-121`: total_seconds()/86400)."""
    later = F.col(later) if isinstance(later, str) else later
    earlier = F.col(earlier) if isinstance(earlier, str) else earlier
    return (F.unix_timestamp(later) - F.unix_timestamp(earlier)) / 86400.0
