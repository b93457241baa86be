"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``opensea_datapipeline_spark``; this module is
a thin binding of its query registry (one entry per implemented operator
from SURVEY.md §2 plus the LLM-data-pipeline extensions).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from opensea_datapipeline_spark.queries import ORACLE, QUERIES  # noqa: E402

SF0001_DIR = "/root/testdata/sf0.001"


def _previously_graded() -> set[str]:
    """Query names whose latest CORRECTNESS_r*.json row needs no regrade.

    The driver grades a bounded prefix of ``queries()`` per round, so we
    surface first (a) queries never graded, (b) queries whose last grading
    errored, and (c) queries graded ``no_oracle`` that NOW have an oracle
    (upgraded rows-only paths must be re-graded against it). Already-green
    ones are protected by tests/test_oracle_parity.py regardless of order.
    """
    latest: dict[str, dict] = {}
    # sort by the numeric round, not lexicographically: _r100 would sort
    # before _r99 as a string and let a stale row win; files without a
    # numeric round tag sort first (treated as oldest)
    def _round_num(p: str) -> int:
        m = re.search(r"_r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    paths = sorted(
        glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")),
        key=_round_num,
    )
    for path in paths:
        try:
            with open(path) as f:
                latest.update(json.load(f))
        except (OSError, ValueError):
            continue
    ok: set[str] = set()
    for name, row in latest.items():
        err = (row or {}).get("err")
        if err is None or (err == "no_oracle" and name not in ORACLE):
            ok.add(name)
    return ok


# Regraded ahead of everything: queries whose latest green row no longer
# reflects the query. r5 surfaced streaming_daily_stats after the NTZ fix
# (green r5 row recorded — retired from this list). r6: embedding_near_dup's
# r5 row was green but VACUOUS (0 rows both engines); the query now plants
# deterministic in-plan twins and must be regraded on its non-trivial form.
_REGRADE_FIRST = ("embedding_near_dup",)


def _ordered(mapping: dict) -> dict:
    graded = _previously_graded()
    names = sorted(
        QUERIES,
        key=lambda n: (
            n not in _REGRADE_FIRST,
            n in graded,
            list(QUERIES).index(n),
        ),
    )
    return {n: mapping[n] for n in names if n in mapping}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (daily stats — the reference's headline output,
    `opensea_pipeline/pipeline/src/aggregate.py:16-94`) on sf0.001."""
    return QUERIES["daily_stats"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (not-yet-graded
    queries first, so a bounded grading prefix reaches them)."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (keys without an
    entry get the driver's weaker rows-only check)."""
    return _ordered(ORACLE)
