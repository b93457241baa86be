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


def _previously_graded() -> tuple[set[str], dict[str, int]]:
    """(names needing no regrade, name -> round of its latest grading).

    The driver grades a bounded prefix of ``queries()`` per round, so we
    surface first (a) queries never graded, (b) queries whose last grading
    errored, and (c) queries graded ``no_oracle`` that NOW have an oracle
    (upgraded rows-only paths must be re-graded against it). Already-green
    ones are protected by tests/test_oracle_parity.py regardless of order,
    but the bounded prefix still rotates through them oldest-round-first so
    every registered query gets a fresh driver row every ~2.5 rounds.
    """
    latest: dict[str, dict] = {}
    last_round: dict[str, int] = {}
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
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        latest.update(rows)
        rnd = _round_num(path)
        for name in rows:
            last_round[name] = rnd
    ok: set[str] = set()
    for name, row in latest.items():
        err = (row or {}).get("err")
        if err is None or (err == "no_oracle" and name not in ORACLE):
            ok.add(name)
    return ok, last_round


# Regraded ahead of everything: queries whose latest green row no longer
# reflects the query, or whose latest row is stale enough that rotation
# alone won't reach it. History: r5 streaming_daily_stats (NTZ fix), r6
# embedding_near_dup, r8 nation_trade_volume/psi_value_drift/
# media_dimensions/media_knn_pipeline, r9 rewrites (mann_whitney_value,
# ewma_daily, kl_source_drift, heavy_hitter_users, association_rules),
# r10 gram-plan rewrites (contamination_flags, repetition_scores,
# dup_ngram_fraction, bigram_logprob_scores) — ALL regraded green in r10
# per VERDICT r10, retired. r11's 15 r03–r06 pins — ALL regraded green
# in r11 per VERDICT r11, retired. r12's 25 r07-stale + 5
# query/oracle-changed pins — ALL regraded green in r12 per VERDICT
# r12, retired. r13 (VERDICT r12 #3): the 26 queries whose latest
# driver row is r08 (local oracle-parity keeps them value-verified —
# bookkeeping freshness, not correctness); after this batch nothing in
# the r01–r13 union is older than r09. New registrations (ungraded)
# still sort ahead of every graded query automatically.
_REGRADE_FIRST = (
    # --- r15's 9 pins ALL regraded green in r15 (CORRECTNESS_r15,
    # VERDICT r15), retired. r16 (VERDICT r15 #2): no query/oracle
    # semantics changed this round, so the pin list is EMPTY — all 50
    # prefix slots go to the stalest driver rows (mann_whitney_value /
    # kaplan_meier_churn at r10, ~30 queries at r11), which _ordered
    # reaches automatically by sorting graded queries stalest-first.
)


def _ordered(mapping: dict) -> dict:
    graded, last_round = _previously_graded()
    names = sorted(
        QUERIES,
        key=lambda n: (
            n not in _REGRADE_FIRST,
            n in graded,
            # among already-graded queries, stalest driver row first so the
            # bounded grading prefix rotates through the whole registry
            # (~2.5 rounds at a 50-query prefix) instead of re-grading the
            # same registry-order prefix every round
            last_round.get(n, -1),
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
