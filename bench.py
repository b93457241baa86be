"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "suite_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Per-query time is measured as plan-build + execute-to-driver (collect);
session startup is excluded (BASELINE.md counts it as overhead outside the
per-query measurement). Each query is the same callable the driver grades
via __spark_entry__.queries().
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opensea_datapipeline_spark.queries import QUERIES
from opensea_datapipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, weighted toward the shapes that
# dominate at scale (wide agg, multi-join, range join, similarity, dedup).
HEADLINE = [
    "daily_stats",          # flagship: filter+agg+pivot (A1-A3)
    "user_stats",           # per-entity agg (A4/A5)
    "two_sided_dim",        # dual agg + full-outer join (A7)
    "pricing_summary",      # TPC-H Q1 shape: scan-heavy wide agg
    "segment_revenue",      # TPC-H Q3 shape: 3-way join
    "quantile_filter_agg",  # exact percentile + re-scan (P12)
    "peer_window_1h",       # range self-join + per-row window agg (J7/A12)
    "rolling_daily_mean",   # window functions (W3)
    "topk_per_user",        # ranked window top-k (W8)
    "knn_topk",             # exact cosine top-k join (J8)
    "exact_dedup",          # hash dedup
    "minhash_signatures",   # minhash (LLM-pipeline extension)
    "token_stats",          # text analysis
    "language_id",          # text classification
    "clean_events_pipeline",  # full ETL cleaner (normalize->dedup->project)
    "asof_last_click",      # as-of join composition
    "sessionization",       # gap-based sessions (stacked windows)
    "neighbor_peer_window", # J7 neighbor-map range join
    "group_regression",     # applyInPandas per-group OLS
    "local_supplier_revenue",  # TPC-H Q5 shape: 6-way join
    "large_orders",         # TPC-H Q18 shape: having semi-join
    "nation_trade_volume",  # TPC-H Q7 shape: two-chain nation pair join
    "late_supplier_blame",  # TPC-H Q21 shape: decorrelated exists/not-exists
    "order_status_rollup",  # grouping sets in one shuffle
    "small_quantity_revenue",  # TPC-H Q17 shape: decorrelated avg join
    "corpus_curation",      # quality filter -> dedup -> token budget
    "document_chunks",      # overlap chunking fan-out
    "tfidf_top_terms",      # tf-idf join + ranking window
    "event_cube_stats",     # CUBE lattice in one Expand+agg shuffle
    "dedup_groups",         # iterative connected components (pairs->groups)
    "embedding_array_stats",  # higher-order array ops, codegen-bound
    "group_p90_distributed",  # per-group exact percentile, no value buffer
    "order_shipping_priority",  # TPC-H Q3 shape: filtered broadcast + top-N heaps
    "returned_item_losses",     # TPC-H Q10 shape: quarter slice + top-N heaps
]


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/parquet-datasource path outside measurement.
    try:
        spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    except Exception as exc:
        print(f"bench: warmup read failed: {exc}", file=sys.stderr)

    # Steady-state timing: min of 3 runs per query (first run pays one-off
    # whole-stage-codegen JIT compilation, which is amortized in any real
    # deployment; per-run data work is identical). Min-of-3: observed
    # run-to-run variance on a shared box is ±0.3-0.5 s/query, larger
    # than several queries' real cost — the min is the stable statistic.
    times: dict[str, float] = {}
    failures: list[str] = []
    for name in HEADLINE:
        fn = QUERIES[name]
        best = float("inf")
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                rows = fn(spark, SF_DIR).collect()
                best = min(best, time.perf_counter() - t0)
                del rows
            times[name] = round(best, 3)
        except Exception as exc:  # a broken query must not void the record
            failures.append(name)
            print(f"bench: {name} failed: {exc}", file=sys.stderr)

    total = round(sum(times.values()), 3)
    # reference-analogous core (BASELINE.md measures only the reference's
    # 4-aggregate pipeline; the full suite is ~6x broader in scope)
    core = ["daily_stats", "user_stats", "two_sided_dim", "clean_events_pipeline"]
    record = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "iterations": 2,
        "core_pipeline_seconds": round(
            sum(times[q] for q in core if q in times), 3
        ),
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if failures:
        record["failed"] = failures

    # Round-over-round visibility: per-query delta vs the latest recorded
    # BENCH_r{N}.json (positive = slower than last round). Only queries
    # present in both rounds appear; regressions are then greppable
    # without diffing two JSON files by hand.
    prior = sorted(
        glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_r*.json"))
    )
    if prior:
        try:
            with open(prior[-1]) as f:
                rec = json.load(f)
            # the driver wraps our stdout JSON under "parsed"
            prev = rec.get("parsed", rec).get("queries", {})
            record["vs_prev"] = {
                q: round(t - prev[q], 3) for q, t in times.items() if q in prev
            }
            record["prev_round"] = os.path.basename(prior[-1])
        except (OSError, ValueError) as exc:
            print(f"bench: prior-round delta skipped: {exc}", file=sys.stderr)

    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
