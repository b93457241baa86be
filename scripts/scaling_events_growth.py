"""Measure registered event-table queries under 10x/100x data growth
(the SCALING.md method, now as a committed harness — the r5 numbers were
produced by an uncommitted one-off).

Growth model: `$SPARK_GRAFT_SF_DIR/events.parquet` replicated with
disjoint event_id/user_id ranges and microsecond-jittered timestamps —
entity cardinality and per-key density grow with volume, the realistic
direction. The scaled table is WRITTEN to a temp dir (32/64 files) so
each query runs through its normal `(spark, sf_dir)` contract including
the parquet scan. Each query is timed as min-of-2 `count()`.

Run:  python scripts/scaling_events_growth.py [--scales 1,10,100]
          [--queries funnel_conversion,cohort_retention,...]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opensea_datapipeline_spark.queries import QUERIES
from opensea_datapipeline_spark.session import get_spark
from opensea_datapipeline_spark.sources.readers import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_QUERIES = [
    "funnel_conversion",
    "cohort_retention",
    "rolling_active_users",
]


def scaled_events_dir(spark, mult: int) -> str:
    if mult == 1:
        return SF_DIR
    base = load_table(spark, SF_DIR, "events")
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    scaled = base.crossJoin(reps).select(
        (F.col("event_id") + F.col("rep") * 100_000_000).alias("event_id"),
        F.timestamp_micros(
            F.unix_micros("ts") + F.col("rep")
        ).alias("ts"),
        (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
        "event_type", "value", "props",
    )
    out = tempfile.mkdtemp(prefix=f"ev_growth_{mult}x_")
    n_files = 32 if mult <= 10 else 64
    scaled.repartition(n_files).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    return out


def main():
    scales = [1, 10, 100]
    queries = DEFAULT_QUERIES
    for arg in sys.argv[1:]:
        if arg.startswith("--scales="):
            scales = [int(x) for x in arg.split("=", 1)[1].split(",")]
        if arg.startswith("--queries="):
            queries = arg.split("=", 1)[1].split(",")
    spark = get_spark("scaling-events-growth")
    spark.sparkContext.setLogLevel("ERROR")
    report = {"sf_dir": SF_DIR, "scales": {}}
    for mult in scales:
        d = scaled_events_dir(spark, mult)
        n_rows = spark.read.parquet(f"{d}/events.parquet").count()
        entry = {"n_rows": n_rows}
        for name in queries:
            best = float("inf")
            rows = None
            for _ in range(2):
                t0 = time.perf_counter()
                rows = QUERIES[name](spark, d).count()
                best = min(best, time.perf_counter() - t0)
            entry[name] = {"sec": round(best, 2), "out_rows": rows}
            print(json.dumps({f"{mult}x": {name: entry[name]}}),
                  file=sys.stderr)
        report["scales"][f"{mult}x"] = entry
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
