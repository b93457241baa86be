"""Same-volume baseline parity run (VERDICT r4 task #5).

The reference's only hard end-to-end number is its shipped run log:
1,563,309 raw events -> validate -> clean (dedup) -> 4 aggregates ->
5 parquet outputs in ~7 s wall on the author's single machine
(`opensea_pipeline/clean/2025-10-31_02-04-53/_run.log:3-21`). BENCH runs
at sf0.1 measure ~10x fewer events, so BASELINE.md's 0.72x claim has
always been an extrapolation. This script measures the real thing: the
analogous pipeline (`plans/pipeline.py:run_core_pipeline`) over a
1,563,309-row events table, from raw parquet on disk to written outputs.

Input construction: the sf0.1 events table (100k rows, ~30 days)
replicated 16x windows shifted 30 days apart (so the dedup key
(user, type, event-date) stays discriminating — exact copies would
collapse at the dedup step, which the reference's raw data does not do),
minus a deterministic tail slice to land exactly on the reference's
1,563,309 raw-row count. The replicated frame is WRITTEN to parquet
first and re-read, so the measured load includes real file I/O like the
reference's CSV load (~3 s of its 7 s).

Usage:  python scripts/baseline_parity.py [--keep]
Prints one JSON line with stage timings and the end-to-end wall vs the
reference's 7 s.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opensea_datapipeline_spark.plans.pipeline import run_core_pipeline
from opensea_datapipeline_spark.session import get_spark
from opensea_datapipeline_spark.sources.readers import load_table

REFERENCE_ROWS = 1_563_309  # _run.log:8
REFERENCE_WALL_S = 7.0  # _run.log:3-21 (02:04:48 -> 02:04:55)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 16  # 16 x ~100k = 1.6M, trimmed down to REFERENCE_ROWS


def build_raw_events(spark, raw_dir: str) -> int:
    """Materialize a REFERENCE_ROWS-row raw events parquet from sf0.1."""
    events = load_table(spark, SF_DIR, "events")
    rep = spark.range(REPLICAS).withColumnRenamed("id", "rep")
    shift_us = F.col("rep") * F.lit(30 * 86400 * 1_000_000)
    big = (
        events.crossJoin(F.broadcast(rep))
        .select(
            (F.col("event_id") + F.col("rep") * F.lit(10_000_000)).alias(
                "event_id"
            ),
            F.timestamp_micros(F.unix_micros("ts") + shift_us).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        # deterministic trim to the exact reference row count: drop the
        # highest event_ids of the last replica (no shuffle — the filter
        # is a scan predicate)
        .filter(
            (F.col("event_id") < F.lit(10_000_000 * (REPLICAS - 1)))
            | (
                F.col("event_id") % F.lit(10_000_000)
                < F.lit(REFERENCE_ROWS - 100_000 * (REPLICAS - 1))
            )
        )
    )
    # realistic multi-file layout: the crossJoin is narrow over a 1-file
    # scan, so without an explicit repartition the raw table would land as
    # a single parquet file and the measured pipeline would read 1.5M rows
    # on one core (the reference's raw input is 8 CSV files; any real
    # table at this volume is many files)
    big.repartition(32).write.mode("overwrite").parquet(raw_dir)
    n = spark.read.parquet(raw_dir).count()
    return n


def main() -> None:
    keep = "--keep" in sys.argv
    spark = get_spark("baseline-parity", freeze_gc=True)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="baseline_parity_")
    raw_dir = os.path.join(work, "raw_events")
    out_dir = os.path.join(work, "outputs")

    n_raw = build_raw_events(spark, raw_dir)

    # ---- measured region: load -> validate -> clean -> aggregates -> write.
    # Three runs: the first is the cold number (pays whole-stage-codegen
    # JIT, which the reference's precompiled Rust kernels never pay); the
    # min is the steady-state number, consistent with bench.py's protocol
    # on this shared, noisy box. Both are reported.
    walls = []
    result = None
    for i in range(3):
        run_out = f"{out_dir}_{i}"
        t0 = time.perf_counter()
        events = spark.read.parquet(raw_dir)
        result = run_core_pipeline(spark, events, output_dir=run_out)
        walls.append(time.perf_counter() - t0)
        result.outputs["cleaned_events"].unpersist()

    wall = min(walls)
    record = {
        "metric": "baseline_parity_wall_seconds",
        "value": round(wall, 3),
        "unit": "sec",
        "cold_wall_seconds": round(walls[0], 3),
        "runs": [round(w, 3) for w in walls],
        "raw_rows": n_raw,
        "reference_rows": REFERENCE_ROWS,
        "reference_wall_seconds": REFERENCE_WALL_S,
        "vs_reference": round(wall / REFERENCE_WALL_S, 3),
        "vs_reference_cold": round(walls[0] / REFERENCE_WALL_S, 3),
        "rows_after_clean": result.metrics.get("rows_after_clean"),
        "stage_timings": {k: round(v, 3) for k, v in result.timings.items()},
        "spark_version": spark.version,
        "cpus": os.cpu_count(),
        "load_1m": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(record))
    if not keep:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
