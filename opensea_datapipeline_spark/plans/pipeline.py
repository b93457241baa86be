"""The core ETL pipeline — load → validate → clean → aggregate fan-out →
write (the analog of the reference's ``OpenSeaPipeline.run``,
`opensea_pipeline/run.py:52-165`).

Differences from the reference, by design:

- **One lazy DAG per output** instead of eagerly materialized steps; stage
  boundaries appear only at shuffles.
- **Explicit ``.cache()`` at the clean→aggregate fan-out** — the
  reference's implicit reuse of the in-memory frame (`run.py:88-91`) is
  not automatic across Spark actions, so the cleaned frame is cached once
  and the four aggregate branches read it (SURVEY.md §4.1 scan-sharing).
- **Concurrent independent jobs.** The validation aggregate does not
  depend on the cleaned frame, and the five output writes do not depend
  on each other — each is submitted from its own thread so the Spark
  scheduler interleaves their stages (same-session multi-threaded job
  submission; on a cluster the FAIR/FIFO pool shares executors the same
  way). Sequential submission would serialize five small jobs' fixed
  costs (driver planning + whole-stage-codegen JIT) on top of each other.
- Metrics (tiny scalars) are the only thing collected to the driver.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import aggregates as agg
from ..operators import clean as cl
from ..schemas import TESTDATA_EVENT_TYPES
from ..sources.writers import (
    VersionedOutputStore,
    write_json_metrics,
    write_parquet,
)


@dataclass
class PipelineResult:
    outputs: dict[str, DataFrame]
    metrics: dict[str, object]
    timings: dict[str, float] = field(default_factory=dict)


def run_core_pipeline(
    spark: SparkSession,
    events: DataFrame,
    output_dir: str | None = None,
    event_types: list[str] | None = None,
) -> PipelineResult:
    """Run the full batch pipeline over an events frame.

    Produces the reference's five outputs (`run.py:106-113`): cleaned
    events, daily stats, entity (token) stats, two-sided (wallet)
    dimension, and the validation/quality metrics row. If ``output_dir``
    is given, writes versioned parquet + metrics.json like the reference's
    timestamped output store (`io_utils.py:192-235`).
    """
    event_types = event_types or list(TESTDATA_EVENT_TYPES)
    timings: dict[str, float] = {}

    # Validation (a pure aggregate over raw) and clean+cache are
    # independent jobs — overlap them. Per-stage timings are each
    # thread's own wall time; "validate_clean_wall" is the overlapped
    # elapsed time actually paid.
    t_start = time.perf_counter()
    validation = cl.validate_events(events, valid_types=event_types)

    def _run_validate() -> dict:
        t0 = time.perf_counter()
        row = validation.collect()[0].asDict()
        timings["validate"] = time.perf_counter() - t0
        return row

    cleaned = cl.clean_events(events)
    # Fan-out point: four downstream aggregates read the cleaned frame.
    cleaned.cache()
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(_run_validate)
        t0 = time.perf_counter()
        n_clean = cleaned.count()  # materialize the cache once
        timings["clean"] = time.perf_counter() - t0
        metrics_row = fut.result()
    timings["validate_clean_wall"] = time.perf_counter() - t_start

    t0 = time.perf_counter()
    with_date = cleaned.withColumn(
        "event_date_s", F.date_format("event_date", "yyyy-MM-dd")
    )
    daily = agg.daily_stats(
        with_date, ["event_date_s"], user_col="user_id", price_col="value",
        event_types=event_types,
    )
    entity = agg.entity_stats(
        cleaned, ["user_id"], price_col="value", ts_col="ts",
        distinct_col="event_type",
    )
    summary = agg.summary_quantiles(cleaned, ["event_type"], "value")
    dup_report = agg.duplicate_keys(
        events.withColumn("d", F.to_date("ts")), ["user_id", "event_type", "d"]
    )
    outputs = {
        "cleaned_events": cleaned,
        "daily_stats": daily,
        "entity_stats": entity,
        "collection_summary": summary,
        "duplicate_report": dup_report,
    }
    timings["plan_aggregates"] = time.perf_counter() - t0

    metrics = {
        **{k: (int(v) if v is not None else None) for k, v in metrics_row.items()},
        "rows_after_clean": int(n_clean),
    }

    if output_dir is not None:
        t0 = time.perf_counter()
        store = VersionedOutputStore(output_dir)
        run_dir = store.new_version_dir()

        def _write_one(item: tuple[str, DataFrame]) -> None:
            name, df = item
            if name == "cleaned_events":
                # fact table keeps natural partitioning; gold tables coalesce
                write_parquet(df.drop("props"), f"{run_dir}/{name}.parquet")
            else:
                write_parquet(df, f"{run_dir}/{name}.parquet", single_file=True)

        # Independent sinks: submit concurrently so the wall cost is the
        # longest single write, not the sum of five.
        with ThreadPoolExecutor(max_workers=len(outputs)) as pool:
            list(pool.map(_write_one, outputs.items()))
        write_json_metrics(metrics, f"{run_dir}/metrics.json")
        timings["write"] = time.perf_counter() - t0

    return PipelineResult(outputs=outputs, metrics=metrics, timings=timings)
