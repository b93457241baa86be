"""CLI entry point — the analog of the reference's ``python run.py``
(`opensea_pipeline/run.py:168-219`).

    python -m opensea_datapipeline_spark run --events <path> --out <dir>
    python -m opensea_datapipeline_spark query <name> --sf-dir <dir> [-n 20]
    python -m opensea_datapipeline_spark list

Local mode by default; under spark-submit the session factory defers to
the submitted master.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="opensea_datapipeline_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="run the core ETL pipeline")
    p_run.add_argument("--events", required=True, help="events parquet path")
    p_run.add_argument("--out", required=True, help="versioned output dir")

    p_q = sub.add_parser("query", help="run one registered query")
    p_q.add_argument("name")
    p_q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_q.add_argument("-n", type=int, default=20, help="rows to show")

    sub.add_parser("list", help="list registered queries")

    args = parser.parse_args(argv)

    from .queries import ORACLE, QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            kind = "oracle" if name in ORACLE else "rows-only"
            print(f"{name}\t{kind}")
        return 0

    from .session import get_spark

    spark = get_spark("opensea-cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd == "run":
            from .plans.pipeline import run_core_pipeline

            events = spark.read.parquet(args.events)
            # normalize ns timestamps like load_table does
            from pyspark.sql import functions as F

            if dict(events.dtypes).get("ts") == "bigint":
                events = events.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            res = run_core_pipeline(spark, events, output_dir=args.out)
            print(json.dumps({"metrics": res.metrics,
                              "timings": {k: round(v, 3) for k, v in res.timings.items()}}))
            return 0

        if args.cmd == "query":
            if args.name not in QUERIES:
                print(f"unknown query: {args.name}", file=sys.stderr)
                return 2
            QUERIES[args.name](spark, args.sf_dir).show(args.n, truncate=False)
            return 0
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
