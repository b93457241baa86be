"""Time named queries in isolation (bench methodology: plan+collect,
min of N runs). Usage: python scripts/time_queries.py N query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opensea_datapipeline_spark.queries import QUERIES
from opensea_datapipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    nruns = int(sys.argv[1])
    names = sys.argv[2:]
    spark = get_spark("time_queries", freeze_gc=True)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()  # warm
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"time:{name}")
        runs = []
        for _ in range(nruns):
            t0 = time.perf_counter()
            rows = fn(spark, SF_DIR).collect()
            runs.append(round(time.perf_counter() - t0, 3))
            del rows
        print(f"{name}: min={min(runs)} runs={runs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
