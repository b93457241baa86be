"""Capture `.explain("formatted")` output for named queries.

Usage: python scripts/capture_plans.py SUFFIX [query ...]

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<SUFFIX>.txt for each query
(round dir defaults to r17; all headline queries when none are named).
The plan is captured at $SPARK_GRAFT_SF_DIR (default sf0.1) with the same
session the bench uses, so Exchange counts and join strategies match what
the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opensea_datapipeline_spark.queries import QUERIES
from opensea_datapipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r17"),
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE  # noqa: PLC0415

        names = list(HEADLINE)
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange mentions -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
