"""Measure skewed-join behavior: AQE skew-split vs explicit salting vs
an unmitigated shuffle join (SURVEY §4 / the 100 TB skew story — the one
scale dimension SCALING.md had no measured leg for).

Fixture: a fact table where ONE key owns `hot_frac` of all rows (the
power-law hot-entity shape: one viral collection / one bot wallet),
shuffle-joined to a 10k-row per-key dim. Five measurements:

  aqe_off           unmitigated SMJ (skewJoin off) — one reducer owns
                    hot_frac of the work
  salted            `joins.salted_join` with skewJoin off — the
                    plan-level tool for when AQE can't split
  aqe_smj           AQE skew split on a global-agg consumer (split CAN
                    engage; `aqe_skew_split_engaged` proves it did)
  grouped_unforced  join → groupBy(join key): partitioning REUSE blocks
                    the split (engaged=false, wall ≈ unmitigated)
  grouped_forced    same + forceOptimizeSkewedJoin — extra shuffle,
                    split re-engages

Wall = min-of-2 per plan after a warm-up join (box noise + phase-order
bias: SCALING.md method note); grouped legs are single-run.

Run: python scripts/scaling_skew.py [--rows=20000000] [--hot-frac=0.5]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opensea_datapipeline_spark.operators.joins import salted_join
from opensea_datapipeline_spark.session import get_spark


def _has_skew(df) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "skew=true" in plan or "skewed" in plan


def main():
    rows, hot_frac, n_keys = 5_000_000, 0.5, 10_000
    for arg in sys.argv[1:]:
        if arg.startswith("--rows="):
            rows = int(arg.split("=", 1)[1])
        if arg.startswith("--hot-frac="):
            hot_frac = float(arg.split("=", 1)[1])
    spark = get_spark("scaling-skew")
    spark.sparkContext.setLogLevel("ERROR")

    # key 0 owns hot_frac of rows; the rest spread uniformly. v is
    # HIGH-ENTROPY on purpose: AQE's skew detection measures compressed
    # SHUFFLE BYTES, and a low-entropy fixture (v = id % 97) compressed
    # the 10M-row hot partition under the byte threshold — skew split
    # silently never engaged while the partition was still 10M-rows
    # row-skewed. (Real lesson recorded in SCALING.md: byte-based
    # detection under-fires on highly compressible hot keys; salting
    # works off row counts and does not care.)
    fact = spark.range(rows).select(
        F.when(
            (F.col("id") % 1_000_000) < int(hot_frac * 1_000_000), F.lit(0)
        ).otherwise(
            F.pmod(F.hash(F.col("id")), F.lit(n_keys))
        ).cast("long").alias("k"),
        (F.pmod(F.hash(F.col("id") * 7919), F.lit(1_000_000)) / 1000.0
         ).alias("v"),
    ).localCheckpoint(eager=True)
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") % 13).cast("double").alias("w")
    ).localCheckpoint(eager=True)

    def run(df):
        # global agg only: a groupBy("k") downstream would REUSE the
        # join's hash(k) partitioning, and AQE then declines to split
        # the skewed partition (splitting duplicates a key across
        # partitions, breaking the required distribution) — measured
        # here first: skew split engaged=false and walls identical
        # until the reuse was removed. THE trap to know: a skewed join
        # feeding a same-key aggregate needs forceOptimizeSkewedJoin
        # (pay an extra shuffle) or plan-level salting.
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.agg(F.sum(F.col("v") * F.col("w"))).collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    # disable broadcast so the join actually shuffles (dim is tiny; at
    # 100 TB the skewed join partner is another fact table)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    report = {"rows": rows, "hot_frac": hot_frac, "n_keys": n_keys}
    hot = fact.groupBy("k").count()
    top = hot.orderBy(F.desc("count")).limit(3).collect()
    report["top_key_rows"] = {str(r.k): r["count"] for r in top}

    # warm the join path once (codegen + shuffle machinery) so phase
    # order doesn't bias the comparison; then measure off -> salted ->
    # aqe so the mitigated plans can't inherit a cold-start advantage
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    fact.join(dim, "k").agg(F.count(F.lit(1))).collect()

    report["aqe_off_sec"] = run(fact.join(dim, "k"))
    report["salted_sec"] = run(salted_join(fact, dim, "k", n_salts=16))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # default skew detection needs partition > 256MB AND > 5x median;
    # lower both so the local fixture's hot partition reliably splits —
    # at real 100 TB sizes the defaults fire on their own
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16MB"
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB"
    )
    jdf = fact.join(dim, "k")
    report["aqe_smj_sec"] = run(jdf)
    probe = jdf.agg(F.sum(F.col("v") * F.col("w")))
    probe.collect()
    report["aqe_skew_split_engaged"] = (
        _has_skew(probe)
    )

    # the grouped-consumer shape: groupBy("k") downstream reuses the
    # join's partitioning, so the split only happens when FORCED (an
    # extra shuffle buys the balance back)
    grouped = jdf.groupBy("k").agg(F.sum(F.col("v") * F.col("w")).alias("s"))
    grouped.collect()
    report["grouped_reuse_split_engaged"] = (
        _has_skew(grouped)
    )
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    fagg = jdf.groupBy("k").agg(
        F.sum(F.col("v") * F.col("w")).alias("s")
    ).agg(F.sum("s"))
    t0 = time.perf_counter()
    fagg.collect()
    report["grouped_forced_sec"] = round(time.perf_counter() - t0, 2)
    report["grouped_forced_split_engaged"] = _has_skew(fagg)
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
    t0 = time.perf_counter()
    jdf.groupBy("k").agg(
        F.sum(F.col("v") * F.col("w")).alias("s")
    ).agg(F.sum("s")).collect()
    report["grouped_unforced_sec"] = round(time.perf_counter() - t0, 2)

    # sanity: identical results across plans
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    a = fact.join(dim, "k").agg(
        F.round(F.sum(F.col("v") * F.col("w")), 4).alias("s")
    ).first().s
    b = salted_join(fact, dim, "k", n_salts=16).agg(
        F.round(F.sum(F.col("v") * F.col("w")), 4).alias("s")
    ).first().s
    report["results_equal"] = bool(a == b)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
