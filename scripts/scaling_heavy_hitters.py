"""Heavy-hitters scaling leg: bounded candidate sets vs full-cardinality
groupBy as key cardinality grows 100x (the SCALING.md method).

Corpus model: N rows = 10 planted hot keys (0.8% of rows each) over a
uniform tail of D distinct cold keys — the shape where a plain
groupBy-top-k builds O(D) reducer hash state while the candidate pass
provably cannot emit more than ~8k values per partition. We measure,
per (N, D):

- wall of `heavy_hitters(df, k=1000, top=10)` (candidate pass + exact
  verify pass) vs wall of the exact `groupBy.count.orderBy.limit`;
- the candidate-set size (the state that reaches the second pass) vs D;
- agreement of the two top-10 lists (must be identical — the planted
  hot keys clear N/k by construction).

Run:  python scripts/scaling_heavy_hitters.py [--scales 1,10,100]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opensea_datapipeline_spark.operators.aggregates import heavy_hitters
from opensea_datapipeline_spark.session import get_spark

BASE_ROWS = 200_000
BASE_DISTINCT = 20_000
HOT = 10
HOT_SHARE = 0.008  # per hot key


def build(spark, mult: int):
    n = BASE_ROWS * mult
    d = BASE_DISTINCT * mult
    hot_rows = int(n * HOT_SHARE)
    hot = (
        spark.range(hot_rows * HOT)
        .select((F.col("id") % HOT).alias("key"))
    )
    # cold tail: uniform over [HOT, HOT+d) — xxhash64 scatters without RNG
    cold = (
        spark.range(n - hot_rows * HOT)
        .select(
            (F.pmod(F.xxhash64("id"), F.lit(d)) + HOT).alias("key")
        )
    )
    return hot.unionAll(cold).repartition(32)


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark()
    out = []
    for mult in scales:
        df = build(spark, mult).persist()
        n = df.count()  # materialize once so both paths read warm input
        k = 1000

        t0 = time.time()
        hh_stats = {}
        mg = heavy_hitters(df, "key", k=k, top=10, stats_out=hh_stats).collect()
        w_mg = time.time() - t0

        t0 = time.time()
        exact = (
            df.groupBy("key")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            .orderBy(F.col("n_rows").desc(), F.col("key").asc())
            .limit(10)
            .collect()
        )
        w_exact = time.time() - t0

        # candidate-set size + certification outcome come from the
        # operator's OWN pinned execution (stats_out, r10) — deriving
        # them from a fresh nondeterministic candidate pass would be
        # exactly the stale-bound hazard the r10 operator closes
        rec = {
            "mult": mult,
            "rows": n,
            "distinct_target": BASE_DISTINCT * mult + HOT,
            "wall_mg_s": round(w_mg, 3),
            "wall_exact_s": round(w_exact, 3),
            # duplicate-inclusive emitted rows (pass-2 input), NOT the
            # distinct candidate set prior rounds logged as "candidates"
            "emitted_candidates": hh_stats.get("n_candidates"),
            "eps_bound": hh_stats.get("bound"),
            "certified": hh_stats.get("certified"),
            "top10_match": [(r.key, r.n_rows) for r in mg]
            == [(r.key, r.n_rows) for r in exact],
        }
        out.append(rec)
        print(json.dumps(rec))
        df.unpersist()

    # VERDICT r9 #5: the sf0.1 BENCH headline times the EXACT FALLBACK —
    # events.user_id at sf0.1 is deliberately low-skew, certification
    # correctly fails, and heavy_hitters pays sketch + verify + exact.
    # This leg shows that wall next to the certified-path walls above so
    # the bench entry reads as the designed trade, not a regression.
    from opensea_datapipeline_spark.sources.readers import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ev = load_table(spark, sf_dir, "events")
    t0 = time.time()
    heavy_hitters(ev, "user_id", k=250, top=10).collect()
    w_fb = time.time() - t0
    fb = {"leg": "sf0.1_low_skew_fallback", "wall_s": round(w_fb, 3)}
    print(json.dumps(fb))
    print(json.dumps({"legs": out, "fallback": fb}))


if __name__ == "__main__":
    main()
