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
        mg = heavy_hitters(df, "key", k=k, top=10).collect()
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

        # candidate-set size = state reaching pass 2 (re-run pass 1 only)
        import pandas as pd  # noqa: F401

        from pyspark.sql import types as T
        field = df.select("key").schema[0]

        cap = 8 * k

        def local_candidates(batches, col="key", k=k, cap=cap):
            import pandas as pd
            merged = None
            eps = 0
            tot = 0
            for b in batches:
                vc = b[col].dropna().value_counts()
                tot += int(vc.sum())
                merged = vc if merged is None else merged.add(vc, fill_value=0)
                if len(merged) > cap:
                    dd = int(merged.nlargest(cap + 1).iloc[-1])
                    eps += dd
                    merged = merged - dd
                    merged = merged[merged > 0]
            if merged is None or tot == 0:
                return
            cand = merged[(merged + eps) * k > tot]
            yield pd.DataFrame({col: cand.index.to_series().reset_index(drop=True)})

        n_cand = (
            df.select("key")
            .mapInPandas(local_candidates, schema=T.StructType([field]))
            .distinct()
            .count()
        )
        rec = {
            "mult": mult,
            "rows": n,
            "distinct_target": BASE_DISTINCT * mult + HOT,
            "wall_mg_s": round(w_mg, 3),
            "wall_exact_s": round(w_exact, 3),
            "candidates": n_cand,
            "top10_match": [(r.key, r.n_rows) for r in mg]
            == [(r.key, r.n_rows) for r in exact],
        }
        out.append(rec)
        print(json.dumps(rec))
        df.unpersist()
    print(json.dumps({"legs": out}))


if __name__ == "__main__":
    main()
