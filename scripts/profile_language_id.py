"""Attribute language_id's cost stage by stage (VERDICT r4 task #7).

Times cumulative prefixes of the language_id plan at sf0.1 so the delta
between consecutive stages isolates each component:

  scan        parquet scan of documents(text, doc_id) + count
  normalize   lower/regexp/split/distinct/length-filter, summed sizes
  explode     + explode_outer fan-out (count of word rows)
  join_agg    + broadcast profile join + conditional-count groupBy
  full        the registered query (adds the argmax fold + casts)

Each stage is min-of-5 after one warmup, same protocol as bench.py.
Run:  python scripts/profile_language_id.py [sf_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opensea_datapipeline_spark.session import get_spark
from opensea_datapipeline_spark.sources.readers import load_table
from opensea_datapipeline_spark.operators import text as tx
from opensea_datapipeline_spark import queries as Q


def timed(fn, runs=5):
    fn()  # warmup
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    profiles = tx.LANG_PROFILES
    max_len = max(len(w) for ws in profiles.values() for w in ws)
    candidates = F.filter(
        F.array_distinct(tx._words("text")),
        lambda w: F.length(w) <= max_len,
    )

    stages = {}

    t0 = time.perf_counter()
    tx._profile_table.__wrapped__ if hasattr(tx._profile_table, "__wrapped__") else None
    frozen = tuple(
        (lang, tuple(sorted(set(profiles[lang])))) for lang in sorted(profiles)
    )
    spark.createDataFrame(
        [(w, i) for i, (_, ws) in enumerate(frozen) for w in ws],
        "word string, _lidx int",
    ).count()
    stages["profile_table_build_once"] = time.perf_counter() - t0

    stages["scan"] = timed(
        lambda: docs.select("doc_id", "text").count()
    )
    stages["normalize"] = timed(
        lambda: docs.select(F.size(candidates).alias("n")).agg(F.sum("n")).collect()
    )
    stages["explode"] = timed(
        lambda: docs.select(
            F.col("doc_id"), F.explode_outer(candidates).alias("word")
        ).count()
    )

    def join_agg():
        out = tx.language_id(docs)
        out.groupBy().count().collect()

    stages["full_language_id"] = timed(join_agg)

    q = Q.QUERIES["language_id"]
    stages["registered_query"] = timed(
        lambda: q(spark, sf_dir).groupBy().count().collect()
    )

    fanout = docs.select(
        F.col("doc_id"), F.explode_outer(candidates).alias("word")
    ).count()

    report = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "word_rows_after_filter": fanout,
        "stages_sec": {k: round(v, 4) for k, v in stages.items()},
        "deltas_sec": {
            "normalize_over_scan": round(stages["normalize"] - stages["scan"], 4),
            "explode_over_normalize": round(
                stages["explode"] - stages["normalize"], 4
            ),
            "join_agg_over_explode": round(
                stages["full_language_id"] - stages["explode"], 4
            ),
        },
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
