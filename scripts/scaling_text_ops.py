"""Text-operator scaling legs (r8): dup_ngram_fraction, token_entropy,
bigram_logprob_scores, kl_source_drift under 10x/100x corpus growth.

Reuses scaling_llm_paths' growth model (replica-tagged words: disjoint
replica vocabularies, so cross-replica gram/bigram collisions are zero
and per-doc results are replica-invariant — output SIZE grows linearly
while per-row answers stay comparable). The scaled corpus is WRITTEN to
a temp dir so every op runs through its normal parquet-scan contract.

Each op is timed as min-of-2 full `count()` materializations. What to
look for: these are all explode -> bounded-pair-shuffle shapes, so wall
should grow ~linearly (the shuffle working set is tokens/grams, which
grow linearly with docs); a superlinear jump means a window or join has
left the bounded-intermediate regime.

Run:  python scripts/scaling_text_ops.py [--scales 1,10,100]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opensea_datapipeline_spark.queries import QUERIES  # noqa: E402
from opensea_datapipeline_spark.session import get_spark  # noqa: E402
from opensea_datapipeline_spark.sources.readers import load_table  # noqa: E402
from scaling_llm_paths import scaled_docs  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OPS = [
    "dup_ngram_fraction",
    "token_entropy",
    "bigram_logprob_scores",
    "kl_source_drift",
]


def write_scaled(spark, mult: int) -> str:
    base = load_table(spark, SF_DIR, "documents")
    docs = scaled_docs(base, mult)
    # kl_source_drift needs source/lang/n_chars; re-derive a stable
    # source tag from doc_id so every scale has the same 20 sources
    full = docs.select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string")).alias(
            "source"
        ),
        F.length("text").alias("n_chars"),
    )
    out = tempfile.mkdtemp(prefix=f"docs_text_{mult}x_")
    # queries resolve tables as <sf_dir>/<name>.parquet
    full.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark("scaling-text")
    spark.sparkContext.setLogLevel("ERROR")
    legs = []
    for mult in scales:
        d = write_scaled(spark, mult)
        n_docs = spark.read.parquet(
            os.path.join(d, "documents.parquet")
        ).count()
        row = {"mult": mult, "n_docs": n_docs}
        for op in OPS:
            walls = []
            for _ in range(2):
                t0 = time.time()
                out_rows = QUERIES[op](spark, d).count()
                walls.append(time.time() - t0)
            row[op] = {"wall_s": round(min(walls), 3), "rows": out_rows}
        legs.append(row)
        print(json.dumps(row))
    print(json.dumps({"legs": legs}))


if __name__ == "__main__":
    main()
