"""Span-dedup scaling measurement (r10): `duplicate_token_spans` and
`span_cut_corpus` with string gram keys vs `xxhash64` keys, at 1x and
10x corpus growth.

Value equality of the variants is pinned by
tests/test_new_operators.py::test_duplicate_spans_hashed_matches; this
measures what the hash swap buys on the gram shuffle (the dominant
exchange for both shapes — span_cut additionally shuffles the position
table, which hashing cannot shrink, so its relative cut is smaller by
construction). Shuffle bytes come from the UI REST API; walls are
single-shot indicative, bytes are deterministic.

Run:  python scripts/scaling_span_ops.py [--scales=1,10]
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opensea_datapipeline_spark.operators.text import (  # noqa: E402
    duplicate_token_spans,
    span_cut_corpus,
)
from opensea_datapipeline_spark.session import get_spark  # noqa: E402
from opensea_datapipeline_spark.sources.readers import load_table  # noqa: E402
from scaling_hashed_grams import measure  # noqa: E402
from scaling_llm_paths import scaled_docs  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    if "--skew" in sys.argv:
        skew_leg()
        return
    scales = [1, 10]
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark(
        "scaling-span-ops", extra_configs={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "documents")
    legs = []
    for mult in scales:
        out = tempfile.mkdtemp(prefix=f"docs_spans_{mult}x_")
        scaled_docs(base, mult).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )
        docs = spark.read.parquet(os.path.join(out, "documents.parquet"))
        row = {"mult": mult, "n_docs": docs.count(), "ops": []}
        for hashed in (False, True):
            h = "hashed" if hashed else "string"
            row["ops"].append(
                measure(
                    spark,
                    lambda: duplicate_token_spans(docs, n=8, hashed=hashed),
                    f"dup_spans[{h}]",
                )
            )
            row["ops"].append(
                measure(
                    spark,
                    lambda: span_cut_corpus(docs, n=8, hashed=hashed),
                    f"span_cut[{h}]",
                )
            )
        legs.append(row)
        print(json.dumps(row))
    print(json.dumps({"legs": legs}))




def skew_leg(mult: int = 10) -> None:
    """Planted hot-gram skew: every doc carries the same 50-token
    boilerplate tail, so its ~43 8-grams are shared by ALL docs. The
    window strategy funnels every hit of each hot gram into one task;
    the join strategy collapses them map-side and broadcast-joins the
    tiny dup-gram set."""
    spark = get_spark(
        "scaling-span-skew", extra_configs={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    base = load_table(spark, SF_DIR, "documents")
    boiler = " ".join(f"boil{i}" for i in range(50))
    out = tempfile.mkdtemp(prefix=f"docs_skew_{mult}x_")
    scaled_docs(base, mult).select(
        "doc_id", F.concat_ws(" ", "text", F.lit(boiler)).alias("text")
    ).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    docs = spark.read.parquet(os.path.join(out, "documents.parquet"))
    row = {"mult": mult, "n_docs": docs.count(), "skew": "50-token shared tail", "ops": []}
    for strat in ("window", "join"):
        row["ops"].append(
            measure(
                spark,
                lambda: duplicate_token_spans(
                    docs, n=8, hashed=True, strategy=strat
                ),
                f"dup_spans[hashed,{strat}]",
            )
        )
    print(json.dumps(row))


if __name__ == "__main__":
    main()
