"""Hashed-gram shuffle-byte measurement (r10, VERDICT r8 #6 / r9 #4):
`dup_ngram_fraction` and `bigram_logprob_scores` with string keys vs
`xxhash64` keys, at 1x and 10x corpus growth.

Value equality of the two variants is pinned by
tests/test_new_operators.py::test_hashed_gram_variants_match; this
script measures WHAT THE SWAP BUYS — per-query shuffle write bytes
(from the Spark UI REST API, summed over the stages each query ran)
and wall time. The gram/word strings dominate shuffle payload for these
shapes, so the expected cut is roughly avg_gram_len/8.

Run:  python scripts/scaling_hashed_grams.py [--scales=1,10]
"""
import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opensea_datapipeline_spark.operators.text import (  # noqa: E402
    bigram_logprob_scores,
    dup_ngram_fraction,
)
from opensea_datapipeline_spark.session import get_spark  # noqa: E402
from opensea_datapipeline_spark.sources.readers import load_table  # noqa: E402
from scaling_llm_paths import scaled_docs  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _api(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def shuffle_bytes_snapshot(spark) -> dict:
    tot_w = tot_r = 0
    for st in _api(spark, "stages?status=complete"):
        tot_w += st.get("shuffleWriteBytes", 0)
        tot_r += st.get("shuffleReadBytes", 0)
    return {"w": tot_w, "r": tot_r}


def measure(spark, fn, tag):
    # noop sink, NOT .count(): count() lets Catalyst prune the gram
    # columns and the whole shuffle under test disappears (measured:
    # 31 KB "shuffle" for a plan whose gram exchange is 7.8 MB)
    before = shuffle_bytes_snapshot(spark)
    t0 = time.time()
    fn().write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    after = shuffle_bytes_snapshot(spark)
    return {
        "op": tag,
        "wall_s": round(wall, 3),
        "shuffle_write_mb": round((after["w"] - before["w"]) / 1e6, 2),
        "shuffle_read_mb": round((after["r"] - before["r"]) / 1e6, 2),
    }


def main() -> None:
    scales = [1, 10]
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark(
        "scaling-hashed-grams", extra_configs={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "documents")
    legs = []
    for mult in scales:
        out = tempfile.mkdtemp(prefix=f"docs_hashed_{mult}x_")
        scaled_docs(base, mult).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )
        docs = spark.read.parquet(os.path.join(out, "documents.parquet"))
        n_docs = docs.count()
        row = {"mult": mult, "n_docs": n_docs, "ops": []}
        for hashed in (False, True):
            h = "hashed" if hashed else "string"
            row["ops"].append(
                measure(
                    spark,
                    lambda: dup_ngram_fraction(docs, n=8, hashed=hashed),
                    f"dup_ngram[{h}]",
                )
            )
            row["ops"].append(
                measure(
                    spark,
                    lambda: bigram_logprob_scores(docs, hashed=hashed),
                    f"bigram_lm[{h}]",
                )
            )
        legs.append(row)
        print(json.dumps(row))
    print(json.dumps({"legs": legs}))


if __name__ == "__main__":
    main()
