"""BPE training/encoding scale legs (r11): the claim under test is that
the ITERATIVE LOOP's cost is bounded by DISTINCT WORDS, not corpus
tokens — the corpus is scanned once into the (word, cnt) table and all
n_merges rounds run over that table.

Two growth axes, measured separately because they stress different
parts of the plan:
- corpus x10 VERBATIM (same documents repeated under new doc_ids):
  tokens grow 10x, the word table does NOT — per-round wall should stay
  ~flat and only the one-off word-frequency pass should grow.
- vocabulary x10 (the scaled_docs '~rep' word tagging from
  scaling_llm_paths): distinct words grow ~10x — the loop's pair-count
  agg and replace projection now run over 10x rows, the expected
  linear-in-vocab regime.

bpe_encode is timed at both corpus scales: its distinct-word
segmentation is vocab-bound, its token join + doc rebuild corpus-bound.

Run:  python scripts/scaling_bpe.py [--scales=1,10]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opensea_datapipeline_spark.operators.text import (  # noqa: E402
    _bpe_word_freq,
    bpe_encode,
    bpe_train,
)
from opensea_datapipeline_spark.session import get_spark  # noqa: E402
from opensea_datapipeline_spark.sources.readers import load_table  # noqa: E402
from scaling_hashed_grams import shuffle_bytes_snapshot  # noqa: E402
from scaling_llm_paths import REP_OFFSET, scaled_docs  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_MERGES = 12


def verbatim_docs(base, mult):
    """mult copies of the SAME text under fresh doc_ids: token volume
    grows mult-x while the distinct-word table stays fixed."""
    if mult == 1:
        return base.select("doc_id", "text")
    reps = base.sparkSession.range(mult).select(F.col("id").alias("rep"))
    return (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * REP_OFFSET).alias("doc_id"),
            "text",
        )
        .repartition(32)
    )


def timed(spark, tag, fn):
    before = shuffle_bytes_snapshot(spark)
    t0 = time.time()
    out = fn()
    wall = time.time() - t0
    after = shuffle_bytes_snapshot(spark)
    return out, {
        "op": tag,
        "wall_s": round(wall, 3),
        "shuffle_write_mb": round((after["w"] - before["w"]) / 1e6, 2),
        "shuffle_read_mb": round((after["r"] - before["r"]) / 1e6, 2),
    }


def run_leg(spark, docs, tag):
    out_dir = tempfile.mkdtemp(prefix=f"bpe_{tag}_")
    docs.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    d = spark.read.parquet(os.path.join(out_dir, "documents.parquet"))
    leg = {"leg": tag, "ops": []}
    wf = _bpe_word_freq(d, "text")
    leg["n_tokens"] = int(
        wf.agg(F.sum("cnt")).head()[0] or 0
    )
    leg["n_distinct_words"] = wf.count()
    # one-off corpus pass, measured alone (it is the only part of
    # training that should grow with verbatim corpus duplication)
    _, m = timed(
        spark,
        "word_freq_pass",
        lambda: wf.write.mode("overwrite").format("noop").save(),
    )
    leg["ops"].append(m)
    merges, m = timed(
        spark,
        f"bpe_train_{N_MERGES}",
        # driver_gate=0: this leg documents the DISTRIBUTED loop's
        # scaling shape (SCALING §bpe); the r13 default gate would
        # route the <=65536-word synthetic legs to the driver path
        lambda: bpe_train(d, n_merges=N_MERGES, min_count=2,
                          driver_gate=0),
    )
    m["per_round_s"] = round(m["wall_s"] / N_MERGES, 3)
    leg["ops"].append(m)
    _, m = timed(
        spark,
        "bpe_encode",
        lambda: bpe_encode(d, merges)
        .write.mode("overwrite")
        .format("noop")
        .save(),
    )
    leg["ops"].append(m)
    return leg


def synth_vocab_docs(spark, n_words):
    """n_words-word synthetic vocabulary (8-hex-char md5 words, so the
    base alphabet is 16 chars and pair merges are plentiful), one doc
    of 50 words per distinct word => every word ~50 occurrences. The
    testdata corpus has only 31 distinct words — far too small to
    stress the loop's vocab-bound stages."""
    return spark.range(n_words).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(0, 49), i -> "
            f"substr(md5(cast(pmod(id * 50 + i, {n_words}) as string))"
            f", 1, 8)), ' ')"
        ).alias("text"),
    )


def synth_merge_rows(n):
    """n deterministic merge rows over the hex alphabet (md5-derived
    2-4 char symbols). NOT well-formed — irrelevant for applier cost:
    every replace() scans every word string whether or not it fires, so
    the per-merge cost is the scan, and an arbitrary table measures the
    same work a trained 32k vocabulary would."""
    import hashlib

    rows = []
    for i in range(n):
        h = hashlib.md5(f"m{i}".encode()).hexdigest()
        l_len = 2 + (i % 3)
        rows.append({
            "left_sym": h[:l_len],
            "right_sym": h[l_len:l_len + 1 + (i % 2)],
        })
    return rows


def run_production_depth_leg(spark, docs, depth):
    """The 32k claim, measured (r12): apply a production-vocabulary-size
    merge table through the staged and Arrow appliers over the bounded
    word table. The single-projection form is not even attempted — it
    is the documented non-option this leg exists to replace."""
    from opensea_datapipeline_spark.operators.text import (
        bpe_apply_merges_arrow,
        bpe_apply_merges_fold,
        bpe_apply_merges_staged,
    )

    words = (
        _bpe_word_freq(docs, "text").select("w").localCheckpoint(eager=True)
    )
    rows = synth_merge_rows(depth)
    leg = {"leg": f"production_depth_{depth}",
           "n_words": words.count(), "ops": []}
    for tag, fn in (
        ("staged", lambda: bpe_apply_merges_staged(words, rows)),
        ("fold", lambda: bpe_apply_merges_fold(words, rows)),
        ("arrow", lambda: bpe_apply_merges_arrow(words, rows)),
    ):
        _, m = timed(
            spark,
            f"{tag}_{depth}",
            lambda: fn().write.mode("overwrite").format("noop").save(),
        )
        leg["ops"].append(m)
    return leg


def run_staged_leg(spark, docs, depths):
    """r12 (VERDICT r11 #1): staged-segmentation cost must be LINEAR in
    merge count — (depth / stage_size) passes over the bounded
    distinct-words table — where the single-projection form stops
    compiling long before production depth. The synthetic 100k-word
    corpus's 16-char hex alphabet yields a 256-pair + 4096-triple grid,
    so every probed depth applies real merges. The Arrow serving
    applier is timed at max depth for comparison."""
    from opensea_datapipeline_spark.operators.text import (
        bpe_apply_merges_arrow,
        bpe_apply_merges_staged,
        bpe_grid_merge_table,
    )

    words = (
        _bpe_word_freq(docs, "text").select("w").localCheckpoint(eager=True)
    )
    leg = {"leg": "staged_depth", "n_words": words.count(), "ops": []}
    rows = [
        r.asDict()
        for r in bpe_grid_merge_table(docs, max_merges=max(depths))
        .orderBy("merge_rank")
        .collect()
    ]
    for depth in depths:
        sub = rows[:depth]
        _, m = timed(
            spark,
            f"staged_{depth}",
            lambda: bpe_apply_merges_staged(words, sub, stage_size=128)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        m["stages"] = -(-depth // 128)
        leg["ops"].append(m)
    _, m = timed(
        spark,
        f"arrow_{max(depths)}",
        lambda: bpe_apply_merges_arrow(words, rows)
        .write.mode("overwrite")
        .format("noop")
        .save(),
    )
    leg["ops"].append(m)
    return leg


def run_crossover_leg(spark, docs, depths):
    """r13 (VERDICT r12 #4): find the merge-count crossover where the
    Arrow serving applier overtakes the staged JVM applier, so the
    'auto' router can switch instead of riding staged's fixed
    per-stage plan cost to 32k. Both appliers timed at each depth over
    the same checkpointed word table, operator-default stage_size
    (256), one JIT warm-up pass at the smallest depth first."""
    from opensea_datapipeline_spark.operators.text import (
        bpe_apply_merges_arrow,
        bpe_apply_merges_fold,
        bpe_apply_merges_staged,
    )

    words = (
        _bpe_word_freq(docs, "text").select("w").localCheckpoint(eager=True)
    )
    rows = synth_merge_rows(max(depths))
    leg = {"leg": "applier_crossover",
           "n_words": words.count(), "ops": []}
    # warm-up: JIT all paths once at the smallest depth, unrecorded
    warm = rows[: min(depths)]
    bpe_apply_merges_staged(words, warm).write.mode(
        "overwrite"
    ).format("noop").save()
    bpe_apply_merges_fold(words, warm).write.mode(
        "overwrite"
    ).format("noop").save()
    bpe_apply_merges_arrow(words, warm).write.mode(
        "overwrite"
    ).format("noop").save()
    for depth in depths:
        sub = rows[:depth]
        for tag, fn in (
            ("staged", lambda: bpe_apply_merges_staged(words, sub)),
            # r16: the broadcast-array fold that replaced staged as the
            # routed JVM mid band — the crossover now compared is
            # fold vs arrow
            ("fold", lambda: bpe_apply_merges_fold(words, sub)),
            ("arrow", lambda: bpe_apply_merges_arrow(words, sub)),
        ):
            _, m = timed(
                spark,
                f"{tag}_{depth}",
                lambda: fn().write.mode("overwrite")
                .format("noop").save(),
            )
            leg["ops"].append(m)
    return leg


def main() -> None:
    scales = [1, 10]
    vocab_sizes = [10_000, 100_000]
    depths = [512, 1024, 2048, 4096]
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            v = a.split("=", 1)[1]
            scales = [int(x) for x in v.split(",")] if v else []
        if a.startswith("--vocab"):
            v = a.split("=", 1)[1]
            vocab_sizes = [int(x) for x in v.split(",")] if v else []
        if a.startswith("--depths"):
            v = a.split("=", 1)[1]
            depths = [int(x) for x in v.split(",")] if v else []
    spark = get_spark(
        "scaling-bpe", extra_configs={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "documents")
    legs = []
    for mult in scales:
        leg = run_leg(spark, verbatim_docs(base, mult), f"corpus_{mult}x")
        print(json.dumps(leg))
        legs.append(leg)
    for mult in [m for m in scales if m > 1]:
        leg = run_leg(spark, scaled_docs(base, mult), f"vocab_{mult}x")
        print(json.dumps(leg))
        legs.append(leg)
    for n in vocab_sizes:
        leg = run_leg(
            spark, synth_vocab_docs(spark, n), f"synth_vocab_{n}"
        )
        print(json.dumps(leg))
        legs.append(leg)
    if depths:
        leg = run_staged_leg(
            spark, synth_vocab_docs(spark, 100_000), depths
        )
        print(json.dumps(leg))
        legs.append(leg)
    prod_depth = 0
    crossover = []
    crossover_words = 20_000
    for a in sys.argv[1:]:
        if a.startswith("--production-depth"):
            prod_depth = int(a.split("=", 1)[1])
        if a.startswith("--crossover-words"):
            crossover_words = int(a.split("=", 1)[1])
        elif a.startswith("--crossover"):
            v = a.split("=", 1)[1]
            crossover = [int(x) for x in v.split(",")] if v else []
    if crossover:
        leg = run_crossover_leg(
            spark, synth_vocab_docs(spark, crossover_words), crossover
        )
        leg["leg"] = f"applier_crossover_{crossover_words}w"
        print(json.dumps(leg))
        legs.append(leg)
    if prod_depth:
        leg = run_production_depth_leg(
            spark, synth_vocab_docs(spark, 20_000), prod_depth
        )
        print(json.dumps(leg))
        legs.append(leg)
    print(json.dumps({"legs": legs}))
    spark.stop()


if __name__ == "__main__":
    main()
