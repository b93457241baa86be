"""Round-13 regression tests: the four ADVICE r12 findings plus the
r13 consolidation seams (artifact integrity, applier router crossover,
incremental-groups job floor)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_dd_collapse_buckets_rejects_bad_max(spark):
    # ADVICE r12: max_buckets < 1 keeps NO ranked bucket, so every row
    # would collapse into a single null-keyed bucket and downstream
    # quantile decode would emit garbage -- fail loudly instead.
    from opensea_datapipeline_spark.operators.sketches import (
        dd_bucket_counts,
        dd_collapse_buckets,
    )

    state = dd_bucket_counts(
        spark.createDataFrame([(1.0,), (2.0,)], "value double"), "value"
    )
    for bad in (0, -1):
        with pytest.raises(ValueError):
            dd_collapse_buckets(state, bad)


def test_pack_with_eos_empty_id_stream(spark):
    # ADVICE r12: a doc with an EMPTY id stream (public-API input;
    # unreachable via bpe_encode) must pack as exactly one EOS id --
    # not concat('', ' <eos>') whose leading space split() explodes
    # into a bogus '' token that shifts every later doc's offset.
    from opensea_datapipeline_spark.operators.text import pack_token_ids

    enc = spark.createDataFrame(
        [(0, 0, ""), (1, 2, "4 5")],
        "doc_id long, n_syms long, ids_str string",
    )
    out = {
        r.seq_id: (r.n_ids, r.n_docs, r.ids_str, r.boundaries_str)
        for r in pack_token_ids(
            enc, seq_len=4, eos_id=9, with_boundaries=True
        ).collect()
    }
    # streams: doc0 [9], doc1 [4 5 9] -> one full sequence "9 4 5 9"
    assert out == {0: (4, 2, "9 4 5 9", "0 1")}


def test_bpe_appliers_identical_on_unicode_line_separators(spark):
    # ADVICE r12: Java regex '.' (the project/staged render) skips ALL
    # line terminators (LF CR U+0085 U+2028 U+2029); Python re's '.'
    # skips only LF. Words carrying Unicode line separators -- which
    # the Java \\s+ normalization does NOT strip -- must segment
    # identically across all three appliers.
    from opensea_datapipeline_spark.operators.text import (
        bpe_apply_merges,
        bpe_apply_merges_arrow,
        bpe_apply_merges_staged,
    )

    words = [
        "a\u2028b",
        "x\u0085y",
        "p\u2029q",
        "a\rb",
        "ab",
        "plain",
        "\u2028",
    ]
    wdf = spark.createDataFrame([(w,) for w in words], "w string")
    rows = [
        {"left_sym": "a", "right_sym": "b", "merged": "ab"},
        {"left_sym": "p", "right_sym": "q", "merged": "pq"},
    ]
    base = {r.w: r.syms for r in bpe_apply_merges(wdf, rows).collect()}
    staged = {
        r.w: r.syms
        for r in bpe_apply_merges_staged(
            wdf, rows, stage_size=1
        ).collect()
    }
    arrow = {
        r.w: r.syms
        for r in bpe_apply_merges_arrow(wdf, rows).collect()
    }
    assert staged == base
    assert arrow == base
    # non-vacuous: the plain word actually merged
    assert base["ab"] == ["ab"]


def test_streaming_corpus_dedup_keeps_null_text_singletons(
    spark, tmp_path
):
    # ADVICE r12: null-text docs must survive the streaming loop as
    # singleton rows in the final assignment (they produce no bands
    # and no pairs), matching the batch fold and the closure oracle --
    # not silently vanish from the state.
    from opensea_datapipeline_spark.streaming.corpus_dedup import (
        run_streaming_corpus_dedup,
    )

    rows_by_batch = [
        [(0, "alpha beta gamma delta"), (1, None)],
        [(2, "alpha beta gamma delta"), (3, None)],
    ]
    src = str(tmp_path / "src")
    for rows in rows_by_batch:
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)

    got_df = run_streaming_corpus_dedup(
        spark, src, str(tmp_path / "state"), str(tmp_path / "ckpt"),
        jaccard_threshold=0.5,
    )
    got = {r.id: r.group_id for r in got_df.collect()}
    assert got == {0: 0, 1: 1, 2: 0, 3: 3}
