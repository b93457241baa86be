"""Round-7 tests: probed-list partition pruning, residual IVF-PQ,
index staleness policy, and probe id-type generality (VERDICT r6 #2/#4/#6
+ ADVICE r6)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _emb(spark, lo=0, hi=200):
    from opensea_datapipeline_spark.sources.readers import load_table

    return (
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        .select("vec_id", "embedding")
    )


def _result_set(df):
    return {(r.query_id, r.neighbor_id, r.rank) for r in df.collect()}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _probed_partition_ids(plan: str) -> set[int]:
    """Partition-filter list ids a probe's codes/assignments scan will
    read — accepts both the IN-set and the single-value equality form
    Catalyst simplifies a one-element isin to."""
    m = re.search(r"PartitionFilters: \[[^\]]*list_id#\d+ IN \(([^)]*)\)", plan)
    if m:
        return {int(x) for x in m.group(1).split(",")}
    m = re.search(r"PartitionFilters: \[[^\]]*list_id#\d+ = (\d+)", plan)
    assert m, f"no list_id partition filter in plan:\n{plan[:2000]}"
    return {int(m.group(1))}


# ---------------------------------------------------------------------------
# VERDICT r6 #2 — the probed-list union pushes into the persisted scan as a
# partition filter, so a probe reads n_probe/n_lists of the corpus FILES.
# ---------------------------------------------------------------------------


def test_ivfpq_persisted_probe_prunes_partition_files(spark, tmp_path):
    from opensea_datapipeline_spark.operators import ann_index as ai

    emb = _emb(spark)
    idx = ai.build_ivfpq_index(emb, "vec_id", "embedding", n_lists=8, m=8, k=16)
    path = str(tmp_path / "ivfpq")
    ai.write_ivfpq_index(idx, path)
    loaded = ai.read_ivfpq_index(spark, path)
    queries = emb.filter(F.col("vec_id") < 3)

    res = ai.ivfpq_probe(loaded, queries, k=5, n_probe=2)
    probed = _probed_partition_ids(_plan(res))
    # 3 queries x 2 probes can touch at most 6 of the 8 lists
    assert 0 < len(probed) <= 6

    # file-level proof: the same partition filter prunes the parquet scan
    full = spark.read.parquet(f"{path}/codes")
    pruned = full.filter(F.col("list_id").isin([int(l) for l in probed]))
    n_full = full.select(F.input_file_name()).distinct().count()
    n_pruned = pruned.select(F.input_file_name()).distinct().count()
    assert n_full == 8  # one file per list partition at this size
    assert n_pruned == len(probed) < n_full

    # pruning must not change answers: persisted probe == in-memory probe
    assert _result_set(res) == _result_set(
        ai.ivfpq_probe(idx, queries, k=5, n_probe=2)
    )
    assert len(_result_set(res)) > 0


def test_ivfpq_probe_partition_filter_scales_with_n_probe(spark, tmp_path):
    from opensea_datapipeline_spark.operators import ann_index as ai

    emb = _emb(spark)
    idx = ai.build_ivfpq_index(emb, "vec_id", "embedding", n_lists=8, m=8, k=16)
    path = str(tmp_path / "ivfpq")
    ai.write_ivfpq_index(idx, path)
    loaded = ai.read_ivfpq_index(spark, path)
    one_query = emb.filter(F.col("vec_id") == 7)

    sizes = {}
    for n_probe in (1, 3, 8):
        plan = _plan(ai.ivfpq_probe(loaded, one_query, k=5, n_probe=n_probe))
        sizes[n_probe] = len(_probed_partition_ids(plan))
    # one query probes exactly n_probe lists: files read scale with
    # n_probe, NOT with n_lists
    assert sizes == {1: 1, 3: 3, 8: 8}


def test_ivf_persisted_probe_prunes_and_matches_unpruned(spark, tmp_path):
    from opensea_datapipeline_spark.operators import ann_index as ai

    emb = _emb(spark)
    idx = ai.build_ivf_index(emb, "vec_id", "embedding", n_lists=8)
    path = str(tmp_path / "ivf")
    ai.write_ivf_index(idx, path)
    loaded = ai.read_ivf_index(spark, path)
    queries = emb.filter(F.col("vec_id") < 5)

    res = ai.ivf_probe(loaded, queries, k=5, n_probe=2)
    probed = _probed_partition_ids(_plan(res))
    assert 0 < len(probed) <= 8

    # the filter is an optimization, never a semantic change
    assert _result_set(res) == _result_set(
        ai.ivf_probe(loaded, queries, k=5, n_probe=2, prune_scan=False)
    )
    assert len(_result_set(res)) > 0


# ---------------------------------------------------------------------------
# ADVICE r6 — pq/ivfpq probes must work for any join-able id type, like the
# lsh/ivf paths already did.
# ---------------------------------------------------------------------------


def test_pq_and_ivfpq_probe_string_ids(spark):
    from opensea_datapipeline_spark.operators import ann_index as ai

    emb = _emb(spark).select(
        F.concat(F.lit("doc_"), F.format_string("%04d", "vec_id")).alias(
            "doc_id"
        ),
        "embedding",
    )
    queries = emb.filter(F.col("doc_id") < "doc_0005")

    pq = ai.build_pq_index(emb, "doc_id", "embedding", m=8, k=16)
    res = ai.pq_probe(pq, queries, k=5, id_col="doc_id")
    assert dict(res.dtypes)["query_id"] == "string"
    rows = res.collect()
    assert len(rows) == 5 * 5
    assert all(r.neighbor_id.startswith("doc_") for r in rows)

    ivfpq = ai.build_ivfpq_index(
        emb, "doc_id", "embedding", n_lists=4, m=8, k=16
    )
    res2 = ai.ivfpq_probe(ivfpq, queries, k=5, id_col="doc_id", n_probe=4)
    assert dict(res2.dtypes)["neighbor_id"] == "string"
    assert res2.count() == 5 * 5


def test_ivf_sampled_training_build(spark):
    # train_rows: quantizer trained on a deterministic sample, corpus
    # assigned by the Arrow matmul — full coverage, argmin-consistent
    # assignments, planted twins still surface
    from opensea_datapipeline_spark.operators import ann_index as ai

    corpus = _twin_corpus(spark)
    idx = ai.build_ivf_index(
        corpus, "vec_id", "embedding", n_lists=8, train_rows=100
    )
    assert idx.assignments.count() == 350
    reassigned = ai._assign_to_centroids(
        idx.assignments.select("id", "vec"), idx.centroids
    )
    assert (
        idx.assignments.select("id", "list_id")
        .exceptAll(reassigned.select("id", "list_id"))
        .count()
        == 0
    )
    res = ai.ivf_probe(idx, corpus.filter(F.col("vec_id") < 50), k=5, n_probe=3)
    hits = res.filter(F.col("neighbor_id") == F.col("query_id") + 10_000).count()
    assert hits >= 45

    sem = {
        (r.id_a, r.id_b)
        for r in __import__(
            "opensea_datapipeline_spark.operators.dedup", fromlist=["dedup"]
        ).semdedup_pairs(
            corpus, n_clusters=8, threshold=0.9, train_rows=100
        ).collect()
    }
    assert sum(1 for a, b in sem if b == a + 10_000) >= 45


def test_pq_and_ivfpq_probe_empty_query_batch(spark):
    from opensea_datapipeline_spark.operators import ann_index as ai

    emb = _emb(spark, hi=100)
    none = emb.filter(F.col("vec_id") < 0)
    pq = ai.build_pq_index(emb, "vec_id", "embedding", m=8, k=16)
    assert ai.pq_probe(pq, none, k=5).count() == 0
    ivfpq = ai.build_ivfpq_index(emb, "vec_id", "embedding", n_lists=4, m=8, k=16)
    res = ai.ivfpq_probe(ivfpq, none, k=5)
    assert res.count() == 0
    assert set(res.columns) == {"query_id", "neighbor_id", "sim", "rank"}


def test_pq_build_rejects_undersized_training_sample(spark):
    from opensea_datapipeline_spark.operators import ann_index as ai

    tiny = _emb(spark, hi=10)  # 10 rows < k=16
    with pytest.raises(ValueError, match="sample_size"):
        ai.build_pq_index(tiny, "vec_id", "embedding", m=8, k=16)


# ---------------------------------------------------------------------------
# VERDICT r6 #4 — residual encoding for IVF-PQ.
# ---------------------------------------------------------------------------


def test_ivfpq_residual_full_probe_recall_beats_raw(spark):
    from opensea_datapipeline_spark.operators import ann_index as ai
    from opensea_datapipeline_spark.operators.similarity import knn_topk_exact

    emb = _emb(spark, hi=400)
    queries = emb.filter(F.col("vec_id") < 40)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_topk_exact(
            emb, "vec_id", "embedding", k=10, queries=queries
        ).collect()
    }

    def recall(residual: bool) -> float:
        idx = ai.build_ivfpq_index(
            emb, "vec_id", "embedding", n_lists=8, m=8, k=16,
            residual=residual,
        )
        got = {
            (r.query_id, r.neighbor_id)
            for r in ai.ivfpq_probe(idx, queries, k=10, n_probe=8).collect()
        }
        return len(got & exact) / len(exact)

    raw, res = recall(False), recall(True)
    # deterministic on this data+seed (measured 0.2875 vs 0.3150):
    # residual codebooks spend the same m x k budget on a smaller cell
    assert res > raw


def test_ivfpq_residual_planted_twin_recall(spark):
    from opensea_datapipeline_spark.operators import ann_index as ai

    emb = _emb(spark, hi=300)
    twins = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * (1.0 + 0.3 * F.sin(i.cast("double") + 1.0)),
        ).cast("array<float>").alias("embedding"),
    )
    corpus = emb.unionByName(twins)
    idx = ai.build_ivfpq_index(
        corpus, "vec_id", "embedding", n_lists=8, m=8, k=16, residual=True
    )
    res = ai.ivfpq_probe(
        idx, corpus.filter(F.col("vec_id") < 50), k=10, n_probe=4
    )
    hits = res.filter(
        F.col("neighbor_id") == F.col("query_id") + 10_000
    ).count()
    assert hits >= 45
    assert res.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_ivfpq_residual_roundtrip_and_persisted_append(spark, tmp_path):
    from opensea_datapipeline_spark.operators import ann_index as ai

    emb = _emb(spark)
    delta = _emb(spark, lo=200, hi=260)
    queries = emb.filter(F.col("vec_id") < 10)
    idx = ai.build_ivfpq_index(
        emb, "vec_id", "embedding", n_lists=8, m=8, k=16, residual=True
    )
    path = str(tmp_path / "ivfpq_res")
    ai.write_ivfpq_index(idx, path)

    loaded = ai.read_ivfpq_index(spark, path)
    assert loaded.residual is True
    want = _result_set(ai.ivfpq_probe(idx, queries, k=5, n_probe=3))
    assert _result_set(ai.ivfpq_probe(loaded, queries, k=5, n_probe=3)) == want
    assert len(want) > 0

    # persisted append must equal the in-memory append (same frozen
    # centroids + books -> same residual codes)
    ai.append_ivfpq_index_at(spark, path, delta, "vec_id", "embedding")
    reloaded = ai.read_ivfpq_index(spark, path)
    in_mem = ai.append_ivfpq_index(idx, delta, "vec_id", "embedding")
    assert _result_set(
        ai.ivfpq_probe(reloaded, queries, k=5, n_probe=3)
    ) == _result_set(ai.ivfpq_probe(in_mem, queries, k=5, n_probe=3))


# ---------------------------------------------------------------------------
# VERDICT r6 #3 — the bench delta chain survives the driver's tail
# truncation via the committed BENCH_LOCAL_rNN.json full records.
# ---------------------------------------------------------------------------


def test_bench_prev_queries_prefers_committed_local_record():
    import glob
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    prior = sorted(
        glob.glob("/root/repo/BENCH_r*.json"), key=bench._round_num
    )
    assert bench._round_num(prior[-1]) >= 6
    recs = bench._load_recs(prior)
    prev = bench._prev_queries(recs, prior)
    tail_q = bench._tail_obj(recs[-1], "queries")
    if tail_q:
        # driver record intact — it wins over the local copy
        assert prev == tail_q
    else:
        # the r6-style truncation lost `queries` AND `vs_prev`; without
        # the committed local record the chain would be empty
        n_local = bench._round_num(prior[-1])
        with open(f"/root/repo/BENCH_LOCAL_r{n_local:02d}.json") as f:
            local = json.load(f)["queries"]
        assert prev == local
    assert len(prev) >= 20


# ---------------------------------------------------------------------------
# VERDICT r6 #5 — CJK language ID via character-bigram profiles.
# ---------------------------------------------------------------------------


def test_language_id_cjk_classifies_planted_docs(spark, sf_dir):
    # the graded query's plants must actually classify as their language —
    # the falsifiability standard applied to embedding_near_dup in r6
    from opensea_datapipeline_spark.queries import QUERIES

    out = QUERIES["language_id_cjk"](spark, sf_dir)
    preds = {r.doc_id: r.predicted_lang for r in out.collect()}
    assert len(preds) > 0
    planted = {0: "zh", 1: "ja", 2: "ko"}
    checked = 0
    for doc_id, lang in preds.items():
        if doc_id % 20 in planted:
            assert lang == planted[doc_id % 20], (doc_id, lang)
            checked += 1
    assert checked >= 3  # at least one planted doc per language at sf0.001


def test_language_id_cjk_mixed_and_ascii_docs(spark):
    from opensea_datapipeline_spark.operators.text import language_id_cjk

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and it was good"),
        (2, "我们知道这个问题，但是没有时候处理，所以现在可以等。"),
        (3, "これはテストです。データがありますから、してください。"),
        (4, "우리는 지금 테스트를 하고 있습니다. 문제가 없습니다."),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: r.predicted_lang for r in language_id_cjk(df).collect()}
    assert got[1] == "en" and got[2] == "zh" and got[3] == "ja" and got[4] == "ko"
    # all-zero tie resolves to the alphabetically-first profiled language
    from opensea_datapipeline_spark.operators.text import (
        CJK_BIGRAM_PROFILES, LANG_PROFILES,
    )

    assert got[5] == sorted(set(LANG_PROFILES) | set(CJK_BIGRAM_PROFILES))[0]


def test_language_id_cjk_rejects_non_bigram_profile(spark):
    from opensea_datapipeline_spark.operators.text import language_id_cjk

    df = spark.createDataFrame([(1, "x")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="non-bigram"):
        language_id_cjk(df, cjk_profiles={"ja": ["です", "ました"]})


# ---------------------------------------------------------------------------
# VERDICT r6 #6 — staleness policy: append counters in meta + a rebuild
# trigger, backed by a measured recall decay from drifted appends.
# ---------------------------------------------------------------------------


def test_index_staleness_lifecycle_counters(spark, tmp_path):
    from opensea_datapipeline_spark.operators import ann_index as ai

    emb = _emb(spark)
    idx = ai.build_ivf_index(emb, "vec_id", "embedding", n_lists=4)
    path = str(tmp_path / "ivf")
    ai.write_ivf_index(idx, path)

    s0 = ai.index_staleness(spark, path)
    assert s0["n_appends"] == 0 and s0["n_appended"] == 0
    assert s0["n_base"] == 200
    assert s0["delta_fraction"] == 0.0
    assert s0["rebuild_recommended"] is False

    ai.append_ivf_index_at(spark, path, _emb(spark, lo=200, hi=230))
    s1 = ai.index_staleness(spark, path)
    assert s1["n_appends"] == 1 and s1["n_appended"] == 30
    assert s1["rebuild_recommended"] is False  # 30/230 ~ 0.13 < 0.2

    ai.append_ivf_index_at(spark, path, _emb(spark, lo=230, hi=300))
    s2 = ai.index_staleness(spark, path)
    assert s2["n_appends"] == 2 and s2["n_appended"] == 100
    assert s2["delta_fraction"] == pytest.approx(100 / 300, abs=1e-6)
    assert s2["rebuild_recommended"] is True  # 0.33 > 0.2
    assert "rebuild_threshold" in s2 and "exceeds" in s2["reason"]

    # idempotent re-append adds nothing but still counts as an append
    ai.append_ivf_index_at(spark, path, _emb(spark, lo=230, hi=300))
    s3 = ai.index_staleness(spark, path)
    assert s3["n_appends"] == 3 and s3["n_appended"] == 100


def test_pq_and_ivfpq_append_bump_staleness_counters(spark, tmp_path):
    from opensea_datapipeline_spark.operators import ann_index as ai

    emb = _emb(spark)
    pq = ai.build_pq_index(emb, "vec_id", "embedding", m=8, k=16)
    pq_path = str(tmp_path / "pq")
    ai.write_pq_index(pq, pq_path)
    ai.append_pq_index_at(spark, pq_path, _emb(spark, lo=200, hi=260))
    s = ai.index_staleness(spark, pq_path)
    assert s["kind"] == "pq" and s["n_appends"] == 1
    assert s["n_base"] == 200 and s["n_appended"] == 60

    ivfpq = ai.build_ivfpq_index(emb, "vec_id", "embedding", n_lists=4, m=8, k=16)
    iv_path = str(tmp_path / "ivfpq")
    ai.write_ivfpq_index(ivfpq, iv_path)
    ai.append_ivfpq_index_at(spark, iv_path, _emb(spark, lo=200, hi=300))
    s2 = ai.index_staleness(spark, iv_path)
    assert s2["kind"] == "ivfpq" and s2["n_appends"] == 1
    assert s2["n_base"] == 200 and s2["n_appended"] == 100
    assert s2["delta_fraction"] == pytest.approx(100 / 300, abs=1e-6)
    assert s2["rebuild_recommended"] is True


def test_lsh_staleness_never_recommends_rebuild(spark, tmp_path):
    from opensea_datapipeline_spark.operators import ann_index as ai

    emb = _emb(spark, hi=100)
    idx = ai.build_lsh_index(emb, "vec_id", "embedding")
    path = str(tmp_path / "lsh")
    ai.write_lsh_index(idx, path)
    ai.append_lsh_index_at(spark, path, _emb(spark, lo=100, hi=300))
    s = ai.index_staleness(spark, path)
    assert s["n_appends"] == 1 and s["n_appended"] == 200
    assert s["delta_fraction"] == pytest.approx(200 / 300, abs=1e-6)
    # appends are bit-identical to a rebuild for LSH — no drift to fix
    assert s["rebuild_recommended"] is False and "exact" in s["reason"]


def test_legacy_meta_without_counters_degrades_gracefully(spark, tmp_path):
    from opensea_datapipeline_spark.operators import ann_index as ai

    emb = _emb(spark, hi=100)
    idx = ai.build_ivf_index(emb, "vec_id", "embedding", n_lists=4)
    path = str(tmp_path / "ivf")
    ai.write_ivf_index(idx, path)
    # simulate a pre-r7 index: meta without lifecycle counters
    meta = ai._read_meta(spark, path, "ivf")
    meta.update(n_appends=None, n_base=None, n_appended=None)
    ai._write_meta(spark, path, meta)

    s = ai.index_staleness(spark, path)
    assert s["delta_fraction"] is None
    assert s["rebuild_recommended"] is False
    assert "predates" in s["reason"]

    # the first counted append adopts the pre-append total as n_base
    ai.append_ivf_index_at(spark, path, _emb(spark, lo=100, hi=150))
    s1 = ai.index_staleness(spark, path)
    assert s1["n_base"] == 100 and s1["n_appended"] == 50
    assert s1["n_appends"] == 1


def test_cli_residual_build_and_stale_report(spark, tmp_path, capsys):
    import json

    from opensea_datapipeline_spark.__main__ import main
    from opensea_datapipeline_spark.operators import ann_index as ai

    emb_path = str(tmp_path / "emb.parquet")
    _emb(spark, hi=100).write.parquet(emb_path)
    idx_path = str(tmp_path / "idx")
    assert main([
        "index", "build", "--kind", "ivfpq", "--path", idx_path,
        "--embeddings", emb_path, "--residual",
    ]) == 0
    assert ai.read_ivfpq_index(spark, idx_path).residual is True

    assert main([
        "index", "stale", "--kind", "ivfpq", "--path", idx_path,
    ]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["kind"] == "ivfpq"
    assert report["rebuild_recommended"] is False


def test_streaming_ingest_appends_persisted_ivfpq_index(spark, tmp_path):
    # the r6 streaming-ingest shape extended to the composed index:
    # micro-batches append into the persisted residual IVF-PQ via
    # foreachBatch (frozen centroids + codebooks -> encoding a batch is
    # a pure per-row function, so the streamed index equals an in-memory
    # append over the concatenated delta), and the staleness counters
    # count one append per micro-batch.
    import os

    from opensea_datapipeline_spark.operators import ann_index as ai

    emb = _emb(spark)
    seed_part = emb.filter(F.col("vec_id") < 80)
    stream_dir = str(tmp_path / "arrivals")
    os.makedirs(stream_dir)
    emb.filter((F.col("vec_id") >= 80) & (F.col("vec_id") < 140)).write.parquet(
        stream_dir + "/b0"
    )
    emb.filter(F.col("vec_id") >= 140).write.parquet(stream_dir + "/b1")

    path = str(tmp_path / "ivfpq_index")
    idx0 = ai.build_ivfpq_index(
        seed_part, "vec_id", "embedding", n_lists=4, m=8, k=16,
        residual=True, sample_size=80,
    )
    ai.write_ivfpq_index(idx0, path)

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir + "/b*")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch_df, _id: ai.append_ivfpq_index_at(
                spark, path, batch_df, "vec_id", "embedding"
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    loaded = ai.read_ivfpq_index(spark, path)
    assert loaded.residual is True
    assert loaded.codes.count() == emb.count()
    stale = ai.index_staleness(spark, path)
    assert stale["n_appends"] == 2 and stale["n_appended"] == 120

    in_mem = ai.append_ivfpq_index(
        idx0, emb.filter(F.col("vec_id") >= 80), "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    assert _result_set(
        ai.ivfpq_probe(loaded, queries, k=5, n_probe=2)
    ) == _result_set(ai.ivfpq_probe(in_mem, queries, k=5, n_probe=2))


# ---------------------------------------------------------------------------
# SemDeDup: cluster-then-within-cluster exact pairs (Abbas et al. 2023).
# ---------------------------------------------------------------------------


def _twin_corpus(spark, n=300, n_twins=50):
    emb = _emb(spark, hi=n)
    twins = emb.filter(F.col("vec_id") < n_twins).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * (1.0 + 0.3 * F.sin(i.cast("double") + 1.0)),
        ).cast("array<float>").alias("embedding"),
    )
    return emb.unionByName(twins)


def test_semdedup_matches_bruteforce_within_clusters(spark):
    # completeness within the clustering: the pairs must be EXACTLY the
    # exact-cosine pairs restricted to same-cluster membership
    from opensea_datapipeline_spark.operators import dedup as dd
    from opensea_datapipeline_spark.operators.ann_index import (
        _l2_normalized, build_ivf_index,
    )

    corpus = _twin_corpus(spark)
    base = corpus.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    idx = build_ivf_index(_l2_normalized(base), "id", "vec", n_lists=8)
    got = {
        (r.id_a, r.id_b)
        for r in dd.semdedup_pairs(
            corpus, n_clusters=8, threshold=0.9, index=idx
        ).collect()
    }
    lists = idx.assignments.select("id", "list_id")
    exact = dd.embedding_near_dup_pairs(corpus, "vec_id", "embedding", 0.9)
    same_cluster = (
        exact.join(lists.withColumnRenamed("id", "id_a")
                        .withColumnRenamed("list_id", "la"), "id_a")
        .join(lists.withColumnRenamed("id", "id_b")
                   .withColumnRenamed("list_id", "lb"), "id_b")
        .filter(F.col("la") == F.col("lb"))
    )
    want = {(r.id_a, r.id_b) for r in same_cluster.collect()}
    assert got == want and len(got) >= 45


def test_semdedup_keep_drops_twins_keeps_reps(spark):
    from opensea_datapipeline_spark.operators import dedup as dd

    corpus = _twin_corpus(spark)
    keep = dd.semdedup_keep(corpus, n_clusters=8, threshold=0.9).collect()
    kept = {r.id for r in keep if r.keep}
    dropped = [r for r in keep if not r.keep]
    assert len(keep) == 350
    # every dropped id's representative is kept, and reps are group minima
    assert all(r.group_id in kept and r.group_id < r.id for r in dropped)
    # twins (min-id original wins) dominate the drops
    assert sum(1 for r in dropped if r.id >= 10_000) >= 45


def test_semdedup_multi_assign_superset_and_unique(spark):
    # n_assign=2 compares everything n_assign=1 does (first assignment
    # is the argmin) plus boundary pairs; rediscoveries collapse to one
    # row per pair
    from opensea_datapipeline_spark.operators import dedup as dd

    corpus = _twin_corpus(spark)
    p1 = {
        (r.id_a, r.id_b)
        for r in dd.semdedup_pairs(corpus, n_clusters=8, threshold=0.9).collect()
    }
    df2 = dd.semdedup_pairs(corpus, n_clusters=8, threshold=0.9, n_assign=2)
    rows2 = df2.collect()
    p2 = {(r.id_a, r.id_b) for r in rows2}
    assert p1 <= p2 and len(p1) >= 45
    assert len(rows2) == len(p2)  # no duplicate pair rows


def test_semdedup_cluster_cap_fails_loudly(spark):
    import pytest as _pytest

    from opensea_datapipeline_spark.operators import dedup as dd

    corpus = _twin_corpus(spark)
    with _pytest.raises(Exception, match="max_cluster_rows"):
        dd.semdedup_pairs(
            corpus, n_clusters=2, threshold=0.9, max_cluster_rows=10
        ).collect()


def test_semdedup_string_ids(spark):
    from opensea_datapipeline_spark.operators import dedup as dd

    corpus = _twin_corpus(spark, n=100, n_twins=10).select(
        F.concat(F.lit("d"), F.format_string("%06d", "vec_id")).alias("doc_id"),
        "embedding",
    )
    pairs = dd.semdedup_pairs(
        corpus, id_col="doc_id", vec_col="embedding", n_clusters=4,
        threshold=0.9,
    )
    rows = pairs.collect()
    assert len(rows) >= 9
    assert all(r.id_a < r.id_b and r.id_a.startswith("d") for r in rows)


def test_staleness_drifted_appends_decay_recall(spark, tmp_path):
    """The policy's justification, measured: a drifted append under
    frozen centroids+codebooks loses recall vs a rebuild over the union
    (prototyped at 0.3133 vs 0.3833 on this data+seed), and by then the
    meta-driven staleness report already recommends the rebuild."""
    from opensea_datapipeline_spark.operators import ann_index as ai
    from opensea_datapipeline_spark.operators.similarity import knn_topk_exact

    emb = _emb(spark)
    # drifted regime: alternating stretch decorrelates the distribution
    # the codebooks were trained on
    drift = _emb(spark, lo=200, hi=400).select(
        (F.col("vec_id") + 5000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * F.when(i % 2 == 0, 4.0).otherwise(-0.5),
        ).cast("array<float>").alias("embedding"),
    )
    union = emb.unionByName(drift)
    queries = drift.filter(F.col("vec_id") < 5260)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_topk_exact(
            union, "vec_id", "embedding", k=10, queries=queries
        ).collect()
    }

    def recall(idx) -> float:
        got = {
            (r.query_id, r.neighbor_id)
            for r in ai.ivfpq_probe(idx, queries, k=10, n_probe=4).collect()
        }
        return len(got & exact) / len(exact)

    base = ai.build_ivfpq_index(emb, "vec_id", "embedding", n_lists=8, m=8, k=16)
    path = str(tmp_path / "ivfpq")
    ai.write_ivfpq_index(base, path)
    ai.append_ivfpq_index_at(spark, path, drift, "vec_id", "embedding")

    stale = ai.index_staleness(spark, path)
    assert stale["delta_fraction"] == pytest.approx(0.5, abs=1e-6)
    assert stale["rebuild_recommended"] is True

    appended_recall = recall(ai.read_ivfpq_index(spark, path))
    rebuilt_recall = recall(
        ai.build_ivfpq_index(union, "vec_id", "embedding", n_lists=8, m=8, k=16)
    )
    assert rebuilt_recall > appended_recall + 0.03, (
        f"expected a clear decay: appended={appended_recall}, "
        f"rebuilt={rebuilt_recall}"
    )


def test_rerank_depth_is_the_recall_lever_on_structured_corpus(spark):
    # r8 SCALING finding pinned: on a corpus with smooth local neighbor
    # structure (per-cluster 1-D manifold), ADC at 32-bit codes cannot
    # rank within-cluster fine structure — float rerank depth (overfetch)
    # is what buys recall, and deeper rerank strictly helps.
    from opensea_datapipeline_spark.operators import ann_index as ai
    from opensea_datapipeline_spark.operators.similarity import knn_topk_exact

    n_vec, n_groups, dim = 2000, 10, 32
    g = (F.col("vec_id") % n_groups).cast("double")
    t = (F.floor(F.col("vec_id") / n_groups).cast("double")
         / F.lit(n_vec / n_groups - 1.0) - 0.5) * 2.0
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    vec = F.transform(
        dims,
        lambda d: (
            F.sin((g + 1.0) * (d.cast("double") + 1.0) * 2.39996 + g * 1.3)
            + 1.5 * t * F.sin(
                (g + 1.0) * (d.cast("double") + 1.0) * 1.93 + g * 0.7 + 2.1)
            + 0.15 * F.sin(
                F.col("vec_id").cast("double") * 0.7717
                + d.cast("double") * 1.111)
        ),
    )
    emb = (
        spark.range(n_vec).select(F.col("id").alias("vec_id"))
        .select("vec_id", vec.cast("array<float>").alias("embedding"))
    ).localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_topk_exact(
            emb, "vec_id", "embedding", k=10, queries=queries
        ).collect()
    }
    idx = ai.build_ivfpq_index(
        emb, "vec_id", "embedding", n_lists=16, m=8, k=16
    )

    def recall(overfetch):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ai.ivfpq_probe(
                idx, queries, k=10, n_probe=2,
                rerank_with=emb if overfetch else None,
                overfetch=max(overfetch, 1),
            ).collect()
        }
        return len(got & exact) / len(exact)

    r0, r4, r16 = recall(0), recall(4), recall(16)
    assert r16 > r4 > r0
    assert r16 >= 0.8
