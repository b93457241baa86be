"""Streaming document ingest through a persisted BPE tokenizer — the
band-table / ANN-index streaming discipline applied to the third
persisted artifact the repo ships (VERDICT r13 #6): documents arrive,
each micro-batch ENCODES them from the frozen artifact and appends the
token-id rows to the encoded store, OOV counters accumulate across
batches (``tokenizer_staleness`` semantics, kept in the loop meta so
the signal survives restarts), and once the cumulative OOV rate
crosses the threshold the loop itself fires the RETRAIN → atomic
artifact version publish → full re-encode, exactly the lifecycle a
pretraining data tier runs (a frozen tokenizer encodes anything, but
characters its training corpus never saw become ``oov_id`` — recall
``bpe_encode``'s staleness contract).

Store layout under ``state_dir``::

    tokenizer_v{K}/  the persisted artifact (bpe_write_tokenizer
                     layout: merges / alphabet / meta)
    encoded_v{K}/    the encoded corpus for artifact version K —
                     appends mutate the CURRENT version in place
                     (idempotent: the append anti-joins doc ids);
                     a RETRAIN publishes BOTH dirs at K+1 atomically
    meta.json        {last_batch_id, version, retrains, n_syms, n_oov}
                     (counters are since-last-retrain)

Why the retrain re-encodes: token ids are a function of the artifact
(alphabet order + merge ranks), so rows encoded under v{K} and v{K+1}
must never mix in one training shard. The retrain therefore re-encodes
the full source directory into ``encoded_v{K+1}`` — the corpus-sized
job, paid at threshold cadence — keeping the invariant that the
encoded store always equals a one-shot ``bpe_encode`` of the ingested
corpus under the CURRENT artifact. (The source directory is the
corpus of record here for the same reason it is for the PQ rebuild:
the encoded rows are not invertible without the boundary marker.)

Crash-window discipline (ann_ingest's, re-applied):

- the encoded append lands BEFORE the meta's batch-id bump, so a
  replayed batch re-appends as a no-op (doc-id anti-join);
- a retrain publishes ``tokenizer_v{K+1}`` then ``encoded_v{K+1}``
  via tmp-dir + atomic rename, and only then moves the meta pointer —
  the meta never points at an incomplete artifact or store;
- superseded versions are removed only AFTER the meta commit, and a
  per-batch sweep clears any versioned dir whose version differs from
  the committed meta's (the ADVICE r13 orphan window).

First batch runs the same code path: no meta → the batch itself trains
the tokenizer and publishes version 0, then encodes through it.

At 100 TB the economics: per-trigger cost is one encode pass over the
BATCH (distinct-word segmentation + a doc-keyed shuffle) plus a
doc-id-column anti-join read; the staleness aggregate is over the
pinned batch delta only; the retrain+re-encode — the only corpus-sized
job — runs at the cadence genuine alphabet drift dictates.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import (
    bpe_alphabet,
    bpe_encode,
    bpe_read_tokenizer,
    bpe_train,
    bpe_write_tokenizer,
    tokenizer_staleness,
)
from ..sources.readers import ensure_reader_confs
from .gold import _read_meta, _write_meta

_TOK = "tokenizer_v{v}"
_ENC = "encoded_v{v}"


def _vdir(state_dir: str, template: str, version: int) -> str:
    return os.path.join(state_dir, template.format(v=version))


def _publish_dir(state_dir: str, template: str, version: int, write) -> str:
    """``write(tmp_path)`` then atomic rename to the versioned name;
    clears any orphan of a crashed earlier attempt."""
    final = _vdir(state_dir, template, version)
    tmp = os.path.join(state_dir, "_tmp_" + template.format(v=version))
    shutil.rmtree(tmp, ignore_errors=True)
    write(tmp)
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)
    return final


def _sweep_orphans(state_dir: str, keep_version: int) -> None:
    """Remove versioned dirs (tokenizer/encoded, tmp or final) whose
    version != the committed meta's — the crash window between the meta
    commit and the superseded versions' rmtree would otherwise leak one
    artifact + one encoded-corpus copy per crashed retrain."""
    try:
        entries = os.listdir(state_dir)
    except OSError:
        return
    pat = re.compile(r"^(?:_tmp_)?(?:tokenizer|encoded)_v(\d+)$")
    for name in entries:
        m = pat.match(name)
        if m and int(m.group(1)) != keep_version:
            shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)


def run_streaming_tokenizer_ingest(
    spark: SparkSession,
    docs_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 16,
    min_count: int = 2,
    marker: str | None = None,
    oov_id: int = -1,
    retrain_threshold: float = 0.001,
    merge_applier: str = "auto",
    max_files_per_trigger: int = 1,
    on_batch=None,
) -> dict:
    """Stream ``docs_dir`` (AvailableNow) through the persisted
    tokenizer at ``state_dir``; returns the final loop meta (incl.
    ``tokenizer_dir`` / ``encoded_dir`` for the current version).
    ``on_batch(batch_id, wall_s, retrained)`` is the per-batch monitor
    hook. Doc ids must be globally unique across the stream (the
    append's anti-join contract).

    ``retrain_threshold`` is the cumulative-since-last-retrain OOV
    rate that fires the retrain (``tokenizer_staleness``'s rule, held
    in the loop meta): genuine alphabet drift hits every occurrence of
    an unseen character and clears it quickly; a stray corrupt byte
    does not."""
    ensure_reader_confs(spark)
    schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def train_publish(docs: DataFrame, version: int) -> None:
        merges = bpe_train(
            docs, n_merges=n_merges, min_count=min_count,
            text_col=text_col, marker=marker,
        )
        alpha = bpe_alphabet(docs, text_col=text_col, marker=marker)
        _publish_dir(
            state_dir, _TOK, version,
            lambda tmp: bpe_write_tokenizer(merges, alpha, tmp, marker=marker),
        )

    def encode_with(version: int, docs: DataFrame) -> DataFrame:
        merges, alpha, mk = bpe_read_tokenizer(
            spark, _vdir(state_dir, _TOK, version)
        )
        return bpe_encode(
            docs, merges, id_col=id_col, text_col=text_col, oov_id=oov_id,
            alphabet=alpha, marker=mk, merge_applier=merge_applier,
        )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        import time

        t0 = time.time()
        meta = _read_meta(state_dir)
        if batch_id <= meta.get("last_batch_id", -1):
            return  # replayed batch — already ingested
        ss = batch_df.sparkSession
        batch = batch_df.select(id_col, text_col)
        retrained = False
        old_version = None
        if "version" not in meta:
            # bootstrap: the first batch trains version 0, then falls
            # through to the same encode-append path as every batch
            train_publish(batch, 0)
            meta = {"version": 0, "retrains": 0, "n_syms": 0, "n_oov": 0}
        version = meta["version"]
        enc_dir = _vdir(state_dir, _ENC, version)
        delta = encode_with(version, batch)
        if os.path.isdir(enc_dir):
            existing = ss.read.parquet(enc_dir).select(id_col)
            delta = delta.join(existing, id_col, "left_anti")
        # pin: the delta feeds the append AND the staleness aggregate —
        # unpinned, each would replay the batch encode
        delta = delta.localCheckpoint(eager=True)
        # append BEFORE the meta bump: a crash after this write replays
        # the batch and the anti-join makes it a no-op
        delta.write.mode("append").parquet(enc_dir)
        stale = tokenizer_staleness(
            delta, oov_id=oov_id, retrain_threshold=retrain_threshold
        )
        meta["n_syms"] = meta.get("n_syms", 0) + stale["n_syms"]
        meta["n_oov"] = meta.get("n_oov", 0) + stale["n_oov"]
        rate = meta["n_oov"] / meta["n_syms"] if meta["n_syms"] else 0.0
        if rate > retrain_threshold:
            # corpus-sized job at threshold cadence: retrain on the full
            # source directory and re-encode it under the new artifact
            # (module docstring: ids from different versions never mix).
            # Files staged but not yet streamed land early; their later
            # appends anti-join to a no-op.
            corpus = ss.read.parquet(docs_dir).select(id_col, text_col)
            new_version = version + 1
            train_publish(corpus, new_version)
            full = encode_with(new_version, corpus)
            _publish_dir(
                state_dir, _ENC, new_version,
                lambda tmp: full.write.parquet(tmp),
            )
            old_version = version
            meta = {
                "version": new_version,
                "retrains": meta.get("retrains", 0) + 1,
                "n_syms": 0,
                "n_oov": 0,
            }
            retrained = True
        _write_meta(state_dir, {**meta, "last_batch_id": batch_id})
        if old_version is not None:
            # superseded versions removed only AFTER the meta commit
            shutil.rmtree(
                _vdir(state_dir, _TOK, old_version), ignore_errors=True
            )
            shutil.rmtree(
                _vdir(state_dir, _ENC, old_version), ignore_errors=True
            )
        # ... and the sweep clears exactly that crash window's orphans
        # on the NEXT batch
        _sweep_orphans(state_dir, meta["version"])
        if on_batch is not None:
            on_batch(batch_id, time.time() - t0, retrained)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    meta = _read_meta(state_dir)
    if "version" in meta:
        meta["tokenizer_dir"] = _vdir(state_dir, _TOK, meta["version"])
        meta["encoded_dir"] = _vdir(state_dir, _ENC, meta["version"])
    return meta
