"""Streaming embedding ingest into a persisted ANN index — the
corpus-dedup loop's pattern applied to the similarity side, composing
the r6–r12 lifecycle pieces (``build_ivf_index`` / ``write_ivf_index``
/ ``append_ivf_index_at`` / ``index_staleness``) into the ONE streaming
job an embedding tier runs: vector files arrive, each micro-batch
appends to the persisted index under the frozen coarse quantizer, and
the loop itself fires the staleness-triggered REBUILD once appended
mass crosses the threshold (recall decays silently as frozen centroids
drift from the corpus — the measured r7 effect the threshold guards).

Store layout under ``state_dir``::

    index_v{K}/   the persisted IVF index (ann_index layout: meta,
                  centroids, assignments partitioned by list_id) —
                  appends mutate the CURRENT version in place
                  (idempotent: the append anti-joins existing ids);
                  REBUILDS publish a new version atomically
    meta.json     {last_batch_id, version, rebuilds}

Crash-window discipline (the corpus_dedup argument, re-applied):

- the append lands BEFORE the meta's batch-id bump, so a replayed
  batch re-appends as a no-op (anti-join) instead of duplicating rows;
- a rebuild builds into a tmp dir, atomically renames to
  ``index_v{K+1}``, and only then moves the meta pointer; a crash
  between rename and meta leaves an orphan version that the next
  attempt clears — the meta never points at an incomplete index;
- the superseded version is removed only AFTER the meta commit.

First batch runs the same code path: no meta → the batch itself trains
the quantizer (``build_ivf_index``) and publishes ``index_v0``.

At 100 TB the economics are the lifecycle's: per-trigger cost is one
broadcast-nearest-centroid pass over the BATCH plus an ids-column
anti-join read (parquet-pruned); the rebuild — the only corpus-sized
job — runs at the cadence the threshold dictates, not per batch.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ann_index import (
    append_ivf_index_at,
    append_lsh_index_at,
    build_ivf_index,
    build_lsh_index,
    index_staleness,
    write_ivf_index,
    write_lsh_index,
)
from ..sources.readers import ensure_reader_confs
from .gold import _read_meta, _write_meta


def _version_dir(state_dir: str, version: int) -> str:
    return os.path.join(state_dir, f"index_v{version}")


def _publish_index(
    index, state_dir: str, version: int
) -> str:
    """Write the index into a tmp dir and atomically rename it to
    ``index_v{version}``; clears any orphan from a crashed attempt."""
    tmp = os.path.join(state_dir, f"_tmp_index_v{version}")
    out = _version_dir(state_dir, version)
    shutil.rmtree(tmp, ignore_errors=True)
    write_ivf_index(index, tmp)
    shutil.rmtree(out, ignore_errors=True)  # orphan of a crashed publish
    os.replace(tmp, out)
    return out


def run_streaming_ann_ingest(
    spark: SparkSession,
    embeddings_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kind: str = "ivf",
    n_lists: int = 4,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    rebuild_threshold: float = 0.5,
    train_rows: int | None = None,
    max_files_per_trigger: int = 1,
    on_batch=None,
) -> dict:
    """Stream ``embeddings_dir`` (AvailableNow) into the persisted ANN
    index at ``state_dir``; returns the final loop meta (incl. the
    current ``index_dir`` ready for ``read_*_index``/probe).
    ``on_batch(batch_id, wall_s, rebuilt)`` is the per-batch monitor
    hook. Vector ids must be globally unique across the stream (the
    append's anti-join contract).

    ``kind="lsh"``: appends are bit-identical to a rebuild (signatures
    are a pure per-row function of the frozen hyperplanes —
    ``index_staleness``'s documented LSH rule), so the loop never
    rebuilds and the version stays 0 for the store's lifetime; the
    quantized kinds pay the rebuild at threshold cadence."""
    if kind not in ("ivf", "lsh"):
        raise ValueError(f"kind must be 'ivf' or 'lsh', got {kind!r}")
    ensure_reader_confs(spark)
    schema = spark.read.parquet(embeddings_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(embeddings_dir)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        import time

        t0 = time.time()
        meta = _read_meta(state_dir)
        if batch_id <= meta.get("last_batch_id", -1):
            return  # replayed batch — already ingested
        ss = batch_df.sparkSession
        batch = batch_df.select(id_col, vec_col)
        rebuilt = False
        old_version_dir = None
        if "version" not in meta:
            # bootstrap: the first batch trains the quantizer / fixes
            # the hyperplanes
            if kind == "lsh":
                idx = build_lsh_index(
                    batch, id_col, vec_col,
                    n_planes=n_planes, n_tables=n_tables, dim=dim,
                )
                tmp = os.path.join(state_dir, "_tmp_index_v0")
                out = _version_dir(state_dir, 0)
                shutil.rmtree(tmp, ignore_errors=True)
                write_lsh_index(idx, tmp)
                shutil.rmtree(out, ignore_errors=True)
                os.replace(tmp, out)
            else:
                idx = build_ivf_index(
                    batch, id_col, vec_col, n_lists=n_lists,
                    train_rows=train_rows,
                )
                _publish_index(idx, state_dir, 0)
            meta = {"version": 0, "rebuilds": 0}
        else:
            cur = _version_dir(state_dir, meta["version"])
            # append BEFORE the meta bump: a crash after this write
            # replays the batch and the anti-join makes it a no-op
            if kind == "lsh":
                append_lsh_index_at(ss, cur, batch, id_col, vec_col)
            else:
                append_ivf_index_at(ss, cur, batch, id_col, vec_col)
            stale = index_staleness(
                ss, cur, rebuild_threshold=rebuild_threshold
            )
            if stale["rebuild_recommended"]:
                # corpus-sized job, fired at threshold cadence: retrain
                # the quantizer on everything the store holds
                allv = ss.read.parquet(f"{cur}/assignments").select(
                    F.col("id").alias(id_col),
                    F.col("vec").alias(vec_col),
                )
                idx = build_ivf_index(
                    allv, id_col, vec_col, n_lists=n_lists,
                    train_rows=train_rows,
                )
                new_version = meta["version"] + 1
                _publish_index(idx, state_dir, new_version)
                old_version_dir = cur
                meta = {
                    "version": new_version,
                    "rebuilds": meta.get("rebuilds", 0) + 1,
                }
                rebuilt = True
        _write_meta(state_dir, {**meta, "last_batch_id": batch_id})
        if old_version_dir is not None:
            # superseded version removed only AFTER the meta commit: a
            # crash before this line leaves the old dir orphaned (safe),
            # never the meta pointing at a removed index
            shutil.rmtree(old_version_dir, ignore_errors=True)
        if on_batch is not None:
            on_batch(batch_id, time.time() - t0, rebuilt)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    meta = _read_meta(state_dir)
    if "version" in meta:
        meta["index_dir"] = _version_dir(state_dir, meta["version"])
    return meta
