"""Bloom-gated streaming dedup — the sketch family applied to state.

`streaming/dedup.py` keeps the exact seen-key set in the state store and
pays an exact lookup for EVERY arriving key. At 100 TB most arriving
keys are NEW — and a Bloom filter answers "definitely not seen" for
them without touching the key store at all (zero false negatives: a
key the mask rejects cannot be in the seen set, because build and probe
share the hash). Only the maybe-seen minority (true dups + the ~0.2%
false positives at 16 bits/key) pays the exact anti-join against the
persisted key table, which removes the false positives — the net result
is EXACT, the same guarantee as `bloom_pruned_segment_revenue`'s
broadcast join, applied per micro-batch.

State shape per batch:
- driver: the set-bit positions (≤ m_bits ints — bounded, independent
  of corpus size), folded into a literal long[] mask per batch;
- executors: the seen-key parquet table, touched only by the pruned
  anti-join and the new-key append.

This is the streaming form of the scan-side runtime filter: the 64 KiB
mask rides each batch's task binary; the exact store is only consulted
for candidates the mask could not reject.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketches as sk
from ..sources.readers import ensure_reader_confs, normalize_event_time

# defaults only — run_bloom_gated_dedup takes m_bits/k_hashes so callers
# can size to THEIR key cardinality (~16 bits/key; an undersized mask
# saturates and silently prunes nothing — sketches.bloom_bits docstring).
# 2^21 covers ~130k keys; the sf0.1 soak already carries 80k.
M_BITS = 1 << 21
K_HASHES = 4

# lives in CHECKPOINT_DIR, not seen_dir: batch ids are scoped to the
# checkpoint lineage — a fresh checkpoint against an existing seen store
# (the supported resume-with-new-source shape, test_bloom_gate_restart_
# reseeds_mask) legitimately restarts ids at 0 and must NOT be skipped;
# only a replay within the same checkpoint is.
_META = "_bloom_gate_meta.json"


def _read_last_batch_id(checkpoint_dir: str) -> int:
    try:
        with open(os.path.join(checkpoint_dir, _META)) as f:
            return int(json.load(f).get("last_batch_id", -1))
    except (OSError, ValueError):
        return -1


def _write_last_batch_id(checkpoint_dir: str, batch_id: int) -> None:
    # atomic (the gold-table discipline): a truncated meta must read as
    # "no meta" and fall back to the replay path, which is exact anyway
    os.makedirs(checkpoint_dir, exist_ok=True)
    tmp = os.path.join(checkpoint_dir, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"last_batch_id": batch_id}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(checkpoint_dir, _META))




def run_bloom_gated_dedup(
    spark: SparkSession,
    src_dir: str,
    key_cols: list[str],
    seen_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    filter_expr: str | None = None,
    m_bits: int = M_BITS,
    k_hashes: int = K_HASHES,
) -> dict:
    """Stream ``src_dir`` (AvailableNow, one file per trigger); per
    batch: distinct keys → mask probe splits definitely-new from
    maybe-seen → ONLY maybe-seen pays the exact anti-join against the
    seen table → both groups of truly-new keys append to the seen
    table and their bits join the driver mask. Returns the seen table
    plus per-batch prune telemetry (how many keys skipped the exact
    store — the measured value of the gate)."""
    ensure_reader_confs(spark)
    batch_src = spark.read.parquet(src_dir)
    stream = (
        spark.readStream.schema(batch_src.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    # same ns/NTZ normalization as run_streaming_dedup — a ns-encoded
    # ts surfaces as bigint and a CAST(ts AS DATE) key would throw
    stream = normalize_event_time(stream)
    if filter_expr is not None:
        stream = stream.filter(F.expr(filter_expr))
    # key_cols are SQL EXPRESSIONS (column names work too) so derived
    # keys like CAST(ts AS DATE) need no pre-projection
    key_expr = F.md5(
        F.concat_ws("\x1f", *[F.expr(c).cast("string") for c in key_cols])
    )
    bits: set[int] = set()
    if os.path.exists(seen_dir):
        # RESTART path: re-seed the mask from the persisted store, or
        # the zero-false-negative invariant (mask-reject => not seen)
        # breaks and previously-seen keys double-append. Bounded: the
        # collect is the <= m_bits bit rows, never the keys.
        for r in sk.bloom_bits(
            spark.read.parquet(seen_dir), "dedup_key",
            m_bits=m_bits, k_hashes=k_hashes,
        ).collect():
            bits.add(int(r["bit"]))
    stats = {"batches": 0, "definitely_new": 0, "maybe_seen": 0}

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        # replay skip (the topk/gold batch-id discipline): dedup
        # CORRECTNESS survives a replayed batch regardless — the
        # restart-path mask re-seed routes already-appended keys to the
        # exact anti-join, which drops them — but the stats dict would
        # double-count the batch and overstate the prune share
        # (r10 ADVICE). Meta is written only after the append, so a
        # crash between append and meta replays into the exact path.
        if batch_id <= _read_last_batch_id(checkpoint_dir):
            return
        keys = batch_df.select(key_expr.alias("dedup_key")).distinct()
        mask = sk.pack_bits_literal(bits, m_bits)
        might = sk.bloom_might_contain(
            mask, F.col("dedup_key"), m_bits=m_bits, k_hashes=k_hashes
        )
        keys = keys.withColumn("_maybe", might).localCheckpoint(
            eager=True
        )
        definitely_new = keys.filter(~F.col("_maybe")).drop("_maybe")
        maybe = keys.filter(F.col("_maybe")).drop("_maybe")
        n_new = definitely_new.count()
        n_maybe = maybe.count()
        if os.path.exists(seen_dir) and n_maybe:
            seen = spark.read.parquet(seen_dir)
            # no forced broadcast: the seen table grows with the
            # corpus — AQE broadcasts while it fits, shuffles after
            verified_new = maybe.join(seen, "dedup_key", "left_anti")
        else:
            verified_new = maybe
        # append stays distributed (keys grow with the corpus — never
        # collect them); the ONLY driver action is the ≤ m_bits bit
        # rows, the bloom_mask_literal bounded-collect discipline
        fresh = definitely_new.unionByName(verified_new).localCheckpoint(
            eager=True
        )
        fresh.write.mode("append").parquet(seen_dir)
        for r in sk.bloom_bits(
            fresh, "dedup_key", m_bits=m_bits, k_hashes=k_hashes
        ).collect():
            bits.add(int(r["bit"]))
        # release the previous batch's rebound checkpoints (keys,
        # fresh) — the dead-checkpoint accumulation the pagerank/LPA
        # loops measured at 2x late-iteration cost
        import gc

        gc.collect()
        _write_last_batch_id(checkpoint_dir, batch_id)
        stats["batches"] += 1
        stats["definitely_new"] += n_new
        stats["maybe_seen"] += n_maybe

    q = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"seen": spark.read.parquet(seen_dir), "stats": stats}
