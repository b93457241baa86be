"""Shared crash-window discipline for the streaming ingest loops
(ann_ingest, tokenizer_ingest): versioned-directory publish via
tmp + atomic rename, and the per-batch orphan sweep.

The contract both loops rely on:

- ``publish_versioned_dir`` writes into ``_tmp_<name>`` then
  ``os.replace``s it to ``<name>`` — the final directory either does
  not exist or is complete; a crashed earlier attempt's tmp dir is
  cleared first, a crashed earlier PUBLISH of the same name is
  overwritten (the meta never pointed at it).
- ``sweep_orphan_versions`` removes any ``<prefix>_v{N}`` /
  ``_tmp_<prefix>_v{N}`` under ``state_dir`` whose N differs from the
  committed meta's version. A crash between the loop-meta commit and
  the superseded version's rmtree leaves the OLD version orphaned;
  nothing on the normal path would ever touch it again, so disk would
  grow one full copy per crashed rebuild/retrain (ADVICE r13). One
  listdir per batch; deletes only the recognized version-dir shapes.
"""

from __future__ import annotations

import os
import re
import shutil


def require_non_null_ids(batch, id_col: str, loop_name: str) -> None:
    """Fail loud when a micro-batch carries NULL or in-batch-DUPLICATE
    ids (r15 probes): a null id never equi-joins, so the anti-join
    appends treat such rows as always-fresh (duplicates accumulate on
    every replay) and the dedup assignment fold collapses every
    null-id doc into ONE (null, null) row; an in-batch duplicate slips
    PAST the anti-join (which only checks the persisted store) and
    permanently corrupts it — the probe left two different texts under
    one doc id in the corpus, with the dup text never clustered. One
    bounded aggregate over the batch (batch-proportional — CROSS-batch
    uniqueness stays the caller's contract, a store-sized check per
    batch); callers pass the PINNED batch so this never replays the
    source read."""
    from pyspark.sql import functions as F

    row = batch.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(id_col).alias("n_keyed"),
        F.countDistinct(id_col).alias("n_distinct"),
    ).first()
    if row["n_keyed"] < row["n"]:
        raise ValueError(
            f"{loop_name} received {row['n'] - row['n_keyed']} row(s) "
            f"with a NULL {id_col!r} — ids must be non-null and "
            "globally unique; a null id cannot be tracked by the "
            "persisted stores (it never equi-joins) and would silently "
            "duplicate or vanish. Filter or re-key upstream."
        )
    if row["n_distinct"] < row["n_keyed"]:
        raise ValueError(
            f"{loop_name} received a micro-batch with duplicate "
            f"{id_col!r} values ({row['n_keyed']} rows, "
            f"{row['n_distinct']} distinct) — the store anti-join only "
            "guards against ids ALREADY persisted, so in-batch "
            "duplicates would write conflicting rows under one id. "
            "Deduplicate or re-key upstream."
        )


def publish_versioned_dir(state_dir: str, name: str, write) -> str:
    """``write(tmp_path)`` then atomic rename to ``state_dir/name``."""
    final = os.path.join(state_dir, name)
    tmp = os.path.join(state_dir, "_tmp_" + name)
    shutil.rmtree(tmp, ignore_errors=True)
    write(tmp)
    shutil.rmtree(final, ignore_errors=True)  # orphan of a crashed publish
    os.replace(tmp, final)
    return final


def sweep_orphan_versions(
    state_dir: str, prefixes: "tuple[str, ...]", keep_version: int
) -> None:
    """Remove versioned dirs whose version != ``keep_version``. A
    ``_tmp_`` dir is removed regardless of its version — the sweep runs
    after the meta commit, at which point any tmp (even of the kept
    version) is the debris of a crashed publish attempt; a future
    publish recreates its own tmp from scratch."""
    try:
        entries = os.listdir(state_dir)
    except OSError:
        return
    pat = re.compile(
        r"^(_tmp_)?(?:" + "|".join(map(re.escape, prefixes)) + r")_v(\d+)$"
    )
    for name in entries:
        m = pat.match(name)
        if m and (m.group(1) or int(m.group(2)) != keep_version):
            shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)
