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

import json
import os
import re
import shutil
import socket
import threading
import time


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


_WRITER_LOCK = "_writer_lock.json"
_PROC_LOCKS: "dict[str, str]" = {}  # abspath(state_dir) -> holder desc
_PROC_GUARD = threading.Lock()


class writer_lock:
    """Single-writer latch for a loop's persisted state dir (r16 probe:
    two loops started against one state dir with separate checkpoints
    interleave their anti-join reads and appends — the probe left the
    corpus store at 500 rows for 400 distinct ids, with one loop dying
    in an opaque FOREACH_BATCH error and the other reporting success
    over the silently corrupted store).

    Two tiers, both fail-loud:

    - an in-process registry (exact — covers threads sharing one
      driver, where a pid-based file latch cannot discriminate);
    - a ``_writer_lock.json`` file latch (``O_CREAT|O_EXCL``) carrying
      pid / host / heartbeat for cross-process exclusion. A dead
      holder is broken immediately when its pid is gone on the same
      host, or after ``stale_after_s`` without a heartbeat otherwise
      (shared-filesystem case, where pids can't be probed) — so a
      crashed loop never bricks restarts, while a LIVE concurrent
      writer is refused with both holders named. The break is
      best-effort (no fencing token; two writers breaking the same
      stale lock in the same instant can both proceed) — the latch is
      an operator-error guard, not a distributed lock service, and the
      stores' append idempotence still bounds the damage underneath.

    Use as a context manager around the stream run; call ``refresh()``
    once per batch so the heartbeat tracks liveness at batch
    granularity. Readers are never excluded — the latch guards
    writers only."""

    def __init__(self, state_dir: str, loop_name: str,
                 stale_after_s: float = 1800.0):
        self._key = os.path.abspath(state_dir)
        self._path = os.path.join(state_dir, _WRITER_LOCK)
        self._loop = loop_name
        self._stale = stale_after_s
        self._held = False

    def _payload(self) -> dict:
        return {
            "pid": os.getpid(),
            "host": socket.gethostname(),
            "loop": self._loop,
            "heartbeat": time.time(),
        }

    def _write(self) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._payload(), f)
        os.replace(tmp, self._path)

    def __enter__(self) -> "writer_lock":
        with _PROC_GUARD:
            holder = _PROC_LOCKS.get(self._key)
            if holder is not None:
                raise RuntimeError(
                    f"{self._loop}: state dir {self._key!r} already has "
                    f"a live writer in this process ({holder}) — one "
                    "writer per state dir; running two loops against "
                    "one store interleaves appends and corrupts it."
                )
            _PROC_LOCKS[self._key] = self._loop
        try:
            os.makedirs(self._key, exist_ok=True)
            try:
                fd = os.open(
                    self._path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                os.close(fd)
                self._write()
            except FileExistsError:
                self._break_or_raise()
        except BaseException:
            with _PROC_GUARD:
                _PROC_LOCKS.pop(self._key, None)
            raise
        self._held = True
        return self

    def _break_or_raise(self) -> None:
        try:
            with open(self._path) as f:
                cur = json.load(f)
        except (OSError, ValueError):
            cur = {}  # torn/unreadable lock: treat as breakable debris
        pid = cur.get("pid")
        same_host = cur.get("host") == socket.gethostname()
        alive = None
        if same_host and isinstance(pid, int):
            try:
                os.kill(pid, 0)
                alive = True
            except ProcessLookupError:
                alive = False
            except OSError:
                alive = None  # permission etc.: fall back to heartbeat
        hb = cur.get("heartbeat")
        fresh = (
            isinstance(hb, (int, float))
            and (time.time() - hb) < self._stale
        )
        # our own pid appears only when a previous run in this process
        # exited without release, which the in-process registry already
        # ruled out as a LIVE holder — breakable
        if pid == os.getpid() or alive is False or not fresh:
            self._write()
            return
        raise RuntimeError(
            f"{self._loop}: state dir {self._key!r} is locked by a "
            f"live writer (pid {pid} on {cur.get('host')!r}, loop "
            f"{cur.get('loop')!r}, heartbeat "
            f"{time.time() - hb:.0f}s ago). One writer per state dir — "
            "a concurrent loop interleaves appends and corrupts the "
            "store. If that writer is truly gone, remove "
            f"{self._path!r} or wait out the staleness window."
        )

    def refresh(self) -> None:
        if self._held:
            self._write()

    def __exit__(self, *exc) -> None:
        with _PROC_GUARD:
            _PROC_LOCKS.pop(self._key, None)
        self._held = False
        try:
            with open(self._path) as f:
                if json.load(f).get("pid") == os.getpid():
                    os.remove(self._path)
        except (OSError, ValueError):
            pass


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
