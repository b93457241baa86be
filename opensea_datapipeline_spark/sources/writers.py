"""Sinks (SURVEY.md §2.1, S5-S8, S11).

Spark-first equivalents of the reference's `DataWriter`
(`opensea_pipeline/pipeline/src/io_utils.py:130-235`).
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    compression: str = "zstd",
    single_file: bool = False,
    mode: str = "overwrite",
) -> None:
    """S5: Parquet sink, zstd default (`io_utils.py:130-145`).

    ``single_file=True`` coalesces to one output file for parity with the
    reference's one-file-per-table layout — only appropriate for small gold
    tables; large fact tables keep their natural partitioning.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("compression", compression).parquet(path)


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """S6: Hive-partitioned Parquet sink (`io_utils.py:147-182`).

    The reference shells out to DuckDB ``COPY ... PARTITION_BY``; Spark's
    built-in ``partitionBy`` writer is the distributed equivalent. At scale,
    pre-repartitioning by the partition columns avoids
    many-small-files-per-task write amplification.
    """
    (
        df.repartition(*partition_cols)
        .write.mode(mode)
        .option("compression", compression)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7: CSV sink (`io_utils.py:184-189`)."""
    df.write.mode(mode).option("header", True).csv(path)


def write_json_metrics(metrics: Mapping[str, object], path: str) -> None:
    """S8: JSON metrics sink (`run.py:119-128`) — driver-side, metrics are
    tiny scalars by construction."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(dict(metrics), f, indent=2, default=str)


class VersionedOutputStore:
    """S11: timestamped output directories + latest-version lookup
    (`io_utils.py:192-235`). Plain directory convention around Spark writes;
    not an engine operator."""

    def __init__(self, base_dir: str):
        self.base_dir = base_dir

    def new_version_dir(self, now: _dt.datetime | None = None) -> str:
        stamp = (now or _dt.datetime.now()).strftime("%Y-%m-%d_%H-%M-%S")
        path = os.path.join(self.base_dir, stamp)
        os.makedirs(path, exist_ok=True)
        return path

    def latest_version_dir(self) -> str | None:
        if not os.path.isdir(self.base_dir):
            return None
        versions = sorted(
            d
            for d in os.listdir(self.base_dir)
            # underscore prefix = in-progress/metadata (Spark's own
            # convention) — a crashed half-written tmp dir is never latest
            if os.path.isdir(os.path.join(self.base_dir, d))
            and not d.startswith("_")
        )
        return os.path.join(self.base_dir, versions[-1]) if versions else None


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles data into ``num_buckets`` hash
    buckets on ``bucket_cols`` at write time, so joins/aggregations on
    those keys read co-located data with NO exchange at query time — the
    standing-shuffle amortization that matters when the same 100 TB fact
    table is joined on the same key by many queries. (Bucketing requires
    the table catalog; plain path-based parquet cannot carry bucket
    metadata.)"""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def write_range_partitioned(
    df: DataFrame,
    path: str,
    range_col: str,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout: ``repartitionByRange`` +
    ``sortWithinPartitions`` on ``range_col`` before writing, so each
    output file covers a DISJOINT range of the column and its parquet
    footer min/max statistics become selective. A later scan with a
    predicate on ``range_col`` then skips whole files and, within files,
    whole row groups — the layout-level pruning that turns a 100 TB
    time-range query into a read of only the touched span. (This is the
    sort-cluster half of what table formats call Z-ordering; for ONE
    dominant predicate column a plain range sort is optimal.)"""
    (
        df.repartitionByRange(num_files, range_col)
        .sortWithinPartitions(range_col)
        .write.mode(mode)
        .parquet(path)
    )


def write_zorder_layout(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet layout for MULTI-column pruning: bucket
    each cluster column to ``bits`` bits on its [min, max] span (one agg
    pass), interleave the bucket bits into a single Morton code, then
    range-partition + sort on that code before writing. Files then cover
    compact hyper-rectangles of the clustered space, so parquet footer
    min/max stats are selective on EVERY clustered column — the layout
    Delta/Iceberg call Z-ORDER BY, built from pure Spark primitives
    (`write_range_partitioned` is the optimal 1-column special case).

    Bucketing is linear on the span, matching the common implementation;
    heavily skewed columns should be pre-transformed (log, rank) by the
    caller — the code stays codegen-only either way (shift/and/or
    expressions, no UDF, no global sort: repartitionByRange samples)."""
    import functools as _ft

    mins = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).first()
    # an all-null cluster column has no span — drop IT from the Morton
    # code (its values are constant, nothing to cluster) instead of
    # disabling z-ordering for every other column (ADVICE r9: the old
    # any() gate did exactly that); an EMPTY input has no live columns
    # at all, and the fallback still honors the num_files layout
    # contract (r9, ADVICE r8: float(None) used to TypeError here)
    live = [] if mins is None else [c for c in cols if mins[f"mn_{c}"] is not None]
    if not live:
        df.repartition(num_files).write.mode(mode).parquet(path)
        return
    n_buckets = (1 << bits) - 1
    bucket_cols = []
    for c in live:
        mn, mx = float(mins[f"mn_{c}"]), float(mins[f"mx_{c}"])
        span = (mx - mn) or 1.0
        bucket_cols.append(
            # NULL cluster values bucket to 0 (the min corner) by
            # explicit rule — F.least SKIPS nulls, so without the guard
            # they silently landed at n_buckets, clustering all nulls
            # into the max Morton corner (r9, ADVICE r8)
            F.when(F.col(c).isNull(), F.lit(0)).otherwise(
                F.least(
                    F.lit(n_buckets),
                    F.floor(
                        (F.col(c).cast("double") - F.lit(mn))
                        / F.lit(span) * F.lit(n_buckets)
                    ).cast("long"),
                )
            )
        )
    parts = [
        F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)),
            i * len(live) + j,
        )
        for i in range(bits)
        for j, b in enumerate(bucket_cols)
    ]
    z = _ft.reduce(lambda a, b: a.bitwiseOR(b), parts)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int = 32,
    salt: str = "shard-v1",
    mode: str = "overwrite",
    order_col: str | None = None,
) -> None:
    """Training-shard sink: a reproducible GLOBAL shuffle of the corpus
    into ``n_shards`` hash shards, the layout a training loader streams.

    Assignment and intra-shard order both derive from a portable md5 of
    (salt, id) — see ``operators.text.shard_assignment`` — so the output
    is byte-stable across re-runs and cluster sizes: no ``rand()``, no
    global sort. ``repartition`` on the shard column gives each reducer
    whole shards; ``partitionBy`` writes one directory per shard;
    ``sortWithinPartitions`` fixes the in-file row order. At 100 TB this
    is exactly one hash-partition shuffle of the fact table — the
    cheapest possible global shuffle — and shard counts stay balanced
    because the 24-bit hash is near-uniform regardless of key skew.

    ``order_col`` switches the intra-shard order from the hash key to a
    CURRICULUM: rows sort ascending by that column (e.g. a difficulty or
    quality score) within each shard, ties broken by the hash key so the
    output stays deterministic. Shard membership is unchanged — every
    shard still sees the full mix — so a loader reading shards in
    parallel gets the same easy→hard progression in each stream.
    """
    from ..operators.text import shard_assignment

    shard, key = shard_assignment(id_col, n_shards, salt)
    order = ["shard", "_shuffle_key"] if order_col is None else [
        "shard", order_col, "_shuffle_key"
    ]
    (
        df.withColumn("shard", shard)
        .withColumn("_shuffle_key", key)
        .repartition(n_shards, "shard")
        .sortWithinPartitions(*order)
        .drop("_shuffle_key")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
    compression: str = "zstd",
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files of ~``target_file_mb`` each.

    The operational reality of a long-lived 100 TB lake: streaming
    micro-batches, partitioned writes, and incremental appends all leave
    directories of KB-scale files, and scan throughput collapses under
    per-file open/footer costs (plus driver memory for file listings).
    Sizing uses the Hadoop FileSystem API on the table's own input
    files, so it works on any URI the data lives behind (local fs in
    tests, HDFS/object store on a cluster). Round-robin repartition —
    not coalesce — so output files are equal-sized regardless of input
    skew; coalesce would glue unbalanced inputs into unbalanced outputs.

    Returns the number of output files written. Writes to a NEW path:
    compact-in-place belongs to table formats with atomic commit; plain
    parquet gets the write-then-swap idiom (`VersionedOutputStore`).
    """
    import math

    df = spark.read.parquet(src_path)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        total += p.getFileSystem(hconf).getFileStatus(p).getLen()
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(dst_path)
    )
    return n_files


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """ORC sink (zstd) — mirror of the parquet sinks for Hive-centric
    consumers; partitioning behaves identically (Hive-style dirs,
    Catalyst partition pruning on read-back)."""
    w = df.write.mode(mode).option("compression", "zstd")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
