"""Source readers (SURVEY.md §2.1, S1-S4, S9-S10).

Spark-first equivalents of the reference's `DataLoader`
(`opensea_pipeline/pipeline/src/io_utils.py:21-120`):

- S1/S2 multi-file CSV scan with schema inference, bad-record tolerance and
  union-by-name "diagonal concat" semantics (`io_utils.py:51-66`);
- S3 Parquet scan (`io_utils.py:91-93`);
- S4 partitioned-Parquet scan with partition filters (`io_utils.py:95-120`)
  — Catalyst does Hive-style partition pruning natively, so the reference's
  hand-rolled path-string matching disappears;
- S9 JSON scan (`scripts/analysis/analyze_embeddings.py:139-143`);
- S10 the embedding matrix as a Parquet table with an ARRAY<FLOAT> column
  (replacing the reference's numpy `.npz`,
  `scripts/data_preparation/prepare_visual_market_data.py:57-61`).

All readers return *lazy* DataFrames — scans stay declarative so filters and
projections written downstream reach the file scan (predicate pushdown /
column pruning), which is the core of the 100 TB story.
"""

from __future__ import annotations

import functools
import os
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_raw_csvs(
    spark: SparkSession,
    paths: str | Sequence[str],
    per_file_union: bool = False,
) -> DataFrame:
    """S1: permissive multi-file CSV scan with union-by-name semantics.

    Mirrors `io_utils.py:21-69`: header + inferred schema, malformed lines
    tolerated (PERMISSIVE ≈ Polars ``ignore_errors=True`` +
    ``truncate_ragged_lines=True``), files with differing column sets
    combined by name with missing columns as nulls (≈ ``pl.concat(
    how='diagonal')``, `io_utils.py:66`).

    With ``per_file_union=False`` (default) Spark reads the glob in one scan
    (all files must share a header layout). Set ``per_file_union=True`` for
    genuinely heterogeneous files: each is read separately and combined via
    ``unionByName(allowMissingColumns=True)``. Per-file reads still scan in
    parallel; only schema inference is per-file.
    """
    reader = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .option("mode", "PERMISSIVE")
    )
    if isinstance(paths, str):
        paths = [paths]
    if not per_file_union:
        return reader.csv(list(paths))
    dfs = [reader.csv(p) for p in paths]
    return functools.reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )


def load_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S3: Parquet scan (`io_utils.py:91-93`)."""
    return spark.read.parquet(path)


def load_parquet_footer_schema(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that skips the schema-inference job when ``path`` is
    a LOCAL directory: the schema comes from one footer read on the
    driver (pyarrow, ~ms) instead of a driver-synchronous Spark job
    (guide §5) — for the streaming state loops that re-read their
    persisted state every micro-batch, that job recurs per trigger.

    Falls back to the plain inferred read when the path is not a local
    directory, has no parquet files, the footer is unreadable, or the
    footer schema carries any timestamp field: arrow↔spark timestamp
    conversion (NTZ vs LTZ, ns units) does not round-trip the session's
    reader confs (``nanosAsLong``/``inferTimestampNTZ``), and a saved
    fixed job is not worth an ambiguous type. Rows and types are
    identical on the fast path: the schema is the file's own footer.

    Single-footer assumption: the explicit schema comes from the first
    (alphabetically sorted) part file, which is correct for the
    one-writer state/artifact dirs this reader serves but would pin one
    file's schema for a directory with evolved per-file schemas. When
    the session asks for schema merging (``spark.sql.parquet.mergeSchema``)
    the fast path is skipped so Spark's footer-merging read keeps its
    semantics.
    """
    import glob

    try:
        merge_schema = (
            spark.conf.get("spark.sql.parquet.mergeSchema", "false") or "false"
        ).lower() == "true"
    except Exception:
        merge_schema = False
    if os.path.isdir(path) and not merge_schema:
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if parts:
            try:
                import pyarrow.parquet as pq
                from pyspark.sql.pandas.types import from_arrow_schema

                schema = from_arrow_schema(
                    pq.ParquetFile(parts[0]).schema_arrow
                )
                if not any(
                    "timestamp" in f.dataType.simpleString()
                    for f in schema.fields
                ):
                    return spark.read.schema(schema).parquet(path)
            except Exception:
                # Deliberately broad: pyarrow raises ArrowException
                # subclasses (and even NotImplementedError for footers
                # with unsupported features) that are not OSError /
                # ValueError; any failure here must land on the plain
                # inferred read, never crash it.
                pass
    return spark.read.parquet(path)


def load_parquet_partitioned(
    spark: SparkSession, base_dir: str, filters: Mapping[str, object] | None = None
) -> DataFrame:
    """S4: partitioned-Parquet scan with partition filters.

    The reference prunes files by matching ``k=v`` against path strings
    (`io_utils.py:109-115`). In Spark the same filters are ordinary
    ``.filter`` calls on the partition columns — Catalyst turns them into
    partition pruning (no file even opened for pruned partitions), which is
    what makes this operator survive a 100 TB table.
    """
    df = spark.read.parquet(base_dir)
    if filters:
        for k, v in filters.items():
            df = df.filter(F.col(k) == F.lit(v))
    return df


def load_json(
    spark: SparkSession, path: str, multi_line: bool = True
) -> DataFrame:
    """S9: JSON scan (array-of-objects metadata files → multiLine)."""
    return spark.read.option("multiLine", multi_line).json(path)


# Testdata columns stored with nonstandard parquet timestamp encodings:
# INT64(TIMESTAMP_NANOS) reads as LongType under
# spark.sql.legacy.parquet.nanosAsLong; timestamp[us] without
# isAdjustedToUTC infers as TIMESTAMP_NTZ under Spark 4's default
# spark.sql.parquet.inferTimestampNTZ.enabled=true.
_NANO_TS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def ensure_reader_confs(spark: SparkSession) -> None:
    """Pin the runtime SQL confs the testdata readers depend on.

    Defensive: the driver may hand us a session built without our session.py
    defaults; all three are runtime-settable. UTC pins date_format /
    unix_timestamp semantics to the oracle's naive-UTC view; nanosAsLong
    surfaces TIMESTAMP(NANOS) as long for explicit µs truncation;
    inferTimestampNTZ=false makes Spark 4.x read non-UTC-adjusted µs
    timestamps as TIMESTAMP (LTZ) like Spark 3 did — under the UTC session
    tz the two types have identical field semantics, and TIMESTAMP is what
    event-time operators (withWatermark, window) require.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def normalize_event_time(df: DataFrame, cols: Sequence[str] = ("ts",)) -> DataFrame:
    """Normalize event-time columns to TimestampType regardless of how the
    parquet encoding surfaced them: bigint (legacy ns-as-long → µs
    truncation) or timestamp_ntz (Spark 4 NTZ inference → cast, which is
    semantics-preserving under the UTC session time zone). Works on batch
    and streaming DataFrames alike."""
    dtypes = dict(df.dtypes)
    for col in cols:
        dt = dtypes.get(col)
        if dt == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table (TESTDATA.md), normalizing
    ns-precision / NTZ-inferred timestamp columns to TimestampType.

    Memoized per session: `spark.read.parquet` lists files and reads the
    footer schema on every call (~0.1 s of driver work per table — a
    6-table TPC-H join shape paid ~0.6 s of pure plan-construction tax
    per bench run). DataFrames are immutable, so handing back the same
    instance is safe; the testdata dirs this loader serves are static by
    contract (the driver never rewrites them mid-session). The memo
    lives ON the session object so it dies with the session."""
    cache = getattr(spark, "_opensea_table_cache", None)
    if cache is None:
        cache = {}
        spark._opensea_table_cache = cache
    key = (os.path.abspath(sf_dir), name)
    if key not in cache:
        ensure_reader_confs(spark)
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # Normalize every declared event-time column plus any column the
        # scan still surfaced as NTZ (e.g. driver sessions with inference
        # pre-cached).
        ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
        cache[key] = normalize_event_time(
            df, [*_NANO_TS_COLUMNS.get(name, []), *ntz_cols]
        )
    return cache[key]


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read all driver testdata tables keyed by name."""
    from ..schemas import TESTDATA_TABLES

    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def load_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same lazy contract as the parquet readers. ORC ships
    in Spark's core (native vectorized reader), supports the same
    predicate pushdown / column pruning / partition discovery as
    parquet, and is the interchange format Hive-centric lakes hand us;
    a user migrating such a lake should not have to convert first."""
    return spark.read.orc(path)


def load_text_lines(
    spark: SparkSession, path: str, *, with_file: bool = True
) -> DataFrame:
    """Raw text-corpus ingestion: one row per line with the source file
    path (the shape LLM ingest starts from — WET/JSONL-adjacent dumps
    before any schema exists). Line order inside a file is NOT a row
    attribute in a distributed scan; anything order-dependent must key
    on (file, line content) downstream or use a format that carries
    offsets."""
    df = spark.read.text(path)
    if with_file:
        df = df.select(
            F.input_file_name().alias("file"), F.col("value").alias("line")
        )
    return df
