"""Local replica of the driver's DuckDB-oracle differential check.

For each query: run the Spark plan and the oracle SQL on the same parquet
tables, then compare row count, sorted column names, and an
order-insensitive value hash (doubles rounded, timestamps stringified) —
approximating CORRECTNESS_r{N}.json so regressions surface before the
driver runs.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from opensea_datapipeline_spark.schemas import TESTDATA_TABLES

ROUND_DIGITS = 6


def _norm_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        r = round(v, ROUND_DIGITS)
        if r == 0:
            r = 0.0  # avoid -0.0
        return f"{r:.{ROUND_DIGITS}f}"
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    rows = [
        "|".join(_norm_cell(row[c]) for c in cols) for _, row in df.iterrows()
    ]
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@dataclass
class CompareResult:
    name: str
    rows_spark: int
    rows_oracle: int
    cols_match: bool
    hash_match: bool

    @property
    def ok(self) -> bool:
        return (
            self.rows_spark == self.rows_oracle
            and self.cols_match
            and self.hash_match
        )


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def compare_query(spark, sf_dir: str, name: str, fn, sql: str) -> CompareResult:
    spark_df = fn(spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    try:
        oracle_df = con.execute(sql).df()
    finally:
        con.close()
    cols_match = sorted(spark_df.columns) == sorted(oracle_df.columns)
    hash_match = (
        cols_match and value_hash(spark_df) == value_hash(oracle_df)
    )
    return CompareResult(
        name=name,
        rows_spark=len(spark_df),
        rows_oracle=len(oracle_df),
        cols_match=cols_match,
        hash_match=hash_match,
    )
