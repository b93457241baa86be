"""Round-17 focused tests (optimization round 2).

Covers the two r16 ADVICE reader fixes:
- `load_parquet_footer_schema` defers to the inferred read when the
  session asks for parquet schema merging (the single-footer fast path
  would otherwise silently pin one part file's schema);
- the footer fast path's guard is broad enough that ANY pyarrow failure
  (e.g. ArrowNotImplementedError, which is not an OSError/ValueError)
  lands on the plain inferred read instead of crashing.
"""

from __future__ import annotations

import pytest

from opensea_datapipeline_spark.sources import readers as rd


def test_footer_schema_read_defers_to_merge_schema(spark, tmp_path):
    path = str(tmp_path / "evolved")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(path)
    spark.createDataFrame(
        [(2, "b", 3.5)], "id long, name string, score double"
    ).write.mode("append").parquet(path)

    try:
        spark.conf.set("spark.sql.parquet.mergeSchema", "true")
        merged = rd.load_parquet_footer_schema(spark, path)
        # the fast path must be skipped: the merged read sees BOTH
        # part-file schemas, which a single-footer schema cannot
        assert set(merged.columns) == {"id", "name", "score"}
    finally:
        spark.conf.unset("spark.sql.parquet.mergeSchema")

    # default session: fast path active, still a readable frame
    plain = rd.load_parquet_footer_schema(spark, path)
    assert plain.count() == 2


def test_footer_schema_read_survives_any_pyarrow_error(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "plain")
    spark.createDataFrame([(1, "x")], "id long, v string").write.parquet(path)

    import pyarrow.parquet as pq

    def boom(*_a, **_k):
        raise NotImplementedError("unsupported footer feature")

    monkeypatch.setattr(pq, "ParquetFile", boom)
    df = rd.load_parquet_footer_schema(spark, path)
    assert [tuple(r) for r in df.collect()] == [(1, "x")]


def test_footer_schema_fast_path_matches_inferred(spark, tmp_path):
    path = str(tmp_path / "single")
    spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(10)],
        "id long, name string, score double",
    ).write.parquet(path)
    fast = rd.load_parquet_footer_schema(spark, path)
    inferred = spark.read.parquet(path)
    assert fast.schema == inferred.schema
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, inferred.collect())
    )
