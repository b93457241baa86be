"""Differential test: every registered query with an oracle must match the
DuckDB result at sf0.001 (the driver gate runs the same comparison at
sf0.01 — this is the fast local proxy)."""

from __future__ import annotations

import pytest

from opensea_datapipeline_spark.queries import ORACLE, QUERIES

from .oracle_harness import compare_query


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    res = compare_query(spark, sf_dir, name, QUERIES[name], ORACLE[name])
    assert res.rows_spark == res.rows_oracle, (
        f"{name}: row count {res.rows_spark} != oracle {res.rows_oracle}"
    )
    assert res.cols_match, f"{name}: column sets differ"
    assert res.hash_match, f"{name}: value hash mismatch"


def test_all_queries_have_callable():
    for name, fn in QUERIES.items():
        assert callable(fn), name
