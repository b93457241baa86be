"""Round-6 tests: ADVICE hardening + ANN index build/probe split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_lsh_null_embedding_guard(spark):
    # ADVICE r5: np.vstack raised on NULL vectors; nulls must now be
    # filtered pre-UDF and simply produce no candidates (expression-path
    # semantics).
    from opensea_datapipeline_spark.operators.similarity import knn_topk_lsh
    from opensea_datapipeline_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").filter(
        F.col("vec_id") < 100
    )
    nulled = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 3, F.lit(None)).otherwise(F.col("embedding")),
    )
    res = knn_topk_lsh(nulled, "vec_id", "embedding", k=5)
    rows = res.collect()
    assert len(rows) > 0
    assert all(r.query_id != 3 and r.neighbor_id != 3 for r in rows)


def test_lit_str_array_rejects_space():
    from opensea_datapipeline_spark.operators.text import _lit_str_array

    with pytest.raises(ValueError):
        _lit_str_array(["ok", "not ok"])
