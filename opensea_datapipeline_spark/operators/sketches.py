"""Mergeable frequency/cardinality sketches with DETERMINISTIC hashing.

heavy_hitters (aggregates.py) answers "which keys are frequent" with
bounded state; these answer the two sibling questions a 100 TB profile
pass asks — "how frequent is THIS key" (Count-Min, Cormode &
Muthukrishnan 2005) and "how many distinct keys are there" (KMV /
bottom-k, Bar-Yossef et al. 2002) — also in bounded state.

Both use md5-derived hashes (not Spark's xxhash64/rand): md5 is the one
hash both engines evaluate identically, so every estimate is REPLAYABLE
by the DuckDB oracle and hash-graded, the same determinism contract as
train_test_split / weighted_sample_docs. Estimates are data, not flaky
floats: same input → same sketch → same estimate, on any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 16^15 = 2^60: md5's first 15 hex chars as a uniform integer in [0, 2^60)
_HEX15_SPAN = float(1 << 60)


def _h15(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def count_min_estimates(
    df: DataFrame,
    col: str,
    probes: DataFrame,
    *,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cm-v1",
) -> DataFrame:
    """Count-Min frequency estimates for ``probes[col]`` against the
    stream ``df[col]``: depth×width counters, estimate = min over rows
    of the probed counter (always ≥ the true count; overestimate ≤
    2N/width with prob 1-2^-depth).

    Build is ONE pass: each row explodes to ``depth`` (row, bucket)
    cells and the groupBy's map-side partial aggregation collapses them
    to ≤ depth·width rows per task BEFORE the exchange — the shuffle
    carries the sketch, never the stream, which is the whole point at
    100 TB (a trillion-row column profiles through a 4×1024 table).
    The probe side computes the same bucket expressions and joins the
    broadcast sketch. All-integer arithmetic; the bucket hash is
    md5-derived so the DuckDB oracle replays it bit-for-bit.

    The ``depth`` rows slice ONE md5 per input row into disjoint 8-hex
    (32-bit) windows rather than paying ``depth`` md5 evaluations — the
    build is hash-CPU-bound (measured: 4×md5 cost ~5.7 s vs the 1.1 s
    exact groupBy at 10M rows), the slices are each uniform, and the
    per-row independence CM needs across rows is md5's. ``depth`` ≤ 4
    (32 hex chars / 8).

    Returns one row per probe key: (col, est) — callers join exact
    counts alongside where they want the error surfaced.
    """
    if depth > 4:
        raise ValueError("depth > 4 needs more than one md5 (32 hex / 8)")
    digest = F.md5(F.concat(F.lit(f"{salt}_"), F.col(col).cast("string")))
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (
                    F.conv(
                        F.substring(digest, 1 + 8 * j, 8), 16, 10
                    ).cast("long")
                    % width
                ).alias("b"),
            )
            for j in range(depth)
        ]
    )
    cm = (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    probe_cells = probes.select(
        col, F.explode(cells).alias("c")
    ).select(col, F.col("c.j").alias("j"), F.col("c.b").alias("b"))
    return (
        probe_cells.join(F.broadcast(cm), ["j", "b"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).cast("long").alias("est"))
    )


def kmv_distinct(
    df: DataFrame,
    col: str,
    *,
    k: int = 64,
    salt: str = "kmv-v1",
) -> DataFrame:
    """KMV (bottom-k) distinct-count estimate in bounded state: hash
    every value to a uniform 60-bit integer, keep the k smallest
    DISTINCT hashes, estimate (k-1) / (m_k / 2^60) where m_k is the
    k-th smallest. Unbiased for the distinct count; rel. error ~
    1/sqrt(k-2).

    The candidate pass is a mapInPandas per-partition k-min-distinct
    (state O(k) per task, emits ≤ k rows per partition — the
    heavy_hitters discipline): every one of the global k smallest
    distinct hashes is among its own partition's k smallest, so the
    pass is LOSSLESS and the exact finish (distinct + TakeOrdered k)
    runs over ≤ k·partitions candidate rows, never the stream. A
    `distinct().orderBy().limit(k)` would shuffle the full key
    cardinality — the thing the sketch exists to avoid.

    Returns ONE row: (k, m_k, estimate). md5 hashing makes the whole
    computation replayable by the DuckDB oracle (exact same m_k, same
    IEEE division).
    """
    import pandas as pd  # Arrow seam only

    h = df.filter(F.col(col).isNotNull()).select(
        _h15(F.concat(F.lit(f"{salt}_"), F.col(col).cast("string"))).alias(
            "h"
        )
    )

    def local_kmin(batches):
        best: set = set()
        for b in batches:
            for v in b["h"].to_numpy():
                best.add(int(v))
                if len(best) > 4 * k:
                    best = set(sorted(best)[:k])
        if best:
            yield pd.DataFrame({"h": sorted(best)[:k]})

    cand = h.mapInPandas(
        local_kmin, schema=T.StructType([T.StructField("h", T.LongType())])
    )
    kth = (
        cand.distinct()
        .orderBy("h")
        .limit(k)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("h").alias("m_k"),
        )
    )
    est = F.round(
        F.lit(float(k - 1)) / (F.col("m_k").cast("double") / F.lit(_HEX15_SPAN)),
        6,
    )
    return kth.select(
        F.lit(k).cast("long").alias("k"),
        F.col("m_k"),
        # fewer than k distinct values seen -> the bottom-k set IS the
        # exact distinct set; report it exactly instead of extrapolating
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(est)
        .alias("estimate"),
    )


def kmv_distinct_by_group(
    df: DataFrame,
    group_col: str,
    col: str,
    *,
    k: int = 64,
    salt: str = "kmv-v1",
) -> DataFrame:
    """Grouped KMV: one bottom-k distinct-count sketch PER GROUP — the
    column-profiler shape ("distinct users per event type / distinct
    values per partition") that an exact countDistinct answers with a
    full-cardinality shuffle per group.

    Same lossless two-phase plan as :func:`kmv_distinct`, grouped: the
    mapInPandas candidate pass keeps k smallest distinct hashes per
    (partition, group) — state O(k·groups-per-partition), emission
    ≤ k·groups rows per partition — then the exact finish re-ranks the
    candidate union with a group-partitioned row_number window (never
    SinglePartition; the window input is candidate-sized, not
    stream-sized). Groups with < k distinct values report exactly.

    Returns one row per group: (group_col, k, m_k, estimate).
    """
    import pandas as pd  # Arrow seam only

    from pyspark.sql import Window

    h = df.filter(
        F.col(col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        _h15(F.concat(F.lit(f"{salt}_"), F.col(col).cast("string"))).alias(
            "h"
        ),
    )

    def local_kmin(batches):
        best: dict = {}
        for b in batches:
            for g, v in zip(b["g"].to_numpy(), b["h"].to_numpy()):
                s = best.setdefault(g, set())
                s.add(int(v))
                if len(s) > 4 * k:
                    best[g] = set(sorted(s)[:k])
        if best:
            rows = [
                (g, v) for g, s in best.items() for v in sorted(s)[:k]
            ]
            yield pd.DataFrame(rows, columns=["g", "h"])

    g_field = h.schema["g"].dataType
    cand = h.mapInPandas(
        local_kmin,
        schema=T.StructType(
            [T.StructField("g", g_field), T.StructField("h", T.LongType())]
        ),
    )
    w = Window.partitionBy("g").orderBy("h")
    kth = (
        cand.distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("h").alias("m_k"),
        )
    )
    est = F.round(
        F.lit(float(k - 1)) / (F.col("m_k").cast("double") / F.lit(_HEX15_SPAN)),
        6,
    )
    return kth.select(
        F.col("g").alias(group_col),
        F.lit(k).cast("long").alias("k"),
        F.col("m_k"),
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(est)
        .alias("estimate"),
    )
