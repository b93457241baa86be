"""Per-group statistical modeling (SURVEY.md §2.10 F4/F5/F8).

The reference runs sklearn ``LinearRegression`` per strategy group
(`scripts/analysis/analyze_peer_effects.py:214-235`) and scipy one-way
ANOVA per cluster (`scripts/analysis/analyze_visual_cycles.py:188-222`)
over pandas frames on one machine. Here:

- ``group_ols``: grouped-map pandas UDF (``applyInPandas``) — each group's
  rows arrive as one Arrow batch, OLS is the closed-form normal-equation
  solution, output is one row per group. Scales to any number of groups;
  per-group data must fit an executor (true for per-entity regressions).
- ``anova_oneway``: F-statistic and effect size (η²) from *sums only* —
  pure built-in aggregates, two shuffles, no UDF and no per-group memory
  requirement. (p-values need an F-distribution CDF — scipy — which is
  deliberately out of the engine; η² + F carry the same information for
  ranking effects, and the reference's η² is itself pure SQL,
  `analyze_visual_cycles.py:207-211`.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    digits: int = 6,
) -> DataFrame:
    """F4: per-group simple OLS of y on x via ``applyInPandas``.

    Returns (group_cols..., slope, intercept, r2, n_obs). Closed-form
    moment solution (same formulas as SQL ``regr_slope``/``regr_r2``), so
    the DuckDB oracle is exact up to float-summation order; outputs are
    rounded to ``digits`` to absorb that.
    """
    import pandas as pd

    out_fields = ", ".join(
        f"`{c}` {t}" for c, t in zip(
            group_cols, [df.schema[c].dataType.simpleString() for c in group_cols]
        )
    )
    schema = f"{out_fields}, slope double, intercept double, r2 double, n_obs long"

    def ols(pdf: pd.DataFrame) -> pd.DataFrame:
        sub = pdf[[x_col, y_col]].dropna()
        x = sub[x_col].astype("float64")
        y = sub[y_col].astype("float64")
        n = len(sub)
        keys = {c: [pdf[c].iloc[0]] for c in group_cols}
        if n < 2:
            return pd.DataFrame({**keys, "slope": [None], "intercept": [None],
                                 "r2": [None], "n_obs": [n]})
        mx, my = x.mean(), y.mean()
        sxx = ((x - mx) ** 2).sum()
        syy = ((y - my) ** 2).sum()
        sxy = ((x - mx) * (y - my)).sum()
        slope = sxy / sxx if sxx > 0 else None
        intercept = my - slope * mx if slope is not None else None
        r2 = (sxy * sxy) / (sxx * syy) if sxx > 0 and syy > 0 else None
        rnd = lambda v: None if v is None else round(float(v), digits)
        return pd.DataFrame({**keys, "slope": [rnd(slope)],
                             "intercept": [rnd(intercept)], "r2": [rnd(r2)],
                             "n_obs": [n]})

    return df.groupBy(*group_cols).applyInPandas(ols, schema=schema)


def anova_oneway(
    df: DataFrame,
    group_col: str,
    class_col: str,
    value_col: str,
    digits: int = 6,
) -> DataFrame:
    """F5: one-way ANOVA of ``value_col`` across ``class_col`` levels,
    computed independently for each ``group_col`` partition.

    F = (SSB/(k-1)) / (SSW/(N-k)); η² = SSB/SST. Two-level aggregation:
    per-(group, class) means/counts, then per-group combine — all
    built-ins, fully distributed.
    """
    per_class = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, class_col)
        .agg(
            F.count(F.lit(1)).alias("n_c"),
            F.sum(value_col).alias("sum_c"),
            F.sum(F.col(value_col) * F.col(value_col)).alias("sumsq_c"),
        )
    )
    per_group = per_class.groupBy(group_col).agg(
        F.sum("n_c").alias("n_total"),
        F.count(F.lit(1)).alias("k_classes"),
        F.sum("sum_c").alias("sum_total"),
        F.sum("sumsq_c").alias("sumsq_total"),
        F.sum(F.col("sum_c") * F.col("sum_c") / F.col("n_c")).alias("sum_groupsq"),
    )
    grand_mean_sq = F.col("sum_total") * F.col("sum_total") / F.col("n_total")
    sst = F.col("sumsq_total") - grand_mean_sq
    ssb = F.col("sum_groupsq") - grand_mean_sq
    ssw = F.col("sumsq_total") - F.col("sum_groupsq")
    k = F.col("k_classes")
    n = F.col("n_total")
    f_stat = F.when(
        (k > 1) & (n > k) & (ssw > 0), (ssb / (k - 1)) / (ssw / (n - k))
    )
    eta_sq = F.when(sst > 0, ssb / sst)
    return per_group.select(
        group_col,
        F.col("n_total").cast("long").alias("n_total"),
        F.col("k_classes").cast("long").alias("k_classes"),
        F.round(f_stat, digits).alias("f_stat"),
        F.round(eta_sq, digits).alias("eta_squared"),
    )


def spearman_corr(
    df: DataFrame, x_col: str, y_col: str, digits: int = 6
) -> DataFrame:
    """F8: Spearman rank correlation as Pearson over rank windows
    (average-rank ties), one row out. Ranks are global windows over an
    already-reduced series in every reference use (daily/monthly frames),
    so the single-partition window is bounded."""
    from pyspark.sql import Window

    rn = df.select(
        x_col,
        y_col,
        F.row_number().over(Window.orderBy(x_col, y_col)).alias("_rx"),
        F.row_number().over(Window.orderBy(y_col, x_col)).alias("_ry"),
    )
    ranked = rn.select(
        F.avg("_rx").over(Window.partitionBy(x_col)).alias("rank_x"),
        F.avg("_ry").over(Window.partitionBy(y_col)).alias("rank_y"),
    )
    return ranked.agg(F.round(F.corr("rank_x", "rank_y"), digits).alias("spearman"))


def chisq_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, entirely in built-ins: one (a, b) count aggregate, row /
    column marginals from windows over that small contingency table
    (never re-scanning the fact table), then sum((o-e)^2/e) and
    dof=(A-1)(B-1) in a single final reduce. Expected counts are
    integer-product doubles (exact below 2^53), so the only float work
    is the final division/sum — deterministic cross-engine under
    round-6.

    The chi2_crit_* interpretation is left to the caller (no scipy in
    the engine); the statistic + dof are the portable outputs.
    """
    from pyspark.sql import Window

    obs = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("o"))
    n_a = F.sum("o").over(Window.partitionBy(col_a))
    n_b = F.sum("o").over(Window.partitionBy(col_b))
    n = F.sum("o").over(Window.partitionBy())
    e = (F.col("n_a") * F.col("n_b")).cast("double") / F.col("n")
    term = (F.col("o") - e) * (F.col("o") - e) / e
    return (
        obs.withColumn("n_a", n_a)
        .withColumn("n_b", n_b)
        .withColumn("n", n)
        .agg(
            F.round(F.sum(term), 6).alias("chi2"),
            (
                (F.count_distinct(F.col(col_a)) - 1)
                * (F.count_distinct(F.col(col_b)) - 1)
            ).cast("long").alias("dof"),
            F.max("n").cast("long").alias("n_obs"),
        )
    )
