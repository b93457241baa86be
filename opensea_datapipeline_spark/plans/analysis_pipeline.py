"""Research/analysis pipeline — the analog of the reference's
``prepare_visual_market_data.py`` + ``analyze_visual_cycles.py`` +
``analyze_peer_effects.py`` entry points (SURVEY.md §3.2-3.3), composed
from the engine's operators into one distributed flow:

1. market regime labeling (interval join, J6) and monthly stats (A10);
2. KMeans visual clusters over the embedding table (F6);
3. cluster × regime performance (A11) with one-way ANOVA effect sizes
   (F5) — the reference's `analyze_visual_cycles.py:66-74, 188-222`;
4. KNN neighbor map (J8) → trailing-window peer aggregates (J7/A12) →
   per-cluster OLS of price on peer mean (F4) — the reference's
   `analyze_peer_effects.py` study, whose pandas row loops become two
   hash joins, a window, and one grouped-map pandas UDF.

No collect() on any data path; the only driver-side values are the
returned DataFrames' lazily-evaluated plans.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import aggregates as agg
from ..operators import joins as jn
from ..operators import mlstats as ms
from ..operators import similarity as sim


@dataclass
class AnalysisResult:
    monthly_stats: DataFrame
    regime_stats: DataFrame
    cluster_assignments: DataFrame
    cluster_regime_perf: DataFrame
    cluster_anova: DataFrame
    peer_aggregates: DataFrame
    peer_regressions: DataFrame


def run_analysis_pipeline(
    events: DataFrame,
    embeddings: DataFrame,
    regimes: DataFrame,
    entity_col: str = "user_id",
    vec_id_col: str = "vec_id",
    k_clusters: int = 8,
    k_neighbors: int = 5,
    peer_window_seconds: int = 3600,
) -> AnalysisResult:
    """Run the full analysis flow. ``regimes`` is (start_d, end_d, regime);
    entities are matched to embedding vectors by id equality (the
    reference matches transactions to CLIP vectors by token id,
    `prepare_visual_market_data.py:98-125`)."""
    events = events.withColumn("d", F.to_date("ts"))

    monthly = agg.monthly_stats(events, "ts", "value")

    labeled = jn.interval_join(events, regimes, "d", "start_d", "end_d", how="left")
    regime_stats = labeled.groupBy("regime").agg(
        F.count(F.lit(1)).alias("n_events"),
        agg.det_mean("value").alias("mean_value"),
        F.median("value").alias("median_value"),
    )

    clusters = sim.kmeans_clusters(
        embeddings, vec_id_col, "embedding", k=k_clusters, seed=42
    ).withColumnRenamed(vec_id_col, entity_col)

    clustered = labeled.join(F.broadcast(clusters), on=entity_col, how="inner")
    cluster_regime = clustered.groupBy("cluster_id", "regime").agg(
        agg.det_mean("value").alias("mean_value"),
        F.median("value").alias("median_value"),
        F.stddev_samp("value").alias("std_value"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(entity_col).alias("n_entities"),
    )
    anova = ms.anova_oneway(clustered, "cluster_id", "regime", "value")

    neighbors = sim.knn_topk_exact(
        embeddings, vec_id_col, "embedding", k=k_neighbors
    ).select(
        F.col("query_id").alias(entity_col),
        F.col("neighbor_id"),
    )
    peers = jn.neighbor_window_aggregate(
        events, neighbors,
        token_col=entity_col, neighbor_col="neighbor_id",
        ts_col="ts", value_col="value", id_col="event_id",
        window_seconds=peer_window_seconds,
    )
    with_price = peers.join(
        events.select("event_id", "value"), on="event_id", how="inner"
    ).join(F.broadcast(clusters), on=entity_col, how="inner")
    regressions = ms.group_ols(
        with_price, ["cluster_id"], x_col="peer_mean_price", y_col="value"
    )

    return AnalysisResult(
        monthly_stats=monthly,
        regime_stats=regime_stats,
        cluster_assignments=clusters,
        cluster_regime_perf=cluster_regime,
        cluster_anova=anova,
        peer_aggregates=peers,
        peer_regressions=regressions,
    )
