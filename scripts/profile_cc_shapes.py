"""Bench connected_components (min-label) vs connected_components_two_phase
(large-star/small-star) on the two extreme graph shapes (VERDICT r4 task #8):

  blobs   near-dup threshold graph: many small dense cliques (the shape
          LSH/simhash candidate pairs actually produce) — diameter ~1
  chain   one long path — diameter = n, the adversarial case for
          min-label propagation (needs ~diameter rounds)

Run:  python scripts/profile_cc_shapes.py [n_nodes]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opensea_datapipeline_spark.session import get_spark
from opensea_datapipeline_spark.operators import dedup as dd


def blob_edges(spark, n_nodes, clique=8):
    """Cliques of `clique` nodes: node i belongs to blob i//clique."""
    ids = spark.range(n_nodes).select(F.col("id"))
    a = ids.alias("a")
    b = ids.alias("b")
    return (
        a.join(
            b,
            (F.col("a.id") < F.col("b.id"))
            & (
                (F.col("a.id") / clique).cast("long")
                == (F.col("b.id") / clique).cast("long")
            ),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )


def chain_edges(spark, n_nodes):
    return spark.range(n_nodes - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )


def run(algo, nodes, edges, **kw):
    t0 = time.perf_counter()
    try:
        out = algo(nodes, edges, **kw)
        n_groups = out.select("group_id").distinct().count()
        return round(time.perf_counter() - t0, 3), n_groups, None
    except Exception as exc:
        return round(time.perf_counter() - t0, 3), None, str(exc)[:120]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    spark = get_spark("cc-shapes")
    spark.sparkContext.setLogLevel("ERROR")
    nodes = spark.range(n).select(F.col("id"))
    report = {"n_nodes": n, "shapes": {}}
    for shape, edges in (
        ("blobs", blob_edges(spark, n)),
        ("chain", chain_edges(spark, n)),
    ):
        e = edges.localCheckpoint(eager=True)
        res = {}
        for name, algo, kw in (
            ("min_label", dd.connected_components,
             {"max_iter": 40, "assume_distinct": True}),
            ("two_phase", dd.connected_components_two_phase, {"max_iter": 40}),
            # small_graph_edges=0: this profile compares the DISTRIBUTED
            # shapes (min-label vs star); the r13 gate would collect the
            # 20k-edge fixtures to the driver and measure nothing
            ("auto", dd.connected_components_auto,
             {"assume_distinct": True, "small_graph_edges": 0}),
        ):
            sec, groups, err = run(algo, nodes, e, **kw)
            res[name] = {"sec": sec, "groups": groups, "err": err}
        report["shapes"][shape] = res
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
