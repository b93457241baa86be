"""PageRank iteration scaling (r10): wall per power iteration as the
edge list grows 100x, plus the lineage-truncation check — without the
localCheckpoint every 3 iterations the logical plan (and per-iteration
planning time) grows with the iteration index; with it, per-iteration
wall must stay FLAT across iterations at every size.

Graph model: deterministic pseudo-random sparse digraph — node count
N = edges/8, src = xxhash64(i) mod N, dst = xxhash64(i, salt) mod N
(no RNG, reproducible), symmetrized by the operator.

Run:  python scripts/scaling_pagerank.py [--scales=1,10,100]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opensea_datapipeline_spark.operators.graph import pagerank  # noqa: E402
from opensea_datapipeline_spark.session import get_spark  # noqa: E402

BASE_EDGES = 100_000


def build(spark, mult: int):
    m = BASE_EDGES * mult
    n = m // 8
    return spark.range(m).select(
        F.pmod(F.xxhash64("id"), F.lit(n)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit("dst-salt")), F.lit(n)).alias("dst"),
    )


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark("scaling-pagerank")
    spark.sparkContext.setLogLevel("ERROR")
    legs = []
    for mult in scales:
        edges = build(spark, mult).localCheckpoint(eager=True)
        m = edges.count()
        # Setup (edge symmetrize + checkpoint + node count) dominates a
        # naive wall ratio, so measure MARGINAL per-iteration cost:
        # early = (wall(5)-wall(2))/3, late = (wall(10)-wall(5))/5.
        # Lineage truncation working <=> late ≈ early (a lineage
        # blow-up makes late iterations strictly more expensive).
        walls = {}
        for iters in (10, 2, 5, 10):  # first 10 warms JIT, then measure
            t0 = time.time()
            pagerank(edges, iters=iters, undirected=True).write.mode(
                "overwrite"
            ).format("noop").save()
            walls[iters] = time.time() - t0
        early = (walls[5] - walls[2]) / 3
        late = (walls[10] - walls[5]) / 5
        row = {
            "mult": mult,
            "edges": m,
            "wall_10it_s": round(walls[10], 3),
            "per_iter_early_s": round(early, 3),
            "per_iter_late_s": round(late, 3),
        }
        legs.append(row)
        print(json.dumps(row))
    print(json.dumps({"legs": legs}))


if __name__ == "__main__":
    main()
