"""Empirical scale smoke for the GRAPH axis: the co-purchase graph the
graph family (triangles, PageRank, connected components, cosine) is
built on. Two independent growth axes, because they stress different
failure modes:

- replica mode (default): amplify lineitem/orders/part Nx with
  DISJOINT key remapping — copy k of order O carries copy k of its
  parts, offset into a fresh key range. Edges, nodes and triangles all
  grow ~Nx while degrees stay fixed: cost must grow ~linearly, and a
  superlinear ratio means an operator is quadratic in GRAPH SIZE.
- density mode (``density D``): merge D consecutive orders into one
  basket (l_orderkey // D) — basket size grows ~Dx, so the pair
  fan-out per basket grows ~D^2 and hub degrees climb. This is the
  skew/fan-out cliff axis: the O(k^2/order) pair build and the
  adjacency-array intersection are DESIGNED to be bounded by basket
  size, and this mode measures what happens when that bound moves.

Usage:
  python tools/graph_scale_smoke.py [amplification]     # replica mode
  python tools/graph_scale_smoke.py density [D]         # density mode

Env knobs:
  SPARK_GRAFT_SMOKE_ONLY=name1,name2   time only these queries
  SPARK_GRAFT_PAGERANK_CAP=N           force PAGERANK_BROADCAST_NODE_CAP
      (e.g. 1000 forces the sort-merge regime for the rank-vector /
      support attaches at real scale — VERDICT r10 item 5: exercise the
      merge regime end-to-end at the x10-edge graph, like the triangle
      switch got in r9)

Writes nothing to the repo; amplified parquet lives under /tmp.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.operators.graph import (
    copurchase_pairs,
    order_items,
)
from ibis_olap_aggregation_spark.queries import QUERIES
from ibis_olap_aggregation_spark.session import (
    get_spark,
    load_table,
    release_query_caches,
)

SRC = "/root/testdata/sf0.1"

TIMED = [
    "graph_triangle_clustering",
    "graph_pagerank_copurchase",
    "graph_connected_components",
    "graph_copurchase_cosine",
    "graph_kcore_peel",
    "graph_adamic_adar",
    # round 13: the unweighted set-overlap twin of adamic — same wedge
    # machinery, so it must track the adamic line on the order axis
    "graph_jaccard_neighbors",
]


def _mat(df) -> None:
    df.write.format("noop").mode("overwrite").save()
    release_query_caches()


def _time(fn, *args) -> float:
    best = None
    for _ in range(2):  # min-of-2: steady state, not JIT luck
        t0 = time.perf_counter()
        _mat(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    density_mode = len(sys.argv) > 1 and sys.argv[1] == "density"
    amp = int(sys.argv[2]) if density_mode and len(sys.argv) > 2 else (
        int(sys.argv[1]) if not density_mode and len(sys.argv) > 1 else 10
    )
    timed = TIMED
    only = os.environ.get("SPARK_GRAFT_SMOKE_ONLY")
    if only:
        timed = [n for n in TIMED if n in only.split(",")]
    cap = os.environ.get("SPARK_GRAFT_PAGERANK_CAP")
    if cap:
        from ibis_olap_aggregation_spark.operators import graph as _g

        _g.PAGERANK_BROADCAST_NODE_CAP = int(cap)
        print(f"PAGERANK_BROADCAST_NODE_CAP forced to {cap} (merge regime)")
    spark = get_spark("graph-scale-smoke")
    work = tempfile.mkdtemp(prefix="graph_scale_")
    for t in ("region", "nation", "customer", "supplier",
              "events", "documents", "embeddings"):
        shutil.copy(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(work, f"{t}.parquet")
        )

    lineitem = load_table(spark, SRC, "lineitem")
    orders = load_table(spark, SRC, "orders")
    part = load_table(spark, SRC, "part")
    if density_mode:
        # merge amp consecutive orders into one basket: degrees grow
        lineitem.withColumn(
            "l_orderkey", (F.col("l_orderkey") / amp).cast("bigint")
        ).write.parquet(os.path.join(work, "lineitem.parquet"))
        orders.withColumn(
            "o_orderkey", (F.col("o_orderkey") / amp).cast("bigint")
        ).dropDuplicates(["o_orderkey"]).write.parquet(
            os.path.join(work, "orders.parquet")
        )
        shutil.copy(
            os.path.join(SRC, "part.parquet"), os.path.join(work, "part.parquet")
        )
        label = f"density x{amp}"
    else:
        # disjoint replicas: copy k of an order carries copy k of its
        # parts in a fresh key range — graph size grows, degrees don't
        maxp = part.agg(F.max("p_partkey")).first()[0] + 1
        ks = spark.range(amp).select(F.col("id").alias("k"))
        lineitem.crossJoin(ks).withColumn(
            "l_orderkey", F.col("l_orderkey") * amp + F.col("k")
        ).withColumn(
            "l_partkey", F.col("l_partkey") + F.col("k") * maxp
        ).drop("k").write.parquet(os.path.join(work, "lineitem.parquet"))
        orders.crossJoin(ks).withColumn(
            "o_orderkey", F.col("o_orderkey") * amp + F.col("k")
        ).drop("k").write.parquet(os.path.join(work, "orders.parquet"))
        part.crossJoin(ks).withColumn(
            "p_partkey", F.col("p_partkey") + F.col("k") * maxp
        ).drop("k").write.parquet(os.path.join(work, "part.parquet"))
        label = f"replicas x{amp}"

    for d in (SRC, work):
        for t in ("lineitem", "orders", "part"):
            load_table(spark, d, t).count()
        e = copurchase_pairs(order_items(spark, d)).count()
        print(f"{d}: co-purchase edges = {e}")

    print(f"{'query':34s} {'base_s':>8s} {'amp_s':>8s} {'ratio':>6s}  ({label})")
    for name in timed:
        fn = QUERIES[name]
        base_t = _time(fn, spark, SRC)
        amp_t = _time(fn, spark, work)
        print(f"{name:34s} {base_t:8.2f} {amp_t:8.2f} {amp_t / base_t:6.2f}")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

# Measured 2026-08-15 (local[32], shared VM), replica mode x10
# (co-purchase edges 1.196M -> 11.96M; nodes & triangles x10, degrees
# fixed). Every ratio is at or below the 10x edge growth — linear in
# graph size, no plan flips; triangles ran the >5M-edge SORT-MERGE
# regime (TRIANGLE_BROADCAST_EDGE_CAP auto-switch) end to end:
#   query                              base_s    amp_s  ratio
#   graph_triangle_clustering            6.17    48.38   7.84
#   graph_pagerank_copurchase            7.16    44.87   6.26
#   graph_connected_components           3.34     7.95   2.38
#   graph_copurchase_cosine              2.16     6.40   2.97
#
# Density mode x3 (3 orders merged per basket: edges 1.196M -> 3.56M,
# pair fan-out per basket ~x9, hub degrees ~x3). The per-basket O(k^2)
# pair build and the adjacency-intersection enumeration absorb the
# fan-out — nothing quadratic surfaces at the operator level:
#   query                              base_s    amp_s  ratio
#   graph_triangle_clustering            7.19    10.75   1.50
#   graph_pagerank_copurchase            7.06     7.49   1.06
#   graph_connected_components           3.17     2.69   0.85
#   graph_copurchase_cosine              1.64     2.22   1.35
#
# Round 11 (2026-08-15), k-core added to both axes (VERDICT r10 item
# 4). Peeling-round structure holds on both: no round-count or
# per-round-cost cliff (time ~ edges, never fan-out^2):
#   graph_kcore_peel   replica x10:       3.55     9.36   2.64
#   graph_kcore_peel   density x3:        2.92    10.12   3.47
#
# Round 11 (2026-08-15), PageRank/support MERGE regime at real scale
# (VERDICT r10 item 5): SPARK_GRAFT_PAGERANK_CAP=1000 forces every
# node-sized attach (rank vector, part-name decorate, cosine supports)
# to sort-merge; replica x10 = 12M edges, both scales run the merge
# regime end-to-end — sub-linear vs the x10 edge growth, no cliff:
#   graph_pagerank_copurchase (merge)     9.07    24.92   2.75
#   graph_copurchase_cosine   (merge)     2.44    10.92   4.48
