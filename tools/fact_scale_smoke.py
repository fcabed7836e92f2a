"""Empirical scale smoke for the FACT side: amplify sf0.1 orders and
lineitem Nx (default 10x ~ 6M lineitem) with key-remapped copies —
dimensions stay fixed, as they do in a real warehouse — then time the
flagship closure rollups and the heaviest TPC-H shapes at base vs
amplified scale. The point is the SHAPE of the numbers: closure-rollup
and join-agg cost must grow ~linearly in fact count (the dims/closures
are broadcast, so the only growing cost is the fact scan + leaf-grain
partial aggregation + the node-sized shuffle), and the plans must not
flip to anything quadratic or fact-shuffling.

Usage: python tools/fact_scale_smoke.py [amplification]
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

from ibis_olap_aggregation_spark.queries import QUERIES
from ibis_olap_aggregation_spark.session import get_spark, load_table

AMP = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = "/root/testdata/sf0.1"

# the flagship closure rollups + the TPC-H shapes that stress joins and
# aggregation hardest at fact scale
TIMED = [
    "hierarchy_geo_rollup_orders",
    "hierarchy_part_rollup_lineitem",
    "agg_approx_distinct_rollup",
    "tpch_q3_shipping_priority",
    "tpch_q9_product_type_profit",
    "tpch_q21_waiting_orders",
    # round-12 second batch: the bloom prune's broadcast side is
    # position-capped, so cost must grow ~linearly in probe volume
    "join_bloom_pruned_semi",
    # round 14: the three-ranking curve comparison — two map-side curve
    # keys + three range-partitioned global rankings over the same
    # cached scan; must track the ranker's ~linear growth
    "layout_hilbert_vs_zorder_skipping",
    # round 14b: one fact scan into a distinct exchange whose OUTPUT is
    # bound by the fixed customer population + constant-size register
    # joins — the scan grows 10x, the shuffle output does not, so the
    # ratio must sit well under the fact growth
    "sketch_hll_portable_registers",
    # round 14c: x4-exploded fact scan into a CONSTANT-size counter
    # table (2048 rows) + TakeOrdered top-10 — scan-bound, so the
    # ratio must track the fact growth with no superlinear term
    "sketch_cms_heavy_hitters",
    # round 14c continued: fact scan into a <= |grps| x ~400-code
    # register aggregate + the percentile_disc exact branch — both
    # scan-bound, registers constant-size
    "sketch_hdr_quantiles",
]


def _mat(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time(fn, *args) -> float:
    best = None
    for _ in range(2):  # min-of-2: steady state, not JIT luck
        t0 = time.perf_counter()
        _mat(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    spark = get_spark("fact-scale-smoke")
    work = tempfile.mkdtemp(prefix="fact_scale_")
    # copy the non-growing tables verbatim (dims + the doc/emb tables
    # some registry queries load eagerly)
    for t in ("region", "nation", "customer", "supplier", "part",
              "events", "documents", "embeddings"):
        shutil.copy(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(work, f"{t}.parquet")
        )

    # amplify orders and lineitem with consistent key remapping: copy k
    # of order O becomes key O*AMP+k, and carries copy k of O's
    # lineitems — join integrity (orders<->lineitem) is preserved, and
    # each customer/part accumulates AMP x the facts, exactly how a
    # warehouse grows against a fixed dimension population
    ks = spark.range(AMP).select(F.col("id").alias("k"))
    orders = load_table(spark, SRC, "orders")
    lineitem = load_table(spark, SRC, "lineitem")
    orders.crossJoin(ks).withColumn(
        "o_orderkey", F.col("o_orderkey") * AMP + F.col("k")
    ).drop("k").write.parquet(os.path.join(work, "orders.parquet"))
    lineitem.crossJoin(ks).withColumn(
        "l_orderkey", F.col("l_orderkey") * AMP + F.col("k")
    ).drop("k").write.parquet(os.path.join(work, "lineitem.parquet"))

    n_o = load_table(spark, work, "orders").count()
    n_l = load_table(spark, work, "lineitem").count()
    print(f"amplified facts: orders={n_o}, lineitem={n_l} (x{AMP})")

    # warm both dirs so timings measure the engine, not cold file IO
    for d in (SRC, work):
        for t in ("orders", "lineitem", "region", "nation", "customer",
                  "supplier", "part"):
            load_table(spark, d, t).count()

    timed = TIMED
    only = os.environ.get("SPARK_GRAFT_SMOKE_ONLY")
    if only:
        requested = only.split(",")
        unknown = [n for n in requested if n not in TIMED]
        if unknown:
            # fail loudly: a typo would otherwise "succeed" measuring
            # nothing (code-review r12b)
            raise SystemExit(f"SPARK_GRAFT_SMOKE_ONLY names not in TIMED: {unknown}")
        timed = [n for n in TIMED if n in requested]

    print(f"{'query':38s} {'base_s':>8s} {'amp_s':>8s} {'ratio':>6s}  (amp={AMP}x)")
    for name in timed:
        fn = QUERIES[name]
        base_t = _time(fn, spark, SRC)
        amp_t = _time(fn, spark, work)
        print(
            f"{name:38s} {base_t:8.2f} {amp_t:8.2f} {amp_t / base_t:6.2f}"
        )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()


# Measured 2026-08-14 (local[32], shared VM), AMP=10 (6.0M lineitem,
# 1.5M orders; dims fixed). Every ratio is far below the 10x fact
# growth — the leaf-grain + broadcast-closure design absorbs fact
# volume, and the sketch rollup (whose cost is bound by the FIXED leaf
# key count, not facts) does not grow at all:
#   query                            base_s   amp_s  ratio
#   hierarchy_geo_rollup_orders        1.40    1.95   1.40
#   hierarchy_part_rollup_lineitem     2.81   12.38   4.41
#   agg_approx_distinct_rollup         1.20    0.91   0.76
#   tpch_q3_shipping_priority          0.76    1.16   1.52
#   tpch_q9_product_type_profit        1.04    3.14   3.03
#   tpch_q21_waiting_orders            1.77    4.99   2.81
#
# AMP=100 (60M lineitem, 15M orders), same method:
#   query                            base_s   amp_s  ratio
#   hierarchy_geo_rollup_orders        1.25    7.82   6.26
#   hierarchy_part_rollup_lineitem     3.74   81.53  21.82
#   agg_approx_distinct_rollup         1.00    4.34   4.33
#   tpch_q3_shipping_priority          0.72    9.98  13.87
#   tpch_q9_product_type_profit        1.17    4.88   4.18
#   tpch_q21_waiting_orders            1.80   17.12   9.50
# The split between the two rollups is the design showing through: the
# geo rollup's COUNT(DISTINCT custkey) dedups to the FIXED leaf-key
# space (6.3x at 100x facts), while the part rollup's
# COUNT(DISTINCT orderkey) genuinely grows with facts (21.8x) — and the
# sketch rollup stays near-flat either way (4.3x). Nothing superlinear,
# no plan flips.
