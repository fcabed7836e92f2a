"""Isolated per-query timing + plan capture for optimization work.

Usage: python tools/qtime.py [--reps N] [--explain DIR] [--sf SF_DIR] name...

Times each named registry query (or dim build: geo_dim_build etc.) with
``--reps`` noop-sink materializations (median + min + max printed), after
the same table warmup bench.py does. With ``--explain DIR`` also writes
``DIR/<name>.txt`` holding the query's ``explain("formatted")`` output.
Measurement-only helper; never touches BENCH_HISTORY.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ibis_olap_aggregation_spark import queries as q
from ibis_olap_aggregation_spark.session import (
    get_spark,
    load_table,
    release_query_caches,
)

DIM_BUILDS = {
    "geo_dim_build": lambda spark, sf: q._geo_dim(spark, sf).aggregation_dim,
    "part_dim_build": lambda spark, sf: q._part_dim(spark, sf).aggregation_dim,
    "deep_binary_dim_build": lambda spark, sf: q._deep_dim(spark, sf).aggregation_dim,
    "deep_chain_dim_build": lambda spark, sf: q._chain_dim(spark, sf).aggregation_dim,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--explain", default=None)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    spark = get_spark("qtime")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        load_table(spark, args.sf, t).count()
    for name in args.names:
        fn = DIM_BUILDS.get(name) or q.QUERIES.get(name)
        if fn is None:
            print(f"{name}: NOT FOUND")
            continue
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            release_query_caches()
        ts = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            release_query_caches()
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: median={statistics.median(ts):.3f} "
            f"min={min(ts):.3f} max={max(ts):.3f} n={len(ts)}"
        )


if __name__ == "__main__":
    main()
