"""Scale-option equivalence tests: the knobs the engine flips at 100 TB
must agree with the exact/test-scale paths they replace.

- approx_count_distinct / approx_percentile: bounded error vs exact
  (the swap-in for A3/percentiles when cardinality explodes).
- hierarchical_rollup(broadcast_dim=False): identical result via a
  shuffled join when the closure outgrows the broadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.fixtures import geo_nodes
from ibis_olap_aggregation_spark.hierarchy import HierarchyDimension
from ibis_olap_aggregation_spark.plans import inspect as pi
from ibis_olap_aggregation_spark.rollup import hierarchical_rollup
from ibis_olap_aggregation_spark.session import load_table, load_tables


def test_approx_count_distinct_within_rsd(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= max(3, 0.06 * row.exact)


def test_approx_percentile_close_to_exact(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01


def test_approx_rollup_within_bound_of_exact(spark, sf_small):
    """`hierarchy_geo_rollup_orders_approx` now ships the
    tolerance-verdict shape (exact count + within_bounds boolean, so
    the HLL path is driver-oracle-checkable) — this pins its signal
    locally: the verdict holds at every node, and every exact column
    matches the exact flagship rollup bit-for-bit."""
    from ibis_olap_aggregation_spark.queries import QUERIES

    exact = {
        r["node_name"]: r
        for r in QUERIES["hierarchy_geo_rollup_orders"](spark, sf_small).collect()
    }
    approx = {
        r["node_name"]: r
        for r in QUERIES["hierarchy_geo_rollup_orders_approx"](spark, sf_small).collect()
    }
    assert set(exact) == set(approx)
    for name, a in approx.items():
        e = exact[name]
        # exact measures ride the same plan -> identical
        assert a["sum_totalprice"] == e["sum_totalprice"], name
        assert a["count_of_fact_records"] == e["count_of_fact_records"], name
        assert a["exact_customer_count"] == e["distinct_customer_count"], name
        assert a["within_bounds"], name


def test_rollup_without_broadcast_matches(spark, sf_small):
    t = load_tables(spark, sf_small, ("region", "nation", "customer", "orders"))
    dim = HierarchyDimension(
        geo_nodes(t["region"], t["nation"], t["customer"]),
        dimension_name="geo_nb",
        sort_key_col="node_id",
        flatten_levels=4,
    )
    measures = lambda: [  # noqa: E731
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("s"),
        F.count(F.lit(1)).alias("n"),
    ]
    bc = hierarchical_rollup(
        t["orders"], dim.aggregation_dim, "o_custkey", measures()
    )
    nobc = hierarchical_rollup(
        t["orders"], dim.aggregation_dim, "o_custkey", measures(), broadcast_dim=False
    )
    got_bc = {tuple(r) for r in bc.collect()}
    got_nobc = {tuple(r) for r in nobc.collect()}
    assert got_bc == got_nobc
    # and the broadcast path really does broadcast
    assert pi.has_broadcast_join(bc)
    dim.unpersist()
