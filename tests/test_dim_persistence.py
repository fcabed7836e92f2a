"""Cross-session dim materialization: save() both dims, load() them back
(no rebuild), and get identical rollup results — the Spark twin of the
reference's CTAS-then-query-the-table lifecycle (ref :162-163,220-222).
"""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.fixtures import geo_nodes
from ibis_olap_aggregation_spark.hierarchy import HierarchyDimension
from ibis_olap_aggregation_spark.rollup import hierarchical_rollup
from ibis_olap_aggregation_spark.session import load_tables


@pytest.fixture()
def workdir():
    d = f"/tmp/spark_dim_persist_{uuid.uuid4().hex[:8]}"
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_save_load_roundtrip_and_rollup(spark, sf_small, workdir):
    t = load_tables(spark, sf_small, ("region", "nation", "customer", "orders"))
    dim = HierarchyDimension(
        geo_nodes(t["region"], t["nation"], t["customer"]),
        dimension_name="geo_p",
        sort_key_col="node_id",
        flatten_levels=4,
    )
    dim.save(workdir)
    rep, agg = HierarchyDimension.load(spark, workdir)

    assert rep.count() == dim.reporting_dim.count()
    assert agg.count() == dim.aggregation_dim.count()
    assert set(agg.columns) == set(dim.aggregation_dim.columns)

    measures = [
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("s"),
        F.count(F.lit(1)).alias("n"),
    ]
    live = {
        tuple(r)
        for r in hierarchical_rollup(
            t["orders"], dim.aggregation_dim, "o_custkey", measures
        ).collect()
    }
    loaded = {
        tuple(r)
        for r in hierarchical_rollup(t["orders"], agg, "o_custkey", measures).collect()
    }
    assert live == loaded

    # level-partitioned layout: a single-level slice prunes partitions
    lvl = agg.filter(F.col("ancestor_level_number") == 2)
    plan = lvl._jdf.queryExecution().sparkPlan().toString()
    assert "PartitionFilters: [isnotnull(ancestor_level_number" in plan
    dim.unpersist()
