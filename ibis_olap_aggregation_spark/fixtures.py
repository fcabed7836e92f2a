"""Fixture builders.

1. The reference's grocery-store fixture (7-node product hierarchy +
   8 sales facts; reference sql/create_grocery_store_database.sql:17-143)
   with DETERMINISTIC surrogate keys — the reference defaults node_id to
   uuid() (ref sql :3) which makes sibling sort order vary per build
   (SURVEY.md §7.5.1); we key nodes as ``n<natural_key>``.

2. Derived adjacency-list hierarchies over the driver testdata
   (FIXTURES.md §2): geography (root -> region -> nation -> customer)
   and product (root -> brand -> type -> part). Node ids are
   deterministic zero-padded strings so lexicographic id order ==
   natural sibling order, reproducible in the DuckDB oracle.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "grocery_nodes",
    "grocery_facts",
    "geo_nodes",
    "part_nodes",
    "GEO_NODES_SQL",
    "PART_NODES_SQL",
]

_GROCERY_NODES = [
    # (node_natural_key, node_name, level_name, parent_natural_key)
    (0, "All Products", "Total Products", None),
    (10, "Produce", "Category", 0),
    (101, "Spinach", "UPC", 10),
    (102, "Tomatoes", "UPC", 10),
    (20, "Candy", "Category", 0),
    (201, "Hershey Bar", "UPC", 20),
    (202, "Nerds", "UPC", 20),
]

_GROCERY_FACTS = [
    # (product_id, customer_id, date_id, unit_quantity, sales_amount)
    (201, "Phil", "2022-01-01", 1, 3.00),
    (201, "Lottie", "2022-01-02", 5, 15.00),
    (202, "Kalie", "2022-01-02", 2, 5.00),
    (102, "Phil", "2022-01-02", 2, 2.00),
    (101, "Popeye", "2022-01-03", 10, 5.00),
    (101, "Brutus", "2022-01-04", 1, 0.50),
    (101, "Lottie", "2022-01-04", 1, 0.50),
    (101, "Phil", "2022-01-05", 2, 2.00),
]


def grocery_nodes(spark: SparkSession) -> DataFrame:
    rows = [
        (f"n{k}", k, name, level, None if p is None else f"n{p}")
        for (k, name, level, p) in _GROCERY_NODES
    ]
    return spark.createDataFrame(
        rows,
        "node_id string, node_natural_key int, node_name string, "
        "level_name string, parent_node_id string",
    )


def grocery_facts(spark: SparkSession) -> DataFrame:
    rows = [
        (pid, cust, datetime.date.fromisoformat(d), float(q), float(amt))
        for (pid, cust, d, q, amt) in _GROCERY_FACTS
    ]
    return spark.createDataFrame(
        rows,
        "product_id int, customer_id string, date_id date, "
        "unit_quantity double, sales_amount double",
    )


def _pad_id(prefix: str, col) -> F.Column:
    return F.concat(F.lit(prefix), F.lpad(col.cast("string"), 9, "0"))


def _one_row(spark, *, node_id: str, node_name: str, level_name: str):
    """Single hierarchy-root row with PLAN-ESTIMABLE stats: projected off
    range(1) so Catalyst knows its exact size (8 bytes scaled), keeping
    the downstream union's sizeInBytes estimate meaningful. numPartitions
    is pinned to 1: the default splits range(1) across defaultParallelism
    partitions, so every job over the node union dragged ~31 EMPTY tasks
    (measured as a 35-task fetch for a 4-way union of single-partition
    scans at sf0.1)."""
    return spark.range(0, 1, numPartitions=1).select(
        F.lit(node_id).alias("node_id"),
        F.lit(None).cast("bigint").alias("node_natural_key"),
        F.lit(node_name).alias("node_name"),
        F.lit(level_name).alias("level_name"),
        F.lit(None).cast("string").alias("parent_node_id"),
    )


def geo_nodes(region: DataFrame, nation: DataFrame, customer: DataFrame) -> DataFrame:
    """Adjacency list: All Regions -> region -> nation -> customer.

    Leaf natural key = c_custkey (joins orders.o_custkey); interior
    natural keys are NULL so facts can never join an interior node.
    """
    spark = region.sparkSession
    # range(1).select(lits), NOT createDataFrame: a Python-list DataFrame
    # plans as LogicalRDD with UNKNOWN stats (defaultSizeInBytes ~
    # Long.Max), which poisons the whole union's size estimate and costs
    # every dim build the stats-gated single-job fetch in hierarchy.py
    root = _one_row(
        spark,
        node_id="root",
        node_name="All Regions",
        level_name="Total",
    )
    regions = region.select(
        _pad_id("r:", F.col("r_regionkey")).alias("node_id"),
        F.lit(None).cast("bigint").alias("node_natural_key"),
        F.col("r_name").alias("node_name"),
        F.lit("Region").alias("level_name"),
        F.lit("root").alias("parent_node_id"),
    )
    nations = nation.select(
        _pad_id("n:", F.col("n_nationkey")).alias("node_id"),
        F.lit(None).cast("bigint").alias("node_natural_key"),
        F.col("n_name").alias("node_name"),
        F.lit("Nation").alias("level_name"),
        _pad_id("r:", F.col("n_regionkey")).alias("parent_node_id"),
    )
    customers = customer.select(
        _pad_id("c:", F.col("c_custkey")).alias("node_id"),
        F.col("c_custkey").cast("bigint").alias("node_natural_key"),
        F.col("c_name").alias("node_name"),
        F.lit("Customer").alias("level_name"),
        _pad_id("n:", F.col("c_nationkey")).alias("parent_node_id"),
    )
    return root.unionByName(regions).unionByName(nations).unionByName(customers)


def part_nodes(part: DataFrame) -> DataFrame:
    """Adjacency list: All Parts -> p_brand -> p_type (within brand) -> part.

    Leaf natural key = p_partkey (joins lineitem.l_partkey).
    """
    spark = part.sparkSession
    # see geo_nodes: estimable root row keeps the build's fetch fast path
    root = _one_row(
        spark,
        node_id="root",
        node_name="All Parts",
        level_name="Total",
    )
    brands = part.select(F.col("p_brand")).distinct().select(
        F.concat(F.lit("b:"), F.col("p_brand")).alias("node_id"),
        F.lit(None).cast("bigint").alias("node_natural_key"),
        F.col("p_brand").alias("node_name"),
        F.lit("Brand").alias("level_name"),
        F.lit("root").alias("parent_node_id"),
    )
    types = part.select("p_brand", "p_type").distinct().select(
        F.concat(F.lit("t:"), F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("node_id"),
        F.lit(None).cast("bigint").alias("node_natural_key"),
        F.col("p_type").alias("node_name"),
        F.lit("Type").alias("level_name"),
        F.concat(F.lit("b:"), F.col("p_brand")).alias("parent_node_id"),
    )
    parts = part.select(
        _pad_id("p:", F.col("p_partkey")).alias("node_id"),
        F.col("p_partkey").cast("bigint").alias("node_natural_key"),
        F.col("p_name").alias("node_name"),
        F.lit("Part").alias("level_name"),
        F.concat(F.lit("t:"), F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("parent_node_id"),
    )
    return root.unionByName(brands).unionByName(types).unionByName(parts)


# ANSI-SQL twins of the builders above, for DuckDB oracles (the driver
# pre-registers region/nation/customer/part views on the same parquet).
GEO_NODES_SQL = """
SELECT 'root' AS node_id, CAST(NULL AS BIGINT) AS node_natural_key,
       'All Regions' AS node_name, 'Total' AS level_name,
       CAST(NULL AS VARCHAR) AS parent_node_id
UNION ALL
SELECT 'r:' || lpad(CAST(r_regionkey AS VARCHAR), 9, '0'), NULL, r_name,
       'Region', 'root'
FROM region
UNION ALL
SELECT 'n:' || lpad(CAST(n_nationkey AS VARCHAR), 9, '0'), NULL, n_name,
       'Nation', 'r:' || lpad(CAST(n_regionkey AS VARCHAR), 9, '0')
FROM nation
UNION ALL
SELECT 'c:' || lpad(CAST(c_custkey AS VARCHAR), 9, '0'),
       CAST(c_custkey AS BIGINT), c_name,
       'Customer', 'n:' || lpad(CAST(c_nationkey AS VARCHAR), 9, '0')
FROM customer
"""

PART_NODES_SQL = """
SELECT 'root' AS node_id, CAST(NULL AS BIGINT) AS node_natural_key,
       'All Parts' AS node_name, 'Total' AS level_name,
       CAST(NULL AS VARCHAR) AS parent_node_id
UNION ALL
SELECT 'b:' || p_brand, NULL, p_brand, 'Brand', 'root'
FROM (SELECT DISTINCT p_brand FROM part)
UNION ALL
SELECT 't:' || p_brand || '/' || p_type, NULL, p_type, 'Type', 'b:' || p_brand
FROM (SELECT DISTINCT p_brand, p_type FROM part)
UNION ALL
SELECT 'p:' || lpad(CAST(p_partkey AS VARCHAR), 9, '0'),
       CAST(p_partkey AS BIGINT), p_name,
       'Part', 't:' || p_brand || '/' || p_type
FROM part
"""
