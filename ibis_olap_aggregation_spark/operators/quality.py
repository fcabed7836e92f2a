"""Data-quality checks: the Spark mapping of the reference's declarative
constraints (SURVEY.md §2.9).

The reference's DuckDB DDL enforces PRIMARY KEY / UNIQUE / self-FK /
NOT NULL at insert time (reference sql/create_grocery_store_database.sql:9-12).
Spark tables don't enforce constraints, so the engine expresses them as
CHECK QUERIES — each returns the VIOLATIONS (empty result = constraint
holds), so the same queries serve as CI gates, pipeline circuit breakers,
or audit reports. All are plain aggregations/joins: one shuffle each,
fully scalable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import register
from ibis_olap_aggregation_spark.session import load_table

__all__ = ["check_unique", "check_not_null", "check_foreign_key"]


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """PRIMARY KEY / UNIQUE as a query: key values appearing more than
    once (empty = unique)."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def check_not_null(df: DataFrame, cols: list[str]) -> DataFrame:
    """NOT NULL as a query: per-column null counts (all zero = holds)."""
    return df.agg(
        *[F.sum(F.col(c).isNull().cast("bigint")).alias(f"nulls_{c}") for c in cols]
    )


def check_foreign_key(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """FOREIGN KEY as a query: child keys with no parent (left-anti join
    — same shape as the hierarchy's is_leaf derivation)."""
    p = parent.select(F.col(parent_col).alias(child_col)).distinct()
    return (
        child.filter(F.col(child_col).isNotNull())
        .join(F.broadcast(p), child_col, "left_anti")
        .select(child_col)
        .distinct()
    )


@register(
    "quality_pk_unique_orders",
    """
SELECT o_orderkey, COUNT(*) AS n_rows
FROM orders GROUP BY 1 HAVING COUNT(*) > 1
""",
)
def quality_pk_unique_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK check on orders.o_orderkey — expected empty (constraint holds)."""
    return check_unique(load_table(spark, sf_dir, "orders"), ["o_orderkey"])


@register(
    "quality_not_null_lineitem",
    """
SELECT CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS nulls_l_orderkey,
       CAST(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS nulls_l_partkey,
       CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS nulls_l_quantity
FROM lineitem
""",
)
def quality_not_null_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT NULL audit over lineitem's key/measure columns."""
    return check_not_null(
        load_table(spark, sf_dir, "lineitem"),
        ["l_orderkey", "l_partkey", "l_quantity"],
    )


@register(
    "quality_fk_orders_customer",
    """
SELECT DISTINCT o.o_custkey
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND o.o_custkey NOT IN (SELECT c_custkey FROM customer)
""",
)
def quality_fk_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK check orders.o_custkey -> customer.c_custkey (the reference's
    self-FK, ref sql:11-12, generalized) — expected empty."""
    return check_foreign_key(
        load_table(spark, sf_dir, "orders"),
        "o_custkey",
        load_table(spark, sf_dir, "customer"),
        "c_custkey",
    )
