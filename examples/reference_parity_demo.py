"""Reference parity demo: reproduce `prmoore77/ibis-olap-aggregation`'s
flagship run (reference main.py) end-to-end on this engine.

Builds the grocery hierarchy (7 nodes), the closure, and runs the
flagship rollup — printing the same 7-row table as the reference
(SURVEY.md Appendix A golden output): indented node/level names, two
sums, a non-additive COUNT(DISTINCT), and a fact count, in depth-first
hierarchy order.

Run:  PYTHONPATH=. python examples/reference_parity_demo.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from ibis_olap_aggregation_spark import get_spark
from ibis_olap_aggregation_spark.fixtures import grocery_facts, grocery_nodes
from ibis_olap_aggregation_spark.functions.scalar import indented
from ibis_olap_aggregation_spark.hierarchy import HierarchyDimension
from ibis_olap_aggregation_spark.rollup import hierarchical_rollup


def main() -> None:
    spark = get_spark("reference_parity_demo")

    # reference main.py:21-25 — build the dimension (reporting + closure)
    dim = HierarchyDimension(grocery_nodes(spark), dimension_name="product")

    # reference main.py:28-34 — indent names by (level-1)*7 dashes
    agg = dim.aggregation_dim.withColumns(
        {
            "product_node_name": indented("ancestor_node_name", "ancestor_level_number"),
            "product_level_name": indented("ancestor_level_name", "ancestor_level_number"),
        }
    )

    # reference main.py:35-55 — join facts to closure, group by ancestor
    result = hierarchical_rollup(
        grocery_facts(spark),
        agg,
        "product_id",
        [
            F.sum(F.col("sales_amount").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_sales_amount"),
            F.sum(F.col("unit_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_unit_quantity"),
            F.countDistinct("customer_id").alias("distinct_customer_count"),
            F.count(F.lit(1)).alias("count_of_fact_records"),
        ],
        group_keys=(
            "product_node_name",
            "product_level_name",
            "ancestor_node_sort_order",
        ),
    )

    # reference main.py:66-67 — execute and print
    out = result.select(
        "product_node_name",
        "product_level_name",
        "sum_sales_amount",
        "sum_unit_quantity",
        "distinct_customer_count",
        "count_of_fact_records",
    )
    out.show(truncate=False)

    rows = out.collect()
    root = rows[0]
    assert root.sum_sales_amount == 33.0, root
    assert root.sum_unit_quantity == 24.0, root
    assert root.distinct_customer_count == 5, root  # 4 + 3 != 5: non-additive
    assert root.count_of_fact_records == 8, root
    print("golden totals verified (SURVEY.md Appendix A)")


if __name__ == "__main__":
    main()
