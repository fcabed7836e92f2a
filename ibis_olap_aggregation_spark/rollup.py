"""Hierarchical rollup: facts x closure join + one flat GROUP BY.

The flagship pattern of the reference (reference main.py:35-55): join
the fact table to the aggregation dim (transitive closure) on the
DESCENDANT's natural key, then group by ANCESTOR — every node of the
hierarchy gets correctly rolled-up measures, including non-additive
COUNT(DISTINCT), with zero recursion at query time.

Spark plan shape: Parquet scan (filters/columns pushed down) ->
broadcast hash join (closure is dim-sized) -> partial hash agg ->
shuffle on group keys -> final hash agg -> optional sort. The closure
is broadcast by default; for hierarchies too large to broadcast, pass
``broadcast_dim=False`` and Catalyst/AQE picks a shuffled join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hierarchical_rollup"]

DEFAULT_GROUP_KEYS = (
    "ancestor_node_name",
    "ancestor_level_name",
    "ancestor_level_number",
    "ancestor_node_sort_order",
)


def hierarchical_rollup(
    facts: DataFrame,
    aggregation_dim: DataFrame,
    fact_key_col: str,
    measures: Sequence[Column],
    *,
    descendant_key_col: str = "descendant_node_natural_key",
    group_keys: Sequence[str] = DEFAULT_GROUP_KEYS,
    broadcast_dim: bool = True,
    sort: bool = True,
) -> DataFrame:
    """Roll facts up to every hierarchy node via the closure join.

    measures: already-aliased aggregate Columns, e.g.
    ``[F.sum("sales_amount").alias("sum_sales_amount"),
       F.countDistinct("customer_id").alias("distinct_customer_count")]``.
    """
    dim = aggregation_dim
    keys = [k for k in group_keys if k in dim.columns]
    dim_slim = dim.select(descendant_key_col, *keys)  # prune before broadcast
    if broadcast_dim:
        dim_slim = F.broadcast(dim_slim)
    joined = facts.join(
        dim_slim, facts[fact_key_col] == dim_slim[descendant_key_col], "inner"
    )
    out = joined.groupBy(*keys).agg(*measures)
    if sort and "ancestor_node_sort_order" in keys:
        out = out.orderBy("ancestor_node_sort_order")
    return out
