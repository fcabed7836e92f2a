"""Hierarchical rollup: facts x closure join + one flat GROUP BY.

The flagship pattern of the reference (reference main.py:35-55): join
the fact table to the aggregation dim (transitive closure) on the
DESCENDANT's natural key, then group by ANCESTOR — every node of the
hierarchy gets correctly rolled-up measures, including non-additive
COUNT(DISTINCT), with zero recursion at query time.

Spark plan shape: Parquet scan (filters/columns pushed down) ->
broadcast hash join (closure is dim-sized) -> partial hash agg ->
shuffle on ``ancestor_node_id`` ONLY -> final hash agg -> broadcast
join of the node-attribute columns onto the per-node result ->
optional sort. Aggregating on the compact id and attaching the wide
string attributes (node_name, level_name, ...) AFTER the aggregate
matters at scale twice over: the broadcast side of the fact join
carries two columns instead of six, and the shuffle rows carry an
id instead of repeating every display string (measured 8.1s -> ~3s
for the sf0.1 part rollup's sums on local[32]). The closure is
broadcast by default; for hierarchies too large to broadcast, pass
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

_ID = "ancestor_node_id"


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

    Output columns: ``group_keys`` (those present in the dim) in the
    given order, then the measures.
    """
    dim = aggregation_dim
    keys = [k for k in group_keys if k in dim.columns]
    if _ID not in dim.columns or _ID in keys:
        # no compact id to pivot on (custom closure) — single wide groupBy
        dim_slim = dim.select(descendant_key_col, *keys)
        if broadcast_dim:
            dim_slim = F.broadcast(dim_slim)
        joined = facts.join(
            dim_slim, facts[fact_key_col] == dim_slim[descendant_key_col], "inner"
        )
        out = joined.groupBy(*keys).agg(*measures)
    else:
        # aggregate on the id, decorate after: the expanded fact only
        # ever carries (fact columns + ancestor_node_id)
        dim_slim = dim.select(descendant_key_col, _ID)
        if broadcast_dim:
            dim_slim = F.broadcast(dim_slim)
        joined = facts.join(
            dim_slim, facts[fact_key_col] == dim_slim[descendant_key_col], "inner"
        )
        per_node = joined.groupBy(_ID).agg(*measures)
        # one attribute row per node: the closure's self-pairs are unique
        # per ancestor; fall back to distinct when net_level is absent
        if "net_level" in dim.columns:
            attrs = dim.filter(F.col("net_level") == 0).select(_ID, *keys)
        else:
            attrs = dim.select(_ID, *keys).distinct()
        out = per_node.join(F.broadcast(attrs), _ID).select(
            *keys, *[c for c in per_node.columns if c != _ID]
        )
    if sort and "ancestor_node_sort_order" in keys:
        # the result is dim-sized (one row per hierarchy node), so a
        # single-partition sort is right at any fact scale — and unlike
        # a global orderBy it needs no range-sampling pass, which would
        # execute the whole aggregation subplan a second time (measured
        # 14.3s -> 9.8s on the sf0.1 part rollup). repartition(1), not
        # coalesce(1): the shuffle boundary keeps the aggregation
        # parallel upstream.
        out = out.repartition(1).sortWithinPartitions("ancestor_node_sort_order")
    return out
