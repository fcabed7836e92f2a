"""Weighted-allocation rollup: consolidation with edge weights.

Classic OLAP engines (Essbase unary operators, Analysis Services
custom rollups) generalize the plain hierarchy rollup: each
child -> parent edge carries an ALLOCATION WEIGHT, and a fact
contributes to an ancestor scaled by the PRODUCT of edge weights along
the path (shared ownership, cost allocation, partial consolidation).
The reference engine's closure rollup (main.py:35-55) is the weight=1
special case; this module is the §7.4-style extension of it.

Design (Spark-first):
- the weighted closure is built like the plain one — iterative
  child->ancestor expansion — but each expansion step MULTIPLIES the
  path weight. Fixed-depth loop, no driver actions, each level one
  dim-sized equi-join (broadcast at fact scale).
- all weight math is exact DECIMAL: edge weights are 1-dp decimals,
  path products capped at scale 6, measure x weight at scale 8 — both
  engines compute bit-identical doubles at the end.
- the fact join + groupBy is the same leaf-grain shape as
  hierarchical_rollup: one shuffle on the ancestor key, the closure
  broadcast.

Scale notes (100 TB): closure size = nodes x avg_depth (dim-sized,
broadcastable); the fact stream is touched once; allocation adds one
decimal multiply per (fact, ancestor) pair — map-side, inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import _GEO_PRELUDE, register
from ibis_olap_aggregation_spark.session import dim_side, load_table

__all__ = ["weighted_closure"]


def weighted_closure(edges: DataFrame, max_depth: int) -> DataFrame:
    """Transitive closure with multiplicative path weights.

    ``edges``: (child, parent, w) with w an exact decimal. Returns
    (descendant, ancestor, pw) including the self path (pw = 1) for
    every node appearing in ``edges``. Fixed ``max_depth`` iterations —
    no per-level emptiness probe, so building the plan triggers no job;
    levels beyond the real depth contribute empty frontiers.

    Each iteration extends the frontier by one edge hop and multiplies
    the accumulated weight, kept at DECIMAL(18,6): exact for products
    of up to six 1-dp weights (deeper hierarchies should widen the
    scale with their depth).
    """
    nodes = (
        edges.select(F.col("child").alias("n"))
        .union(edges.select(F.col("parent").alias("n")))
        .distinct()
    )
    self_paths = nodes.select(
        F.col("n").alias("descendant"),
        F.col("n").alias("ancestor"),
        F.lit(1).cast("decimal(18,6)").alias("pw"),
    )
    step = edges.select(
        F.col("child").alias("descendant"),
        F.col("parent").alias("ancestor"),
        F.col("w").cast("decimal(18,6)").alias("pw"),
    )
    paths = self_paths.union(step)
    frontier = step
    for _ in range(max_depth - 1):
        nxt = (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.ancestor") == F.col("e.child"))
            .select(
                F.col("f.descendant").alias("descendant"),
                F.col("e.parent").alias("ancestor"),
                (F.col("f.pw") * F.col("e.w"))
                .cast("decimal(18,6)")
                .alias("pw"),
            )
        )
        paths = paths.union(nxt)
        frontier = nxt
    return paths


# Deterministic 1-dp edge weights derived from the keys so both engines
# construct the identical weighted hierarchy from the raw tables:
# customer->nation in {0.8, 0.9, 1.0}, nation->region in {0.7 .. 1.0}.
_CUST_OFFSET = 1_000_000
_NATION_OFFSET = 100


@register(
    "hierarchy_weighted_rollup",
    f"""
WITH RECURSIVE edges AS (
  SELECT {_CUST_OFFSET} + c_custkey AS child,
         {_NATION_OFFSET} + c_nationkey AS parent,
         (c_custkey % 3 + 8)::DECIMAL(3,1) * 0.1::DECIMAL(2,1) AS w
  FROM customer
  UNION ALL
  SELECT {_NATION_OFFSET} + n_nationkey, n_regionkey,
         (n_nationkey % 4 + 7)::DECIMAL(3,1) * 0.1::DECIMAL(2,1)
  FROM nation
),
allnodes AS (SELECT child AS n FROM edges UNION SELECT parent FROM edges),
paths AS (
  SELECT n AS descendant, n AS ancestor, CAST(1 AS DECIMAL(18,6)) AS pw
  FROM allnodes
  UNION ALL
  SELECT p.descendant, e.parent, CAST(p.pw * e.w AS DECIMAL(18,6))
  FROM paths p JOIN edges e ON p.ancestor = e.child
),
facts AS (
  SELECT {_CUST_OFFSET} + o_custkey AS leaf,
         CAST(o_totalprice AS DECIMAL(18,2)) AS m
  FROM orders
)
SELECT p.ancestor AS node_id,
       COUNT(*) AS n_contribs,
       CAST(SUM(CAST(f.m * p.pw AS DECIMAL(38,8))) AS DOUBLE) AS weighted_total,
       CAST(SUM(f.m) AS DOUBLE) AS raw_total
FROM facts f
JOIN paths p ON p.descendant = f.leaf
GROUP BY 1
""",
)
def hierarchy_weighted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocation rollup over the geo hierarchy: every order's total
    contributes to its customer (weight 1), nation (one edge weight)
    and region (product of two edge weights). Reports per node the
    weighted consolidation next to the raw (weight-free) total — the
    raw column shows exactly how much the allocation weights shaved.

    The weighted closure is dim-sized and broadcast into the fact
    join; one shuffle (the ancestor groupBy) regardless of depth."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    tenth = F.lit(0.1).cast("decimal(2,1)")
    edges = cust.select(
        (F.lit(_CUST_OFFSET) + F.col("c_custkey")).alias("child"),
        (F.lit(_NATION_OFFSET) + F.col("c_nationkey")).alias("parent"),
        ((F.col("c_custkey") % 3 + 8).cast("decimal(3,1)") * tenth).alias("w"),
    ).union(
        nat.select(
            (F.lit(_NATION_OFFSET) + F.col("n_nationkey")).alias("child"),
            F.col("n_regionkey").alias("parent"),
            ((F.col("n_nationkey") % 4 + 7).cast("decimal(3,1)") * tenth).alias(
                "w"
            ),
        )
    )
    paths = weighted_closure(edges, max_depth=2)
    facts = load_table(spark, sf_dir, "orders").select(
        (F.lit(_CUST_OFFSET) + F.col("o_custkey")).alias("leaf"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("m"),
    )
    return (
        facts.join(
            # derived (iterative closure): cache on memo-miss so the
            # bounded probe populates what the join reads (ADVICE r11 #4)
            dim_side(paths, cache_if_probing=True),
            facts["leaf"] == paths["descendant"],
        )
        .groupBy(F.col("ancestor").alias("node_id"))
        .agg(
            F.count(F.lit(1)).alias("n_contribs"),
            F.sum((F.col("m") * F.col("pw")).cast("decimal(38,8)"))
            .cast("double")
            .alias("weighted_total"),
            F.sum("m").cast("double").alias("raw_total"),
        )
    )


@register(
    "hierarchy_topdown_allocation",
    _GEO_PRELUDE
    + """
, rev AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
  FROM orders GROUP BY 1
),
cust_region AS (
  SELECT sd.node_natural_key AS custkey, sa.node_name AS region_name
  FROM closure c
  JOIN so sa ON sa.node_id = c.ancestor_node_id AND sa.level_name = 'Region'
  JOIN so sd ON sd.node_id = c.descendant_node_id AND sd.level_name = 'Customer'
),
j AS (
  SELECT r.o_custkey, cr.region_name, r.rev_dec FROM rev r
  JOIN cust_region cr ON cr.custkey = r.o_custkey
),
reg AS (
  SELECT region_name, SUM(rev_dec) AS reg_dec FROM j GROUP BY 1
)
SELECT j.o_custkey AS custkey, j.region_name,
       CAST(j.rev_dec AS DOUBLE) AS revenue,
       CAST(reg.reg_dec AS DOUBLE) AS region_revenue,
       ROUND(CAST(j.rev_dec AS DOUBLE) / CAST(reg.reg_dec AS DOUBLE), 6)
         AS revenue_share,
       ROUND(100000.0 * CAST(j.rev_dec AS DOUBLE) / CAST(reg.reg_dec AS DOUBLE), 6)
         AS allocated_budget
FROM j JOIN reg ON reg.region_name = j.region_name
""",
)
def hierarchy_topdown_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-DOWN allocation — the inverse of the rollup: a fixed budget
    (100k per region) is spread DOWN the geography hierarchy to each
    customer in proportion to their revenue share of the region. The
    classic planning/consolidation operator ("allocate corporate
    overhead to products by revenue"), and the complement of
    hierarchy_weighted_rollup's bottom-up weighted consolidation.

    Determinism: per-customer revenue and the region denominators are
    decimal-exact sums (cast to double only at the ratio), so the
    shares and allocations are bit-identical across engines before the
    6-digit round.

    Scale: ONE fact shuffle (orders groupBy custkey); the customer ->
    region closure slice and the per-region totals are dim-sized
    broadcasts; allocation itself is a map-side ratio."""
    from ibis_olap_aggregation_spark.queries import _geo_dim

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec")
    )
    agg = _geo_dim(spark, sf_dir).aggregation_dim
    cust_region = agg.filter(
        (F.col("ancestor_level_name") == "Region")
        & (F.col("descendant_level_name") == "Customer")
    ).select(
        F.col("descendant_node_natural_key").alias("custkey"),
        F.col("ancestor_node_name").alias("region_name"),
    )
    j = rev.join(dim_side(cust_region), rev.o_custkey == F.col("custkey"))
    reg = j.groupBy("region_name").agg(F.sum("rev_dec").alias("reg_dec"))
    out = j.join(F.broadcast(reg), "region_name")
    rev_d = F.col("rev_dec").cast("double")
    reg_d = F.col("reg_dec").cast("double")
    return out.select(
        F.col("o_custkey").alias("custkey"),
        "region_name",
        rev_d.alias("revenue"),
        reg_d.alias("region_revenue"),
        F.round(rev_d / reg_d, 6).alias("revenue_share"),
        F.round(F.lit(100000.0) * rev_d / reg_d, 6).alias("allocated_budget"),
    )
