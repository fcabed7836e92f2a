"""TPC-H gap queries (q2, q11, q12, q16, q19, q20, q21) — completing
the 22-query suite together with the shapes in ``relational.py``.

The testdata has no ``partsupp`` table and lacks several TPC-H columns
(l_shipmode, l_receiptdate/commitdate, p_container, s_comment), so —
like q8/q22 before them — these preserve each query's STRUCTURAL shape
(the plan patterns that matter: min-subquery equi-select, scalar-
threshold HAVING, disjunctive predicate pushdown, NOT-IN + COUNT
DISTINCT, nested decorrelated EXISTS, double-EXISTS anti semantics)
over the columns that exist:

- ``partsupp`` is derived: one row per (l_partkey, l_suppkey) observed
  in lineitem, with supplycost = min unit price and availqty = total
  shipped quantity. Derivation is a map-side-combined groupBy, shared
  text between the Spark and DuckDB sides.
- "late" (q21) = shipped more than 45 days after the order date.

Determinism: every money sum is decimal-exact pre-aggregate; unit
price (a double division) is identical IEEE arithmetic on both engines,
so MIN() over it and equality joins against that MIN are engine-stable.

Scale notes: all joins are key-equi; the derived partsupp is one extra
shuffle of lineitem that a real deployment would materialize once. No
theta joins anywhere; q19's OR-of-brackets is a single scan with the
disjunction evaluated post-join on part columns. Join sides split into
two classes: nation/region are CONSTANT-size (25/5 rows — unconditional
broadcast is a proven bound) while supplier (SFx10k) and part (SFx200k)
are SF-LINEAR — at sf10 part is ~2M rows, past the practical broadcast
ceiling, and a broadcast hint is never dropped by Spark on size. Every
SF-linear side therefore routes through ``queries.dim_side`` (bounded
row-count probe -> broadcast under DIM_BROADCAST_ROW_CAP, sort-merge
hint above); both regimes are plan- and output-pinned
(tests/test_plans.py::test_tpch_q2_dim_join_regime_switch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import dim_side, register
from ibis_olap_aggregation_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, names)


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


_DUCK_PS = """
ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ps_availqty
  FROM lineitem
  GROUP BY 1, 2
)
"""


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp (see module docstring)."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum(_dec("l_quantity")).cast("double").alias("ps_availqty"),
    )


@register(
    "tpch_q2_min_cost_supplier",
    f"""
WITH {_DUCK_PS},
costs AS (
  SELECT ps.ps_partkey, ps.ps_supplycost, s.s_name, s.s_acctbal, n.n_name
  FROM ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
),
mn AS (SELECT ps_partkey, MIN(ps_supplycost) AS min_cost FROM costs GROUP BY 1)
SELECT c.s_acctbal, c.s_name, c.n_name, p.p_partkey, p.p_name
FROM costs c
JOIN mn ON mn.ps_partkey = c.ps_partkey AND c.ps_supplycost = mn.min_cost
JOIN part p ON p.p_partkey = c.ps_partkey
WHERE p.p_size = 15
ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, p.p_partkey
LIMIT 100
""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated MIN
    subquery (cheapest supplier per part within a region), decorrelated
    into a per-part MIN aggregate equi-joined back on (partkey, cost).
    Region filter prunes before the min; part filter prunes the probe.
    ref README parity n/a — extension of the SQL surface."""
    t = _t(spark, sf_dir, "supplier", "nation", "region", "part")
    costs = (
        _ps(spark, sf_dir)
        .join(
            dim_side(t["supplier"]),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("ps_partkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    )
    # r14: the decorrelated MIN used to be a groupBy + equi-join back
    # onto costs — Catalyst does not dedupe the two references, so the
    # whole costs subtree (the lineitem-derived partsupp aggregate plus
    # three dim joins) executed TWICE. A MIN window over ps_partkey
    # computes the same per-part minimum on ONE pass of costs with ONE
    # exchange, and `ps_supplycost = min` keeps exactly the rows the
    # join kept (ties included; supplycost is never NULL — it is a MIN
    # aggregate over non-null prices).
    w_mn = Window.partitionBy("ps_partkey")
    p = t["part"].filter(F.col("p_size") == 15)
    return (
        costs.withColumn("min_cost", F.min("ps_supplycost").over(w_mn))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(dim_side(p), F.col("ps_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q11_important_stock",
    f"""
WITH {_DUCK_PS},
v AS (
  SELECT ps.ps_partkey,
         CAST(SUM(CAST(ROUND(ps.ps_supplycost * ps.ps_availqty, 2)
                       AS DECIMAL(28,2))) AS DOUBLE) AS part_value
  FROM ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY 1
)
SELECT ps_partkey, part_value
FROM v
WHERE part_value > (SELECT CAST(SUM(CAST(part_value AS DECIMAL(28,2)))
                                AS DOUBLE) * 0.001 FROM v)
ORDER BY part_value DESC, ps_partkey
LIMIT 100
""",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part value
    within one nation, kept only where it exceeds a fraction of the
    GLOBAL value — an uncorrelated scalar subquery broadcast against the
    grouped aggregate (HAVING > scalar). Products are rounded to cents
    BEFORE the exact-decimal sum so partial-agg order cannot shift the
    threshold comparison."""
    t = _t(spark, sf_dir, "supplier", "nation")
    v = (
        _ps(spark, sf_dir)
        .join(dim_side(t["supplier"]), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.round(F.col("ps_supplycost") * F.col("ps_availqty"), 2).cast(
                    "decimal(28,2)"
                )
            )
            .cast("double")
            .alias("part_value")
        )
    )
    thresh = v.agg(
        # direct 28,2 cast — routing through the 18,2 _dec helper would
        # overflow part_value to NULL beyond ~10^16 while the oracle's
        # direct DECIMAL(28,2) cast keeps it, diverging the threshold
        (F.sum(F.col("part_value").cast("decimal(28,2)")).cast("double") * F.lit(0.001)).alias(
            "_th"
        )
    )
    return (
        v.join(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("_th"))
        .select("ps_partkey", "part_value")
        .orderBy(F.desc("part_value"), "ps_partkey")
        .limit(100)
    )


@register(
    "tpch_q12_shipmode_priority",
    """
SELECT l.l_returnflag AS ship_category,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY 1
""",
)
def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping priority by mode; category stands in
    for the absent l_shipmode): date-window scan filter pushed to
    parquet, join to orders, conditional CASE-sum pivot of priority
    classes per category."""
    t = _t(spark, sf_dir, "orders", "lineitem")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("ship_category"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q16_supplier_part_count",
    f"""
WITH {_DUCK_PS}
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND ps.ps_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def tpch_q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): NOT-IN subquery
    (negative-balance suppliers stand in for the complaints LIKE-filter)
    executed as a broadcast anti-join, then COUNT(DISTINCT supplier) per
    (brand, type, size) — Catalyst expands to a two-phase distinct agg."""
    t = _t(spark, sf_dir, "part", "supplier")
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        _ps(spark, sf_dir)
        .join(dim_side(bad), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(dim_side(p), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q19_disjunctive_revenue",
    """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    three OR-ed brackets mixing part and lineitem columns. Catalyst
    extracts the common join key and pushes the per-side residuals
    (brand/size union → part scan, quantity union → lineitem scan) while
    the full disjunction evaluates post-join."""
    t = _t(spark, sf_dir, "lineitem", "part")
    j = t["lineitem"].join(
        dim_side(t["part"]), F.col("p_partkey") == F.col("l_partkey")
    )
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(bracket).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("double")
        .alias("revenue")
    )


@register(
    "tpch_q20_potential_promotion",
    f"""
WITH {_DUCK_PS},
shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_1998
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
  GROUP BY 1, 2
)
SELECT DISTINCT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN ps ON ps.ps_suppkey = s.s_suppkey
JOIN shipped sh ON sh.l_partkey = ps.ps_partkey AND sh.l_suppkey = ps.ps_suppkey
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_name LIKE 'red%'
  AND ps.ps_availqty > 2.0 * sh.qty_1998
ORDER BY s_name, n_name
""",
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): the nested IN chain
    (suppliers ⊃ parts ⊃ half-year-volume subquery) decorrelated into
    joins — derived partsupp × per-(part,supplier) 1998 shipments, the
    availability-exceeds-threshold filter, a LIKE-prefixed part probe,
    and a DISTINCT projection of qualifying suppliers."""
    t = _t(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("qty_1998"))
    )
    red = t["part"].filter(F.col("p_name").startswith("red")).select("p_partkey")
    qual = (
        _ps(spark, sf_dir)
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(dim_side(red), F.col("ps_partkey") == F.col("p_partkey"))
        .filter(F.col("ps_availqty") > F.lit(2.0) * F.col("qty_1998"))
    )
    return (
        qual.join(
            dim_side(_t(spark, sf_dir, "supplier")["supplier"]),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name", "n_name")
    )


@register(
    "tpch_q21_waiting_orders",
    """
WITH flagged AS (
  SELECT l.l_orderkey, l.l_suppkey,
         (l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY) AS late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
  FROM flagged
  GROUP BY 1
)
SELECT s.s_name, COUNT(*) AS numwait
FROM flagged f
JOIN per_order po ON po.l_orderkey = f.l_orderkey
JOIN supplier s ON s.s_suppkey = f.l_suppkey
WHERE f.late AND po.n_supp > 1 AND po.n_late_supp = 1
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def tpch_q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting; "late" =
    shipped >45 days after order date, standing in for the absent
    receipt/commit dates): the EXISTS (another supplier in the order) +
    NOT EXISTS (another LATE supplier) pair decorrelated into ONE
    per-order aggregate — n_supp > 1 ∧ n_late_supp = 1 is exactly the
    double-EXISTS condition for a late line. One extra groupBy replaces
    two correlated subquery scans of lineitem."""
    t = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    flagged = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
            ).alias("late"),
        )
    )
    # r14: the per-order aggregate used to be a groupBy + join back onto
    # flagged — the lineitem ⋈ orders join (the query's dominant cost)
    # executed TWICE, once under each reference. collect_set windows
    # over l_orderkey compute the same distinct counts on ONE pass with
    # ONE exchange: size(collect_set(x)) ≡ COUNT(DISTINCT x) per
    # partition (collect_set drops NULLs exactly as COUNT DISTINCT
    # ignores them, so the CASE WHEN late form carries over verbatim).
    w_ord = Window.partitionBy("l_orderkey")
    return (
        flagged.withColumn(
            "n_supp", F.size(F.collect_set("l_suppkey").over(w_ord))
        )
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("late"), F.col("l_suppkey"))
                ).over(w_ord)
            ),
        )
        .filter(
            F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .join(
            dim_side(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
