"""Relational operator library (SURVEY.md §2 + §7.2 batches).

Every operator family the reference exercises — plus the standard
families it lacks (outer joins, grouping sets, window frames, set ops)
— as named registry queries over the TPC-H-ish tables, each with a
DuckDB oracle. DataFrame API on the Spark side (Catalyst plans it);
ANSI SQL on the oracle side.

Determinism: see queries.py module docstring (decimal-exact sums,
explicit tie-breaks in every ordering, bigint casts for rank outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import dsum, register
from ibis_olap_aggregation_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, names)


# --------------------------------------------------------------------------
# Scans / projections / filters / predicates (§2.1, §2.2)
# --------------------------------------------------------------------------


@register(
    "scan_project_filter",
    """
SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
""",
)
def scan_project_filter(spark, sf_dir):
    """P1/P7: projection + conjunctive predicate; both pushed into the
    parquet scan by Catalyst (PushedFilters in .explain)."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(
        (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
    ).select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")


@register(
    "project_rename_derive",
    """
SELECT c_custkey AS custkey, upper(c_name) AS name_upper,
       c_acctbal AS acctbal, c_acctbal * 1.1 AS acctbal_bumped,
       length(c_mktsegment) AS seg_len
FROM customer
""",
)
def project_rename_derive(spark, sf_dir):
    """P2/P3: rename + derived columns (reference main.py:32-34)."""
    c = _t(spark, sf_dir, "customer")["customer"]
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.upper("c_name").alias("name_upper"),
        F.col("c_acctbal").alias("acctbal"),
        (F.col("c_acctbal") * 1.1).alias("acctbal_bumped"),
        F.length("c_mktsegment").cast("bigint").alias("seg_len"),
    )


@register(
    "case_when_null",
    """
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'F' THEN 'finished'
            WHEN o_orderstatus = 'O' THEN 'open'
            ELSE 'other' END AS status_label,
       (o_orderpriority IS NULL) AS prio_missing,
       CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_class
FROM orders
""",
)
def case_when_null(spark, sf_dir):
    """P4/P5: CASE WHEN + IS NULL (reference :89-93)."""
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_label"),
        F.col("o_orderpriority").isNull().alias("prio_missing"),
        F.when(F.col("o_totalprice") > 200000, "big").otherwise("small").alias("size_class"),
    )


# --------------------------------------------------------------------------
# Joins (§2.3) — inner/left/semi/anti/full-outer/cross
# --------------------------------------------------------------------------


@register(
    "join_inner",
    """
SELECT o.o_orderkey, c.c_name, o.o_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def join_inner(spark, sf_dir):
    """J1: inner equi-join, dim side broadcast (reference main.py:36)."""
    t = _t(spark, sf_dir, "orders", "customer")
    # no forced broadcast: customer scales with sf; AQE broadcasts it
    # while it fits (the guaranteed-small broadcast case is the closure
    # dim in rollup.py)
    return t["orders"].join(
        t["customer"],
        t["orders"]["o_custkey"] == t["customer"]["c_custkey"],
        "inner",
    ).select("o_orderkey", "c_name", "o_totalprice")


@register(
    "join_left_agg",
    """
SELECT c.c_custkey, count(o.o_orderkey) AS order_count
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
""",
)
def join_left_agg(spark, sf_dir):
    """Left outer join + count — customers with zero orders kept (count 0)."""
    t = _t(spark, sf_dir, "orders", "customer")
    j = t["customer"].join(
        t["orders"], t["customer"]["c_custkey"] == t["orders"]["o_custkey"], "left"
    )
    return j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("order_count"))


@register(
    "join_semi",
    """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_semi(spark, sf_dir):
    """J3/P6: semi-join (EXISTS) — reference uses IN(subquery) (:91-93)."""
    t = _t(spark, sf_dir, "orders", "customer")
    return t["customer"].join(
        t["orders"], t["customer"]["c_custkey"] == t["orders"]["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_anti(spark, sf_dir):
    """Anti-join (NOT EXISTS) — the is_leaf derivation's dual (:91-93)."""
    t = _t(spark, sf_dir, "orders", "customer")
    return t["customer"].join(
        t["orders"], t["customer"]["c_custkey"] == t["orders"]["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_full_outer",
    """
WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
     sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT coalesce(cn.nk, sn.nk) AS nationkey, cn.n_cust, sn.n_supp
FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
""",
)
def join_full_outer(spark, sf_dir):
    """Full outer join of per-nation customer vs supplier counts."""
    t = _t(spark, sf_dir, "customer", "supplier")
    cn = t["customer"].groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    sn = t["supplier"].groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    j = cn.join(sn, cn["nk"] == sn["nk"], "full_outer")
    return j.select(
        F.coalesce(cn["nk"], sn["nk"]).alias("nationkey"), "n_cust", "n_supp"
    )


@register(
    "join_cross",
    """
SELECT a.r_name AS left_region, b.r_name AS right_region
FROM region a CROSS JOIN region b
""",
)
def join_cross(spark, sf_dir):
    """Cartesian product (small dims only)."""
    r = _t(spark, sf_dir, "region")["region"]
    a = r.select(F.col("r_name").alias("left_region"))
    b = r.select(F.col("r_name").alias("right_region"))
    return a.crossJoin(b)


# --------------------------------------------------------------------------
# Aggregations (§2.4) — incl. the families the reference lacks
# --------------------------------------------------------------------------


@register(
    "agg_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape (A1/A2/A4): multi-key groupBy, derived-measure
    sums, avg; partial+final hash agg via Catalyst."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1) - dec("l_discount"))
                * (F.lit(1) + dec("l_tax"))
            )
            .cast("double")
            .alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_count_distinct",
    """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS distinct_customers,
       COUNT(*) AS n_orders,
       CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
FROM orders GROUP BY o_orderpriority
""",
)
def agg_count_distinct(spark, sf_dir):
    """A3: exact COUNT(DISTINCT) (two-phase expand in Catalyst) + min/max."""
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("distinct_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "agg_having",
    """
SELECT c_nationkey, COUNT(*) AS n_cust
FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 40
""",
)
def agg_having(spark, sf_dir):
    """HAVING = post-aggregation filter."""
    c = _t(spark, sf_dir, "customer")["customer"]
    return (
        c.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .filter(F.col("n_cust") > 40)
    )


@register(
    "agg_rollup",
    """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark, sf_dir):
    """ROLLUP over leveled columns — contrast with the closure join,
    which handles RAGGED hierarchies (SURVEY.md §2.4 A5)."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


@register(
    "agg_cube",
    """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_grouping_sets",
    """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def agg_grouping_sets(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
    )


@register(
    "agg_filtered",
    """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS discounted_revenue,
       COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS big_lines
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_filtered(spark, sf_dir):
    """Conditional aggregation (FILTER/CASE inside agg)."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.sum(
            F.when(
                F.col("l_discount") > 0.05, F.col("l_extendedprice").cast("decimal(18,2)")
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("discounted_revenue"),
        F.count(F.when(F.col("l_quantity") > 25, F.lit(1))).alias("big_lines"),
    )


# --------------------------------------------------------------------------
# Window functions (§2.5) — the reference only has global row_number (W1)
# --------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def window_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer: partitioned row_number + filter —
    the scalable form of W1 (partitioned, unlike the reference's
    global window; ref classes/hierarchy_dimension_table.py:133-139)."""
    o = _t(spark, sf_dir, "orders")["orders"]
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_rank_dense",
    """
SELECT p_partkey, p_brand, p_retailprice,
       CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS BIGINT) AS price_rank,
       CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS BIGINT) AS price_dense_rank
FROM part
""",
)
def window_rank_dense(spark, sf_dir):
    p = _t(spark, sf_dir, "part")["part"]
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return p.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.rank().over(w).cast("bigint").alias("price_rank"),
        F.dense_rank().over(w).cast("bigint").alias("price_dense_rank"),
    )


@register(
    "window_lag_lead",
    """
SELECT o_custkey, o_orderkey, o_totalprice,
       lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
       lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
FROM orders
""",
)
def window_lag_lead(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "window_running_sum",
    """
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
         PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
FROM lineitem
""",
)
def window_running_sum(spark, sf_dir):
    """Cumulative frame (ROWS UNBOUNDED PRECEDING..CURRENT); total order
    inside the partition makes the prefix sums engine-identical."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_qty"),
    )


@register(
    "window_ntile",
    """
SELECT c_custkey, c_acctbal,
       CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS balance_quartile
FROM customer
""",
)
def window_ntile(spark, sf_dir):
    """Global ntile WITHOUT the single-partition window the naive
    `ntile(k) OVER (ORDER BY ...)` compiles to: rank with the
    range-partitioned global ranker, then derive the bucket from the
    closed-form ntile split (the first n%k buckets take one extra row).
    Bit-identical to the window function; scales like the ranker."""
    from ibis_olap_aggregation_spark.operators.ranking import global_row_number

    k = 4
    c = _t(spark, sf_dir, "customer")["customer"].select("c_custkey", "c_acctbal")
    n = c.count()
    small, extra = divmod(n, k)
    boundary = extra * (small + 1)
    ranked = global_row_number(
        c, ["c_acctbal", "c_custkey"], "_rn", row_count=n
    )
    bucket = F.when(
        F.col("_rn") <= boundary,
        F.expr(f"(_rn - 1) div {small + 1} + 1"),
    ).otherwise(
        F.expr(f"{extra} + (_rn - {boundary} - 1) div {max(small, 1)} + 1")
    )
    return ranked.select(
        "c_custkey",
        "c_acctbal",
        bucket.cast("bigint").alias("balance_quartile"),
    )


@register(
    "window_dist_functions",
    """
SELECT c_custkey, c_nationkey,
       ROUND(cume_dist() OVER w, 6) AS cd,
       ROUND(percent_rank() OVER w, 6) AS pr,
       first_value(c_custkey) OVER w AS poorest_custkey,
       last_value(c_custkey) OVER (
         PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS richest_custkey
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
""",
)
def window_dist_functions(spark, sf_dir):
    """Distribution window functions (cume_dist / percent_rank) plus
    first_value / last_value with an explicit full-partition frame
    (last_value under the default frame is the CURRENT row — the classic
    trap). Partitioned per nation — never a global single-partition
    window."""
    c = _t(spark, sf_dir, "customer")["customer"]
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.first("c_custkey").over(w).alias("poorest_custkey"),
        F.last("c_custkey").over(w_full).alias("richest_custkey"),
    )


@register(
    "agg_stats_pack",
    """
SELECT o_orderstatus,
       ROUND(stddev_samp(o_totalprice), 6) AS sd_price,
       ROUND(var_samp(o_totalprice), 2) AS var_price,
       ROUND(covar_samp(o_totalprice, o_custkey), 2) AS cov_price_cust,
       ROUND(corr(o_totalprice, o_custkey), 6) AS corr_price_cust,
       ROUND(avg(o_totalprice), 6) AS avg_price
FROM orders
GROUP BY 1
""",
)
def agg_stats_pack(spark, sf_dir):
    """Statistical aggregates (stddev/variance/covariance/correlation):
    distributed via partial moment accumulation (map-side combined);
    results rounded to magnitude-aware precision: variance/covariance
    values are ~1e10 here and partial-aggregation order moves them at
    the ~1e-5 ABSOLUTE level (observed run-to-run in Spark itself), so
    they round to 2 decimals; stddev/corr/avg are small-magnitude and
    round to 6."""
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.round(F.stddev_samp("o_totalprice"), 6).alias("sd_price"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var_price"),
        F.round(F.covar_samp("o_totalprice", "o_custkey"), 2).alias(
            "cov_price_cust"
        ),
        F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("corr_price_cust"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
    )


# --------------------------------------------------------------------------
# Sorts / limits / top-k (§2.6) and set operations (§2.7)
# --------------------------------------------------------------------------


@register(
    "sort_limit_topk",
    """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""",
)
def sort_limit_topk(spark, sf_dir):
    """Global top-k: Catalyst plans TakeOrderedAndProject (per-partition
    heap + driver merge), NOT a full global sort."""
    o = _t(spark, sf_dir, "orders")["orders"]
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "setops_union_all",
    """
SELECT c_custkey AS key, 'big_balance' AS why FROM customer WHERE c_acctbal > 9000
UNION ALL
SELECT c_custkey AS key, 'machinery' AS why FROM customer WHERE c_mktsegment = 'MACHINERY'
""",
)
def setops_union_all(spark, sf_dir):
    """U1: UNION ALL (bag semantics; overlap kept twice)."""
    c = _t(spark, sf_dir, "customer")["customer"]
    a = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("key"), F.lit("big_balance").alias("why")
    )
    b = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("key"), F.lit("machinery").alias("why")
    )
    return a.unionByName(b)


@register(
    "setops_intersect",
    """
SELECT c_custkey AS key FROM customer WHERE c_acctbal > 9000
INTERSECT
SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'MACHINERY'
""",
)
def setops_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")["customer"]
    a = c.filter(F.col("c_acctbal") > 9000).select(F.col("c_custkey").alias("key"))
    b = c.filter(F.col("c_mktsegment") == "MACHINERY").select(F.col("c_custkey").alias("key"))
    return a.intersect(b)


@register(
    "setops_except",
    """
SELECT c_custkey AS key FROM customer WHERE c_acctbal > 9000
EXCEPT
SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'MACHINERY'
""",
)
def setops_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")["customer"]
    a = c.filter(F.col("c_acctbal") > 9000).select(F.col("c_custkey").alias("key"))
    b = c.filter(F.col("c_mktsegment") == "MACHINERY").select(F.col("c_custkey").alias("key"))
    return a.exceptAll(b).distinct()


@register(
    "distinct_dedup_exact",
    """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""",
)
def distinct_dedup_exact(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.select("l_returnflag", "l_linestatus").distinct()


# --------------------------------------------------------------------------
# Scalar function pack (§2.8: F1-F15 + standard date/math/conditional)
# --------------------------------------------------------------------------


@register(
    "scalar_string_pack",
    """
SELECT p_partkey,
       lpad('-', 7, '-') || p_name AS indented_name,
       upper(p_brand) AS brand_upper,
       lower(p_type) AS type_lower,
       replace(p_name, ' ', '_') AS name_snake,
       substr(p_name, 1, 5) AS name_prefix,
       CAST(length(p_name) AS BIGINT) AS name_len,
       trim('  ' || p_name || '  ') AS name_trimmed,
       CAST(strpos(p_name, 'a') AS BIGINT) AS first_a
FROM part
""",
)
def scalar_string_pack(spark, sf_dir):
    """F1-F4 string surface: lpad/concat/replace/cast + friends
    (reference main.py:28-30, hierarchy_dimension_table.py:135-137)."""
    p = _t(spark, sf_dir, "part")["part"]
    return p.select(
        "p_partkey",
        F.concat(F.lpad(F.lit("-"), 7, "-"), F.col("p_name")).alias("indented_name"),
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trimmed"),
        F.instr(F.col("p_name"), "a").cast("bigint").alias("first_a"),
    )


@register(
    "scalar_math_date_pack",
    """
SELECT o_orderkey,
       CAST(round(o_totalprice, 1) AS DOUBLE) AS price_rounded,
       CAST(floor(o_totalprice) AS DOUBLE) AS price_floor,
       CAST(ceil(o_totalprice) AS DOUBLE) AS price_ceil,
       abs(o_totalprice - 100000.0) AS dist_from_100k,
       o_orderkey % 7 AS key_mod,
       date_trunc('month', o_orderdate) AS order_month,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
       o_orderdate + INTERVAL 30 DAY AS due_date
FROM orders
""",
)
def scalar_math_date_pack(spark, sf_dir):
    """F5/F13 math + date surface (arithmetic, rounding, truncation,
    extraction, interval arithmetic)."""
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 1).alias("price_rounded"),
        F.floor("o_totalprice").cast("double").alias("price_floor"),
        F.ceil("o_totalprice").cast("double").alias("price_ceil"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist_from_100k"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("order_month"),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
    )


@register(
    "scalar_struct_array_pack",
    """
SELECT n_nationkey,
       struct_extract({'key': n_nationkey, 'name': n_name, 'region': n_regionkey}, 'name') AS s_name,
       list_extract([n_nationkey, n_regionkey, n_nationkey + n_regionkey], 2) AS second_elem,
       list_extract(list_append([n_nationkey, n_regionkey], 99), 3) AS appended,
       CAST(len([n_nationkey, n_regionkey, 99]) AS INTEGER) AS arr_size,
       list_extract(list_sort([n_regionkey, n_nationkey, 99]), 1) AS sorted_first
FROM nation
""",
)
def scalar_struct_array_pack(spark, sf_dir):
    """F6-F10 struct/array surface: struct literal + extract, array
    literal, append, 1-based element_at, size, sort — scalar outputs so
    the oracle hash stays transport-safe."""
    n = _t(spark, sf_dir, "nation")["nation"]
    arr = F.array(F.col("n_nationkey"), F.col("n_regionkey"))
    return n.select(
        "n_nationkey",
        F.struct(
            F.col("n_nationkey").alias("key"),
            F.col("n_name").alias("name"),
            F.col("n_regionkey").alias("region"),
        )
        .getField("name")
        .alias("s_name"),
        F.element_at(
            F.array(
                F.col("n_nationkey"),
                F.col("n_regionkey"),
                F.col("n_nationkey") + F.col("n_regionkey"),
            ),
            2,
        ).alias("second_elem"),
        F.element_at(F.array_append(arr, F.lit(99)), 3).alias("appended"),
        F.size(F.array(F.col("n_nationkey"), F.col("n_regionkey"), F.lit(99))).alias("arr_size"),
        F.element_at(
            F.sort_array(F.array(F.col("n_regionkey"), F.col("n_nationkey"), F.lit(99))), 1
        ).alias("sorted_first"),
    )


@register(
    "scalar_conditional_pack",
    """
SELECT s_suppkey,
       coalesce(NULLIF(s_name, ''), 'unknown') AS name_or_default,
       greatest(s_acctbal, 0.0) AS floored_balance,
       least(s_acctbal, 5000.0) AS capped_balance,
       CASE WHEN s_acctbal < 0 THEN 'debt' ELSE 'credit' END AS balance_class
FROM supplier
""",
)
def scalar_conditional_pack(spark, sf_dir):
    """F14/F15 conditionals: coalesce/nullif/greatest/least/case."""
    s = _t(spark, sf_dir, "supplier")["supplier"]
    return s.select(
        "s_suppkey",
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("unknown")).alias(
            "name_or_default"
        ),
        F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("floored_balance"),
        F.least(F.col("s_acctbal"), F.lit(5000.0)).alias("capped_balance"),
        F.when(F.col("s_acctbal") < 0, "debt").otherwise("credit").alias("balance_class"),
    )


# --------------------------------------------------------------------------
# Multi-join analytical queries (TPC-H shapes — the 100 TB stress path)
# --------------------------------------------------------------------------


@register(
    "tpch_q3_shipping_priority",
    """
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
""",
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter broadcast through two joins;
    filters push into every parquet scan."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp_ntz")
    )
    l = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    # no explicit broadcast: orders/customer scale with the fact data —
    # AQE broadcasts them when (and only when) they fit the threshold
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@register(
    "tpch_q5_local_supplier_volume",
    """
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join; small dims broadcast, the fact chain
    stays un-shuffled until the final aggregation."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    r = t["region"].filter(F.col("r_name") == "ASIA")
    n = t["nation"].join(F.broadcast(r), t["nation"]["n_regionkey"] == r["r_regionkey"])
    s = t["supplier"].join(F.broadcast(n), t["supplier"]["s_nationkey"] == n["n_nationkey"])
    # only region/nation are broadcast by hint (truly constant-size);
    # orders/customer/supplier scale with sf -> AQE picks the strategy
    j = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return j.groupBy("n_name").agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("revenue")
    )


@register(
    "tpch_q6_forecast_revenue",
    """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.04 AND 0.08
  AND l_quantity < 24
""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): highly selective
    conjunctive scan filter + global aggregate. All four predicates push
    into the parquet scan (min/max row-group skipping at scale); the
    aggregate is a single partial+final pair with no group keys."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    f = li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.08)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_discount").cast("decimal(18,2)")
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "tpch_q10_returned_items",
    """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
            * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): who returned the most revenue in a
    year. Fact-side filters push to scans; customer/nation broadcast;
    the top-20 is TakeOrderedAndProject (per-partition top-k), never a
    global sort."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )
    return agg.orderBy(F.desc("revenue"), "c_custkey").limit(20)


@register(
    "tpch_q18_large_volume_customers",
    """
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY 1
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM orders o
JOIN big ON big.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3, 4, 5
""",
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds a threshold — aggregate-then-semi-join. The HAVING pre-agg
    shrinks lineitem to qualifying orderkeys BEFORE any join (the big
    fact table is joined once, to a filtered key set), then re-joins for
    the detail rows."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    li = t["lineitem"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_q"))
        .filter(F.col("_q") > 250)
        .select(F.col("l_orderkey").alias("_big_orderkey"))
    )
    # the qualifying-key set's size is data-dependent and customer
    # scales with sf: no forced broadcasts, AQE decides at runtime
    j = (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("_big_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == li["l_orderkey"])
    )
    return j.groupBy(
        "c_name",
        "c_custkey",
        "o_orderkey",
        "o_orderdate",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_qty")
    )


@register(
    "subquery_scalar_above_avg",
    """
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_extendedprice > (SELECT AVG(l_extendedprice) FROM lineitem)
GROUP BY 1
""",
)
def subquery_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: rows above the global average price. Catalyst
    plans the scalar subquery as an independent stage whose single-row
    result is broadcast into the filter — the fact table is scanned once
    per stage, never per row."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    avg_price = li.agg(F.avg("l_extendedprice").alias("_avg"))
    f = li.join(F.broadcast(avg_price)).filter(
        F.col("l_extendedprice") > F.col("_avg")
    )
    return f.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "subquery_correlated_above_own_avg",
    """
WITH w AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         AVG(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
  FROM orders
)
SELECT o_custkey, COUNT(*) AS n_above,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
FROM w
WHERE o_totalprice > cust_avg
GROUP BY 1
""",
)
def subquery_correlated_above_own_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery semantics (orders above their OWN customer's
    average) via the decorrelated window formulation — one shuffle on the
    correlation key instead of a per-row subquery; the exact rewrite
    Catalyst/DuckDB apply internally, made explicit."""
    o = _t(spark, sf_dir, "orders")["orders"]
    w = W.partitionBy("o_custkey")
    enriched = o.withColumn("cust_avg", F.avg("o_totalprice").over(w))
    return (
        enriched.filter(F.col("o_totalprice") > F.col("cust_avg"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
    )


@register(
    "setops_union_distinct",
    """
SELECT nk FROM (
  SELECT c_nationkey AS nk FROM customer
  UNION
  SELECT s_nationkey AS nk FROM supplier
)
""",
)
def setops_union_distinct(spark, sf_dir):
    """UNION DISTINCT (the reference only uses UNION ALL inside its CTEs
    — SURVEY §2.7): dedup across inputs = union + hash distinct."""
    t = _t(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"].select(F.col("c_nationkey").alias("nk"))
        .union(t["supplier"].select(F.col("s_nationkey").alias("nk")))
        .distinct()
    )


@register(
    "scalar_map_pack",
    """
SELECT o_orderkey,
       map_extract(m, 'status')[1] AS status_val,
       map_extract(m, 'prio')[1] AS prio_val,
       CAST(cardinality(m) AS INTEGER) AS n_entries,
       array_to_string(map_keys(m), ',') AS keys_csv
FROM (
  SELECT o_orderkey,
         map(['status', 'prio'], [o_orderstatus, o_orderpriority]) AS m
  FROM orders
)
""",
)
def scalar_map_pack(spark, sf_dir):
    """MAP type surface (absent from the reference's type system —
    SURVEY §1.2): construct, extract by key, cardinality, keys. Spark
    map_keys preserves insertion order, matching DuckDB's list order."""
    o = _t(spark, sf_dir, "orders")["orders"]
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("prio"), F.col("o_orderpriority")
    )
    return o.select(
        "o_orderkey",
        m["status"].alias("status_val"),
        m["prio"].alias("prio_val"),
        F.size(m).alias("n_entries"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


@register(
    "tpch_q13_customer_distribution",
    """
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY 1
""",
)
def tpch_q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): two stacked
    aggregations — per-customer count, then the histogram of counts. The
    second groupBy's key cardinality is tiny (distinct counts), so its
    shuffle is negligible; the left join keeps zero-order customers."""
    t = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(t["orders"], t["customer"]["c_custkey"] == t["orders"]["o_custkey"], "left")
        .groupBy(t["customer"]["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q4_order_priority",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY 1
""",
)
def tpch_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking): correlated EXISTS with
    an extra per-row predicate (l_shipdate > o_orderdate) — a left-semi
    join whose condition mixes the equi key with a theta clause; the
    date-range filter pushes into the orders scan first."""
    t = _t(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    l = t["lineitem"]
    semi = o.join(
        l,
        (o["o_orderkey"] == l["l_orderkey"]) & (l["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# --------------------------------------------------------------------------
# TPC-H shapes beyond round 1 (gap-family widening; SURVEY.md §2.9).
# The testdata lacks partsupp / l_shipmode / l_commitdate / c_phone, so
# Q2/Q11/Q12/Q16/Q19/Q20/Q21 are out of domain; the seven below keep the
# canonical plan shapes on the columns that exist.
# --------------------------------------------------------------------------


@register(
    "tpch_q7_volume_shipping",
    """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(vol) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS vol
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 (volume shipping): bidirectional nation-pair predicate —
    a disjunction over two dimension joins. Both nation lookups are
    broadcast (25 rows); the disjunctive filter applies after, so the
    fact chain shuffles only for the final 3-key aggregate."""
    t = _t(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("revenue")
    )


@register(
    "tpch_q8_market_share",
    """
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol ELSE 0 END) AS DOUBLE)
            / CAST(SUM(vol) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS vol,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA'
    AND p.p_type = 'PROMO'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
) all_nations
GROUP BY o_year
""",
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 (national market share): the widest join in the suite —
    part+lineitem+orders+customer+2×nation+region+supplier — feeding a
    conditional-ratio aggregate. Nation/region broadcast by hint; both
    CASE sums are decimal-exact, the single division happens once per
    group in double (same operands both engines -> bit-stable)."""
    t = _t(
        spark, sf_dir,
        "part", "lineitem", "orders", "customer", "nation", "region", "supplier",
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    p = t["part"].filter(F.col("p_type") == "PROMO")
    r = t["region"].filter(F.col("r_name") == "AMERICA")
    n1 = t["nation"].join(
        F.broadcast(r), t["nation"]["n_regionkey"] == r["r_regionkey"]
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    vol = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    j = (
        t["lineitem"]
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(zero))
            .cast("double")
            .alias("_num"),
            F.sum(vol).cast("double").alias("_den"),
        )
        .select(
            "o_year", (F.col("_num") / F.col("_den")).cast("double").alias("mkt_share")
        )
    )


@register(
    "tpch_q9_product_type_profit",
    """
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
""",
)
def tpch_q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit, adapted: the testdata has no
    partsupp, so profit omits the ps_supplycost term). LIKE filter on
    part prunes the fact early through the first join; nation broadcast;
    2-key aggregate is the only full shuffle."""
    t = _t(spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    p = t["part"].filter(F.col("p_name").like("%red%"))
    n = t["nation"].select(
        F.col("n_nationkey").alias("n_key"), F.col("n_name").alias("nation")
    )
    j = (
        t["lineitem"]
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_key"))
    )
    return j.groupBy(
        "nation", F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("sum_profit")
    )


@register(
    "tpch_q14_promo_effect",
    """
SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
              THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        AS DOUBLE) AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
  AND l.l_shipdate < TIMESTAMP '1996-10-01'
""",
)
def tpch_q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 (promotion effect): one tight date-month scan filter,
    one join, a global conditional-ratio aggregate producing a single
    row — the degenerate-group path (no shuffle keys, partial+final)."""
    t = _t(spark, sf_dir, "lineitem", "part")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    vol = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    j = li.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
    return j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero))
        .cast("double")
        .alias("_num"),
        F.sum(vol).cast("double").alias("_den"),
    ).select(
        (F.lit(100.0) * F.col("_num") / F.col("_den"))
        .cast("double")
        .alias("promo_revenue")
    )


@register(
    "tpch_q15_top_supplier",
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier): an aggregate reused twice — once as the
    join input, once reduced to a scalar MAX — the classic
    view-plus-scalar-subquery shape. The revenue aggregate is computed
    once and localCheckpoint-free: Spark reuses the exchange (AQE
    ReusedExchange) for both branches; the 1-row max side is broadcast.
    Revenue is decimal-exact then double, so MAX and the equality
    compare are bit-stable across engines."""
    t = _t(spark, sf_dir, "lineitem", "supplier")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("total_revenue")
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    """
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
       AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
  SELECT l_partkey AS t_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                / COUNT(*)) AS threshold
  FROM lineitem
  GROUP BY l_partkey
) t ON t.t_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < t.threshold
""",
)
def tpch_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): correlated scalar
    subquery — each lineitem compares against ITS part's average
    quantity — decorrelated into a per-part aggregate joined back on
    partkey. The threshold is decimal-exact-sum / count (one double
    division), so the `<` boundary cannot flip between engines the way
    a float AVG could. Brand filter prunes parts before the join."""
    t = _t(spark, sf_dir, "lineitem", "part")
    per_part = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg(
            (
                F.lit(0.2)
                * (
                    F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                    / F.count(F.lit(1))
                )
            ).alias("threshold")
        )
    )
    p = t["part"].filter(F.col("p_brand") == "Brand#1")
    j = (
        t["lineitem"]
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
    )
    return j.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.lit(7.0))
        .cast("double")
        .alias("avg_yearly")
    )


@register(
    "tpch_q22_global_sales_opportunity",
    """
SELECT nation_group, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM (
  SELECT c.c_nationkey % 5 AS nation_group, c.c_acctbal
  FROM customer c
  WHERE c.c_acctbal > (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1999-01-01'
  )
) promising
GROUP BY nation_group
""",
)
def tpch_q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity, adapted: no c_phone in
    the testdata, so country buckets come from c_nationkey % 5):
    uncorrelated scalar AVG subquery (broadcast 1-row) + NOT EXISTS
    anti-join against recent orders. The average is decimal-exact-sum /
    count to keep the `>` boundary engine-stable."""
    t = _t(spark, sf_dir, "customer", "orders")
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("_avg")
        )
    )
    recent = t["orders"].filter(F.col("o_orderdate") >= "1999-01-01")
    promising = (
        t["customer"]
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return promising.groupBy(
        (F.col("c_nationkey") % 5).alias("nation_group")
    ).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
    )


@register(
    "affinity_part_pairs_topk",
    """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, COUNT(*) AS n_orders
FROM pairs
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
""",
)
def affinity_part_pairs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the 20 part pairs most often bought in
    the SAME order — the co-occurrence mining primitive behind
    recommenders and assortment analysis.

    Scale shape: the self-join co-partitions on l_orderkey, so pair
    generation is per-basket and costs Σ basket_size² — bounded by the
    max items per order (7 in TPC-H), NEVER |parts|². The a<b predicate
    halves the output and canonicalizes the pair. The top-20 is
    orderBy+limit → TakeOrderedAndProject (per-partition heaps), no
    global sort; count ties are broken by the pair itself so the cut is
    engine-invariant. A whale basket would blow the per-basket square —
    the same salted-sub-bucket cap as the LSH pair generators
    (operators/dedup.py) applies if baskets were unbounded."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    items = li.select("l_orderkey", "l_partkey").distinct()
    right = items.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = items.join(
        right,
        (items["l_orderkey"] == right["_ok"])
        & (items["l_partkey"] < right["part_b"]),
    )
    return (
        pairs.groupBy(F.col("l_partkey").alias("part_a"), "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


@register(
    "customer_rfm_segments",
    """
WITH cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY 1
),
scored AS (
  SELECT o_custkey, frequency, monetary,
         ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_seg,
         ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_seg,
         ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_seg
  FROM cust
)
SELECT CAST(r_seg AS BIGINT) AS r_seg, CAST(f_seg AS BIGINT) AS f_seg,
       CAST(m_seg AS BIGINT) AS m_seg,
       COUNT(*) AS n_customers,
       CAST(SUM(monetary) AS DOUBLE) AS total_monetary
FROM scored
GROUP BY 1, 2, 3
""",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: customers quartiled independently on Recency
    (last order date), Frequency (order count) and Monetary (exact
    lifetime spend), reported as the 4x4x4 segment grid with counts and
    spend — the classic CRM cohort cube.

    Each quartile is a GLOBAL ntile, computed WITHOUT the
    single-partition window the naive `ntile(k) OVER (ORDER BY ...)`
    compiles to: rank via the range-partitioned global ranker, then
    derive the bucket from the closed-form split (first n%k buckets
    take one extra row) — bit-identical to the window function, scales
    like a range sort. DESC orders rank ascending on order-isomorphic
    negated keys (recency via a negated epoch difference), with the
    custkey tiebreak making every quartile engine-invariant. Input to
    the rankers is the customer-grain aggregate (one fact shuffle);
    the final grid is at most k³ rows."""
    from ibis_olap_aggregation_spark.operators.ranking import global_row_number

    o = _t(spark, sf_dir, "orders")["orders"]
    cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    n = cust.count()
    k = 4
    small, extra = divmod(n, k)
    boundary = extra * (small + 1)

    def bucket(rn: str) -> F.Column:
        return (
            F.when(
                F.col(rn) <= boundary,
                F.expr(f"({rn} - 1) div {small + 1} + 1"),
            )
            .otherwise(
                F.expr(f"{extra} + ({rn} - {boundary} - 1) div {max(small, 1)} + 1")
            )
            .cast("bigint")
        )

    scored = cust.withColumn(
        "_neg_recency",
        -F.expr("timestampdiff(SECOND, timestamp'1990-01-01', last_order)"),
    ).withColumn("_neg_freq", -F.col("frequency")).withColumn(
        "_neg_mon", -F.col("monetary")
    )
    scored = global_row_number(scored, ["_neg_recency", "o_custkey"], "_rn_r", row_count=n)
    scored = global_row_number(scored, ["_neg_freq", "o_custkey"], "_rn_f", row_count=n)
    scored = global_row_number(scored, ["_neg_mon", "o_custkey"], "_rn_m", row_count=n)
    return (
        scored.select(
            bucket("_rn_r").alias("r_seg"),
            bucket("_rn_f").alias("f_seg"),
            bucket("_rn_m").alias("m_seg"),
            "monetary",
        )
        .groupBy("r_seg", "f_seg", "m_seg")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary").cast("double").alias("total_monetary"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter-pruned semi-join (runtime row-level filter pushdown)
# ---------------------------------------------------------------------------

# Bloom geometry: m bit positions, k hash probes. The broadcast side is
# the DISTINCT position set — hard-capped at BLOOM_M rows (~8 MB of
# longs) NO MATTER the build side's cardinality, which is the whole
# point: the prune ships a bounded sketch where a broadcast of the keys
# themselves would be SF-linear. k=3 at n ≈ BLOOM_M/10 keys gives a
# false-positive rate ≈ (1 - e^(-kn/m))^k ≈ 2.5% — false positives cost
# only wasted confirm-join work, never correctness.
BLOOM_M = 1 << 20
BLOOM_K = 3


@register(
    "join_bloom_pruned_semi",
    """
SELECT l.l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem l
WHERE l.l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
GROUP BY 1
""",
)
def join_bloom_pruned_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join with a distributed Bloom-filter pre-prune: revenue of
    lineitems belonging to URGENT orders. The output is the EXACT
    semi-join (the oracle is the plain IN-subquery); the bloom stage is
    a runtime optimization that discards ~non-matching probe rows
    before any key shuffle — the DataFrame-level analogue of Spark's
    AQE runtime bloom pushdown, built here from first principles so the
    bound is explicit and testable.

    Plan: (1) build side (urgent order keys) maps each key to BLOOM_K
    xxhash64 bit positions; the DISTINCT position set is ≤ BLOOM_M rows
    (module constant — bounded regardless of SF, see note above);
    (2) the probe side runs BLOOM_K broadcast LEFT SEMI joins, one per
    hash — a row survives only if ALL its positions are set, exactly a
    bloom membership test, with no explode and no shuffle of the probe;
    (3) survivors (matches + ≈2.5% false positives) are confirmed with
    the exact semi-join on the key — the only shuffle of probe rows,
    now carrying ~selectivity× the original volume.
    """
    from ibis_olap_aggregation_spark.session import query_cache

    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    # query-scoped cache: the build keys feed BLOOM_K bit-set builds plus
    # the confirm join — without it the filtered orders scan runs 4x
    build = query_cache(
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("bk"))
    )

    def positions(key: F.Column) -> list[F.Column]:
        return [
            F.pmod(F.xxhash64(F.lit(i), key), F.lit(BLOOM_M)).alias(f"pos{i}")
            for i in range(BLOOM_K)
        ]

    probe = t["lineitem"].select(
        "l_orderkey",
        "l_returnflag",
        "l_extendedprice",
        "l_discount",
        *positions(F.col("l_orderkey")),
    )
    for i in range(BLOOM_K):
        # distinct position set for hash i: ≤ min(|build|, BLOOM_M) rows
        bits = build.select(
            F.pmod(F.xxhash64(F.lit(i), F.col("bk")), F.lit(BLOOM_M)).alias(
                f"pos{i}"
            )
        ).distinct()
        probe = probe.join(F.broadcast(bits), f"pos{i}", "left_semi")
    confirmed = probe.join(
        build, probe["l_orderkey"] == build["bk"], "left_semi"
    )
    return confirmed.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("revenue"),
    )
