"""Analytic operators: percentiles, pivot, range join, RANGE-frame
windows, arg-max per group.

Fills the SQL-analytics gaps the reference never exercises (SURVEY.md
§2.4-§2.5 "not present" rows): these are standard warehouse surface a
user migrating off the reference's DuckDB backend would expect.

Scale notes (100 TB):
- exact percentiles shuffle once on the group key (Catalyst's
  percentile is a typed-aggregate with partial merge); for extreme
  cardinalities swap in approx_percentile — same call shape.
- the range join is rewritten as BIN-KEY EQUI-JOIN (compute the bucket
  id with arithmetic, join on it) — the naive theta-join is a
  nested-loop over n x buckets; the rewrite is a broadcast hash join.
- RANGE-frame windows partition by user_id — never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import dsum, register, sum_wide, sum_wide_product
from ibis_olap_aggregation_spark.session import dim_side, load_table, query_cache


@register(
    "agg_percentiles",
    """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25_qty,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75_qty,
       ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY 1
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (SQL PERCENTILE_CONT
    semantics — Spark `percentile` == DuckDB `quantile_cont`)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("p25_qty"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("p75_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "pivot_flag_by_status",
    """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O
FROM lineitem
GROUP BY 1
""",
)
def pivot_flag_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: rows by l_returnflag, columns by l_linestatus, SUM cell —
    Spark's native pivot with an EXPLICIT value list (never let pivot run
    its distinct-scan pre-pass on big data)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
    )
    return out.select(
        "l_returnflag",
        F.col("F").alias("qty_F"),
        F.col("O").alias("qty_O"),
    )


@register(
    "join_range_bucket",
    """
WITH buckets AS (
  SELECT b.b AS bucket_id, b.b * 5.0 AS lo, (b.b + 1) * 5.0 AS hi
  FROM (SELECT unnest(generate_series(0, 19)) AS b) b
)
SELECT bk.bucket_id, bk.lo, bk.hi,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events e
JOIN buckets bk ON e.value >= bk.lo AND e.value < bk.hi
GROUP BY 1, 2, 3
""",
)
def join_range_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join of events into value buckets.
    Implemented as the BIN-KEY REWRITE: bucket_id = floor(value/width)
    computed arithmetically, then an equi-join on bucket_id — a broadcast
    hash join instead of the nested-loop theta-join the naive predicate
    produces. Identical semantics for uniform bucket widths."""
    ev = load_table(spark, sf_dir, "events")
    buckets = spark.range(0, 20).select(
        F.col("id").cast("bigint").alias("bucket_id"),
        (F.col("id") * 5.0).alias("lo"),
        ((F.col("id") + 1) * 5.0).alias("hi"),
    )
    binned = ev.withColumn(
        "bucket_id", F.floor(F.col("value") / 5.0).cast("bigint")
    )
    return (
        binned.join(F.broadcast(buckets), "bucket_id")
        .groupBy("bucket_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        )
    )


@register(
    "window_range_frame_trailing",
    """
SELECT event_id, user_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         AS events_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS value_last_hour
FROM events
""",
)
def window_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per user, count/sum over the trailing hour of
    EVENT TIME (not row count) — the frame boundary is a value offset on
    epoch micros, identical in both engines."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("events_last_hour"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("value_last_hour"),
    )


@register(
    "agg_argmax_per_group",
    """
SELECT o_custkey,
       MAX(o_orderdate) AS last_order_date,
       arg_max(o_orderkey,
               date_diff('day', DATE '1970-01-01', o_orderdate)::BIGINT
                 * 10000000000 + o_orderkey) AS last_order_key,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1
""",
)
def agg_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON / arg-max per group: each customer's most recent order
    via max_by with a composite orderer packed into one bigint
    (epoch-DAYS * 1e10 + orderkey; days keep the product < 2^63) so ties
    on the date break deterministically on the key — single hash
    aggregate, no window, no self-join."""
    o = load_table(spark, sf_dir, "orders")
    orderer = (
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("bigint")
        * F.lit(10_000_000_000).cast("bigint")
        + F.col("o_orderkey")
    )
    return o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order_date"),
        F.max_by(F.col("o_orderkey"), orderer).alias("last_order_key"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "unpivot_measures_long",
    """
SELECT l_returnflag, measure,
       COUNT(*) AS n,
       CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
       ROUND(CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
         AS avg_val
FROM (
  UNPIVOT (SELECT l_returnflag, l_quantity, l_extendedprice, l_discount, l_tax
           FROM lineitem)
  ON l_quantity, l_extendedprice, l_discount, l_tax
  INTO NAME measure VALUE val
)
GROUP BY 1, 2
""",
)
def unpivot_measures_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long, the inverse of pivot): stack the four
    lineitem measure columns into (measure, val) rows, then aggregate
    per (returnflag, measure) — the melt every metrics store /
    long-format export needs. Spark's native `unpivot` expands rows
    MAP-SIDE (an Expand node, no shuffle, no UDF); the only shuffle is
    the final aggregation, whose key space is |flags| x |measures|.
    Sums accumulate in DECIMAL(18,2) — the repo's exact-sum idiom; all
    four measures are generated at 2 decimal places, so the double ->
    decimal cast is unambiguous in both engines (a wider scale like
    (28,10) would round double noise digits, where the engines' tie
    rules differ by ulps)."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )
    # contract: NULL measure cells are EXCLUDED (Spark's unpivot keeps
    # them as rows; DuckDB's UNPIVOT drops them by default) — pinned
    # here so the parity holds on tables with nullable measures too
    long = long.filter(F.col("val").isNotNull())
    s = F.sum(F.col("val").cast("decimal(18,2)")).cast("double")
    return long.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n"),
        s.alias("sum_val"),
        F.round(s / F.count(F.lit(1)), 6).alias("avg_val"),
    )


@register(
    "join_reconcile_audit",
    """
WITH l AS (SELECT DISTINCT o_orderkey AS k FROM orders),
r AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
j AS (
  SELECT COALESCE(l.k, r.k) AS k,
         l.k IS NOT NULL AS in_left,
         r.k IS NOT NULL AS in_right
  FROM l FULL OUTER JOIN r ON l.k = r.k
)
SELECT CASE WHEN in_left AND in_right THEN 'both'
            WHEN in_left THEN 'left_only'
            ELSE 'right_only' END AS presence,
       COUNT(*) AS n_keys,
       CAST(MIN(k) AS BIGINT) AS min_key,
       CAST(MAX(k) AS BIGINT) AS max_key
FROM j
GROUP BY 1
""",
)
def join_reconcile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation audit between two key sets (orders vs lineitem
    order keys): full-outer join on the distinct keys, bucketing every
    key as both / left_only / right_only with count and key range — the
    first query anyone runs when two systems are supposed to agree.
    Scale: two distincts (map-side combined) + one co-partitioned
    full-outer join on the key; no fact-width data moves."""
    l = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("lk")
    ).distinct()
    r = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("rk")
    ).distinct()
    j = l.join(r, l["lk"] == r["rk"], "full_outer").select(
        F.coalesce("lk", "rk").alias("k"),
        F.col("lk").isNotNull().alias("in_left"),
        F.col("rk").isNotNull().alias("in_right"),
    )
    presence = (
        F.when(F.col("in_left") & F.col("in_right"), "both")
        .when(F.col("in_left"), "left_only")
        .otherwise("right_only")
    )
    return j.groupBy(presence.alias("presence")).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.min("k").cast("bigint").alias("min_key"),
        F.max("k").cast("bigint").alias("max_key"),
    )


@register(
    "agg_conditional_distinct",
    """
SELECT event_type,
       COUNT(DISTINCT user_id) AS users_total,
       COUNT(DISTINCT CASE WHEN value > 50 THEN user_id END)
         AS users_high_value,
       COUNT(DISTINCT CASE WHEN value <= 50 THEN user_id END)
         AS users_low_value,
       ROUND(COUNT(DISTINCT CASE WHEN value > 50 THEN user_id END)
             * 1.0 / COUNT(DISTINCT user_id), 6) AS high_value_user_frac
FROM events
GROUP BY 1
""",
)
def agg_conditional_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered distinct counts — COUNT(DISTINCT CASE WHEN ...) — the
    everyday segmentation aggregate (distinct users overall vs within a
    value band, per event type). Spark plans the multi-distinct via one
    Expand + two-phase aggregate: one shuffle family, no joins."""
    ev = load_table(spark, sf_dir, "events")
    hi = F.when(F.col("value") > 50, F.col("user_id"))
    lo = F.when(F.col("value") <= 50, F.col("user_id"))
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users_total"),
        F.countDistinct(hi).alias("users_high_value"),
        F.countDistinct(lo).alias("users_low_value"),
        F.round(
            F.countDistinct(hi) * 1.0 / F.countDistinct("user_id"), 6
        ).alias("high_value_user_frac"),
    )


@register(
    "events_daily_new_cumulative",
    """
WITH daily AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
firsts AS (
  SELECT user_id, MIN(d) AS first_d FROM daily GROUP BY 1
),
per_day AS (
  SELECT d.d, COUNT(*) AS active_users,
         SUM(CASE WHEN f.first_d = d.d THEN 1 ELSE 0 END) AS new_users
  FROM daily d JOIN firsts f USING (user_id)
  GROUP BY 1
)
SELECT CAST(d AS TIMESTAMP) AS day,
       CAST(active_users AS BIGINT) AS active_users,
       CAST(new_users AS BIGINT) AS new_users,
       CAST(active_users - new_users AS BIGINT) AS returning_users,
       CAST(SUM(new_users) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cumulative_distinct_users
FROM per_day
""",
)
def events_daily_new_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active / new / returning users plus the RUNNING count of
    distinct users ever seen — via the first-seen transform, NOT a
    cumulative COUNT(DISTINCT) window. The naive
    `COUNT(DISTINCT user_id) OVER (ORDER BY day)` re-scans every prior
    day per day (quadratic, and Spark refuses DISTINCT in windows
    anyway); first-seen makes it linear: a user adds +1 exactly on
    their first day, so the cumulative distinct count IS the running
    sum of new_users.

    Scale: two shuffles on user_id (daily-distinct, first-seen — AQE
    coalesces the same-key pair), one on day. The only ordered window
    runs on the DAY-GRAIN aggregate — rows bounded by the calendar
    (~365/year), never by events — so the single-partition frame is a
    constant-size tail, not a data-sized one."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("first_d"))
    per_day = (
        ev.join(firsts, "user_id")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.sum(
                F.when(F.col("first_d") == F.col("d"), 1).otherwise(0)
            ).alias("new_users"),
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_day.select(
        F.col("d").cast("timestamp_ntz").alias("day"),
        F.col("active_users").cast("bigint").alias("active_users"),
        F.col("new_users").cast("bigint").alias("new_users"),
        (F.col("active_users") - F.col("new_users"))
        .cast("bigint")
        .alias("returning_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_distinct_users"),
    )


@register(
    "interval_backlog_daily",
    """
WITH iv AS (
  SELECT LEAST(CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS start_d,
         GREATEST(CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS end_d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
deltas AS (
  SELECT start_d AS d, 1 AS delta FROM iv
  UNION ALL
  SELECT end_d AS d, -1 AS delta FROM iv
),
day_net AS (
  SELECT d, SUM(delta) AS net FROM deltas GROUP BY 1
)
SELECT CAST(d AS TIMESTAMP) AS day,
       CAST(SUM(net) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS open_backlog
FROM day_net
""",
)
def interval_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many lineitems are OPEN (ordered, not yet shipped) on each
    boundary day — the interval-stabbing question, answered by the
    sweep-line rewrite: +1 at order date, -1 at ship date, running sum
    of the per-day net. The naive form joins every day against every
    interval containing it (days x intervals, a range join that
    explodes at scale); the sweep-line is one keyed lineitem-orders
    equi-join, one UNION ALL projection, one groupBy on day, and a
    running sum over the DAY-GRAIN aggregate (calendar-bounded rows, so
    the ordered window's single partition is a constant-size tail —
    same argument as events_daily_new_cumulative).

    Open on day d counts intervals with start <= d < end, where the
    interval is the normalized [min(order, ship), max(order, ship))
    span (the synthetic ship dates are independent of order dates, so
    the raw pair can be inverted); only
    boundary days appear (no gap-fill — between boundaries the count is
    constant anyway)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # the synthetic ship dates are independent of order dates (ship can
    # precede order), so normalize each pair into a well-formed interval
    # [min, max) — the sweep-line requires start <= end
    iv = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.least(F.to_date("o_orderdate"), F.to_date("l_shipdate")).alias("start_d"),
        F.greatest(F.to_date("o_orderdate"), F.to_date("l_shipdate")).alias("end_d"),
    )
    deltas = iv.select(F.col("start_d").alias("d"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("end_d").alias("d"), F.lit(-1).alias("delta"))
    )
    day_net = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return day_net.select(
        F.col("d").cast("timestamp_ntz").alias("day"),
        F.sum("net").over(w).cast("bigint").alias("open_backlog"),
    )


@register(
    "pareto_frontier_parts",
    """
SELECT x.p_partkey, x.p_name, x.p_retailprice, x.p_size
FROM part x
WHERE NOT EXISTS (
  SELECT 1 FROM part y
  WHERE y.p_retailprice <= x.p_retailprice
    AND y.p_size >= x.p_size
    AND (y.p_retailprice < x.p_retailprice OR y.p_size > x.p_size)
)
""",
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline, Borzsony et al. ICDE'01): parts no
    other part dominates on (cheaper-or-equal price, bigger-or-equal
    size, strict in one). The oracle runs the SPEC — a universal
    quantifier via NOT EXISTS — while the engine runs the sort-based
    LINEAR rewrite, so the differential check covers the algorithm, not
    just the arithmetic.

    Rewrite: x is dominated iff
      max(size | price' < price)  >= x.size   (strictly-cheaper branch)
      OR max(size | price' = price) > x.size  (same-price branch).
    Aggregate to price grain first (max size per distinct price), take
    the running max over strictly-preceding prices, broadcast the
    price-grain verdict table back onto parts. The ordered window runs
    over DISTINCT PRICES — dimension-bounded, orders of magnitude below
    row count; at a cardinality where that single partition hurt, the
    running max is distributive and splits into the same range-partition
    + broadcast-offsets two-pass as operators/ranking.py. Ties on both
    dims stay mutually non-dominating (both survive) — the running-max
    formulation gets that right where a naive rank-based skyline drops
    one of the pair."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice", "p_size"
    )
    per_price = p.groupBy("p_retailprice").agg(F.max("p_size").alias("msz"))
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    verdict = per_price.withColumn("run_prev", F.max("msz").over(w))
    # per-distinct-price verdicts are part-derived (SF-linear): leave
    # the join un-hinted — AQE sizes the actual aggregate at runtime
    out = p.join(verdict, "p_retailprice")
    dominated = (
        F.col("run_prev").isNotNull() & (F.col("run_prev") >= F.col("p_size"))
    ) | (F.col("msz") > F.col("p_size"))
    return out.filter(~dominated).select(
        "p_partkey", "p_name", "p_retailprice", "p_size"
    )


@register(
    "agg_gini_concentration",
    """
WITH rev AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT c.c_mktsegment AS segment, rev.r,
         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY rev.r, rev.o_custkey) AS i
  FROM rev JOIN customer c ON c.c_custkey = rev.o_custkey
)
SELECT segment,
       COUNT(*) AS n_customers,
       CAST(SUM(r) AS DOUBLE) AS total_revenue,
       ROUND(2.0 * CAST(SUM(CAST(i AS DECIMAL(10,0)) * r) AS DOUBLE)
               / (COUNT(*) * CAST(SUM(r) AS DOUBLE))
             - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
FROM ranked
GROUP BY 1
""",
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue within each market
    segment — the Lorenz-curve concentration measure (0 = equal, ->1 =
    winner-take-all) that a data-mixing pipeline uses to detect source
    domination. Rank formula: G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n
    over ascending x; invariant to tie order (equal x commute inside
    sum(i*x_i)), so the custkey tiebreak only pins engine determinism.

    Exactness: revenues and the rank-weighted sum stay in DECIMAL
    through every cross-row sum (exact, associative — partial-agg order
    free); doubles appear only in the final scalar formula, where both
    engines evaluate the identical expression tree on identical inputs.
    The rank window partitions by segment (bounded per-segment customer
    counts; for a skewed segment the two-pass ranker applies)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r")
    )
    ranked = rev.join(dim_side(c), rev.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        "r",
        F.row_number()
        .over(
            Window.partitionBy("c_mktsegment").orderBy("r", "o_custkey")
        )
        .alias("i"),
    )
    n = F.count(F.lit(1))
    sum_r = F.sum("r")
    sum_ir = F.sum(F.col("i").cast("decimal(10,0)") * F.col("r"))
    return ranked.groupBy("segment").agg(
        n.alias("n_customers"),
        sum_r.cast("double").alias("total_revenue"),
        F.round(
            F.lit(2.0) * sum_ir.cast("double") / (n * sum_r.cast("double"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )


@register(
    "agg_trimmed_mean",
    """
WITH bounds AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.1) AS lo,
         quantile_cont(l_extendedprice, 0.9) AS hi
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
       COUNT(*) AS n,
       ROUND(CAST(SUM(CASE WHEN l.l_extendedprice >= b.lo
                            AND l.l_extendedprice <= b.hi
                      THEN CAST(l.l_extendedprice AS DECIMAL(18,6)) END)
                  AS DOUBLE)
             / SUM(CASE WHEN l.l_extendedprice >= b.lo
                         AND l.l_extendedprice <= b.hi THEN 1 END), 6)
         AS trimmed_mean,
       ROUND(CAST(SUM(CAST(LEAST(GREATEST(l.l_extendedprice, b.lo), b.hi)
                           AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS winsorized_mean
FROM lineitem l JOIN bounds b ON b.l_returnflag = l.l_returnflag
GROUP BY 1
""",
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location estimates per group: the 10% TRIMMED mean (drop
    rows outside [p10, p90]) and the WINSORIZED mean (clamp them to the
    bounds) — the outlier-resistant aggregates a quality pipeline uses
    where a raw AVG is one corrupt row away from garbage.

    Two passes over the fact stream sharing one shuffle key: bounds are
    a per-group exact-percentile aggregate (group-count-sized), then a
    broadcast join attaches them and a second grouped pass computes both
    means. Boundary safety: a comparison against the interpolated
    percentile can only be decided by a data row when the percentile
    lands ON a data point (interpolation fraction 0), where both engines
    return that point exactly — strictly-interior bounds can't flip any
    comparison regardless of last-ulp interpolation differences. Sums
    route through DECIMAL per the cross-row rule."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    bounds = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.1)").alias("lo"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("hi"),
    )
    j = li.join(F.broadcast(bounds), "l_returnflag")
    inside = (F.col("l_extendedprice") >= F.col("lo")) & (
        F.col("l_extendedprice") <= F.col("hi")
    )
    clamped = F.least(F.greatest("l_extendedprice", F.col("lo")), F.col("hi"))
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(
                F.when(inside, F.col("l_extendedprice").cast("decimal(18,6)"))
            ).cast("double")
            / F.sum(F.when(inside, F.lit(1))),
            6,
        ).alias("trimmed_mean"),
        F.round(
            F.sum(clamped.cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("winsorized_mean"),
    )


@register(
    "affinity_rules_lift",
    """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
supp AS (SELECT l_partkey, COUNT(*) AS n_part FROM items GROUP BY 1),
pairs AS (
  SELECT x.l_partkey AS part_a, y.l_partkey AS part_b, COUNT(*) AS n_both
  FROM items x
  JOIN items y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, n_both, sa.n_part AS n_a, sb.n_part AS n_b,
       ROUND(CAST(n_both AS DOUBLE) / sa.n_part, 6) AS confidence_a_to_b,
       ROUND(CAST(n_both AS DOUBLE) * n.n_orders / (sa.n_part * sb.n_part), 6)
         AS lift
FROM pairs
JOIN supp sa ON sa.l_partkey = part_a
JOIN supp sb ON sb.l_partkey = part_b
CROSS JOIN n
WHERE n_both >= 5
ORDER BY ROUND(CAST(n_both AS DOUBLE) * n.n_orders
               / (sa.n_part * sb.n_part), 6) DESC, part_a, part_b
LIMIT 20
""",
)
def affinity_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule metrics over co-purchase pairs (Agrawal-Srikant
    market-basket): support, confidence P(b|a) and LIFT
    P(ab)/(P(a)P(b)) with a minimum-support cut — the ranking that
    separates 'popular together because both are popular' from genuine
    affinity, which the raw pair counts in affinity_part_pairs_topk
    cannot do.

    Scale: identical join graph to the pair-count query (shuffle on
    l_orderkey bounded by order fan-out) plus two NODE-sized support
    attaches (broadcast only below PAGERANK_BROADCAST_NODE_CAP, probed
    on the cached aggregate — SF-linear, the cosine query's shape) and
    a single-row basket-count attach. The min-support filter runs
    BEFORE the support joins, so the pair stream is pruned early;
    ratios are per-row double arithmetic on exact counts."""
    from ibis_olap_aggregation_spark.operators.graph import (
        copurchase_pairs,
        order_items,
        order_items_raw,
    )

    items = order_items(spark, sf_dir)
    # the pair build dedups in its own collect_set — feed it the raw
    # projection and keep the distinct only for the support counts below
    pairs = copurchase_pairs(order_items_raw(spark, sf_dir)).select(
        F.col("pa").alias("part_a"),
        F.col("pb").alias("part_b"),
        F.col("w").alias("n_both"),
    ).filter(F.col("n_both") >= 5)
    # the per-part support is NODE-sized (SF-linear — PageRank's
    # rank-vector shape): broadcast only below the node cap, probed on
    # the query-cached aggregate both attaches then read
    from ibis_olap_aggregation_spark.operators.graph import (
        PAGERANK_BROADCAST_NODE_CAP,
    )

    supp = query_cache(
        items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    )
    cap = PAGERANK_BROADCAST_NODE_CAP
    small_nodes = supp.limit(cap).count() < cap

    def _node_side(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small_nodes else df.hint("merge")

    n = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    sa = supp.select(
        F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a")
    )
    sb = supp.select(
        F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b")
    )
    out = (
        pairs.join(_node_side(sa), "part_a")
        .join(_node_side(sb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(F.col("n_both").cast("double") / F.col("n_a"), 6).alias(
                "confidence_a_to_b"
            ),
            F.round(
                F.col("n_both").cast("double")
                * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
    return out.orderBy(
        F.col("lift").desc(), F.col("part_a"), F.col("part_b")
    ).limit(20)


@register(
    "window_moving_median",
    """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT CAST(d AS TIMESTAMP) AS day, revenue,
       ROUND(quantile_cont(revenue, 0.5) OVER w7, 6) AS moving_median_7d,
       ROUND(CAST(SUM(CAST(revenue AS DECIMAL(18,6))) OVER w7 AS DOUBLE)
             / COUNT(*) OVER w7, 6) AS moving_avg_7d
FROM daily
WINDOW w7 AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving MEDIAN over a trailing 7-row window of daily revenue —
    the robust smoother (median filters ignore single-day spikes that
    drag a moving average), exercising an exact ORDER-STATISTIC
    aggregate as a WINDOW function, which neither the plain window pack
    nor the percentile aggregate covers.

    The ordered window runs on the DAY-GRAIN aggregate — calendar-
    bounded rows (the events_daily_new_cumulative argument), so its
    single partition is a constant-size tail behind one fact shuffle.
    The moving average rides the same frame through a DECIMAL sum; the
    median's linear interpolation has cross-engine parity (Spark
    percentile == DuckDB quantile_cont, the agg_percentiles pin)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        dsum("o_totalprice", "revenue")
    )
    w7 = Window.orderBy("d").rowsBetween(-6, Window.currentRow)
    return daily.select(
        F.col("d").cast("timestamp_ntz").alias("day"),
        "revenue",
        F.round(F.expr(
            "percentile(revenue, 0.5) OVER (ORDER BY d "
            "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"
        ), 6).alias("moving_median_7d"),
        F.round(
            F.sum(F.col("revenue").cast("decimal(18,6)")).over(w7).cast("double")
            / F.count(F.lit(1)).over(w7),
            6,
        ).alias("moving_avg_7d"),
    )


@register(
    "sample_quantile_normalize",
    """
WITH rev AS (
  SELECT o_custkey, c_mktsegment AS segment,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY 1, 2
),
g AS (
  SELECT revenue,
         ROW_NUMBER() OVER (ORDER BY revenue, o_custkey) AS grank,
         COUNT(*) OVER () AS n
  FROM rev
),
s AS (
  SELECT o_custkey, segment, revenue,
         PERCENT_RANK() OVER (PARTITION BY segment
                              ORDER BY revenue, o_custkey) AS p,
         COUNT(*) OVER () AS n
  FROM rev
)
SELECT s.o_custkey, s.segment, s.revenue,
       ROUND(g.revenue, 6) AS normalized_revenue
FROM s
JOIN g ON g.grank = 1 + CAST(ROUND(s.p * (s.n - 1), 0) AS BIGINT)
""",
)
def sample_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE NORMALIZATION: map every customer's revenue onto the
    GLOBAL revenue distribution at the same within-segment percentile —
    the standard cross-batch/cross-source distribution matcher (makes
    segment A's p90 customer comparable to segment B's p90 customer
    regardless of how different the raw scales are; genomics/feature
    pipelines run exactly this transform).

    Mechanics: within-segment PERCENT_RANK -> index into the globally
    RANKED value array (1 + round(p * (N-1))) -> equi-join on the rank.
    All ordering is (value, custkey)-tiebroken integer ranks, so no
    float comparison decides anything; windows partition by segment
    (the global rank window is customer-grain, calendar-argument
    bounded... customer-count bounded — at a cardinality where its
    single partition hurt, the two-pass ranker in operators/ranking.py
    is the drop-in). The rank join is an integer equi-join."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = (
        o.join(dim_side(c), o.o_custkey == c.c_custkey)
        .groupBy("o_custkey", F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    g = rev.select(
        "revenue",
        F.row_number()
        .over(Window.orderBy("revenue", "o_custkey"))
        .alias("grank"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    s = rev.select(
        "o_custkey",
        "segment",
        "revenue",
        F.percent_rank()
        .over(Window.partitionBy("segment").orderBy("revenue", "o_custkey"))
        .alias("p"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    target = (F.lit(1) + F.round(s.p * (s.n - 1), 0).cast("bigint")).alias("tidx")
    s2 = s.select("o_custkey", "segment", "revenue", target)
    g2 = g.select(F.col("grank"), F.col("revenue").alias("gval"))
    return s2.join(g2, s2.tidx == g2.grank).select(
        "o_custkey",
        "segment",
        "revenue",
        F.round("gval", 6).alias("normalized_revenue"),
    )


@register(
    "agg_ols_daily_trend",
    """
WITH daily AS (
  SELECT r.r_name AS region,
         datediff('day', DATE '1992-01-01', CAST(o.o_orderdate AS DATE)) AS x,
         SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS y
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
),
s AS (
  SELECT region,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS BIGINT) * x) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x AS BIGINT) * y) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
  FROM daily GROUP BY 1
)
SELECT region, CAST(n AS BIGINT) AS n_days,
       ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx) / 100.0, 6)
         AS slope_usd_per_day,
       ROUND((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n / 100.0, 6)
         AS intercept_usd,
       ROUND((n*sxy - sx*sy) * (n*sxy - sx*sy)
             / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
FROM s
ORDER BY region
""",
)
def agg_ols_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region ordinary-least-squares trend of DAILY REVENUE over
    time: slope (USD/day), intercept, and R^2 from the closed-form
    normal equations — the regression-as-aggregation idiom (one pass,
    five sufficient statistics) that replaces fitting libraries for
    monitoring-scale trend questions.

    NOT Spark's built-in regr_slope/regr_r2: those accumulate FP sums
    in partition order and won't hash-match another engine. Here x (day
    index since a fixed epoch) and y (exact revenue cents) are
    integers, the sufficient statistics Σx Σy Σxy Σx² Σy² are EXACT
    integer sums (Σy² routes through decimal(38) — y² ~ 9e16 per row
    overflows a bigint SUM at bench scale), and only the final
    closed-form arithmetic runs in double — one fixed expression tree,
    bit-identical cross-engine.

    Scale: the daily pre-aggregate shuffles once on (region, day); the
    sufficient-statistic reduce is 5 columns over day-count-sized
    input. Nothing holds raw rows; the day dimension caps the second
    stage at a few thousand rows per region regardless of fact size."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
            ).alias("x"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("y")
        )
    )
    xb = F.col("x").cast("bigint")
    s = daily.groupBy("region").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(xb * F.col("x")).cast("double").alias("sxx"),
        # x*y ~ day-index x daily-cents passes 2^63 at fact scale —
        # and the PRODUCT itself must be decimal, not just the sum
        # (day 2500 x ~1e17 cents wraps bigint before any widening)
        sum_wide_product(xb, F.col("y"), check_in=daily).cast("double").alias("sxy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("syy"),
    )
    n_, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    cov = n_ * sxy - sx * sy
    varx = n_ * sxx - sx * sx
    vary = n_ * syy - sy * sy
    slope = cov / varx
    return s.select(
        "region",
        n_.cast("bigint").alias("n_days"),
        F.round(slope / F.lit(100.0), 6).alias("slope_usd_per_day"),
        F.round((sy - slope * sx) / n_ / F.lit(100.0), 6).alias("intercept_usd"),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
    ).orderBy("region")


@register(
    "agg_spearman_rank_corr",
    """
WITH spend AS (
  SELECT c.c_custkey, n.n_name AS nation, c.c_acctbal AS x,
         COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0) AS y
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
),
rk AS (
  SELECT nation,
         2 * RANK() OVER (PARTITION BY nation ORDER BY x)
           + COUNT(*) OVER (PARTITION BY nation, x) - 1 AS ra,
         2 * RANK() OVER (PARTITION BY nation ORDER BY y)
           + COUNT(*) OVER (PARTITION BY nation, y) - 1 AS rb
  FROM spend
),
s AS (
  SELECT nation, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(ra) AS DOUBLE) AS sa,
         CAST(SUM(rb) AS DOUBLE) AS sb,
         CAST(SUM(ra * ra) AS DOUBLE) AS saa,
         CAST(SUM(rb * rb) AS DOUBLE) AS sbb,
         CAST(SUM(ra * rb) AS DOUBLE) AS sab
  FROM rk GROUP BY 1
)
SELECT nation, CAST(n AS BIGINT) AS n_customers,
       ROUND((n*sab - sa*sb)
             / sqrt((n*saa - sa*sa) * (n*sbb - sb*sb)), 6) AS spearman_rho
FROM s
ORDER BY nation
""",
)
def agg_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a customer's account balance
    and their lifetime spend, per nation — the distribution-free
    association measure (monotone, outlier-robust) that complements the
    parametric OLS trend above. Proper AVERAGE ranks for ties (the
    no-order customers all tie at spend 0), then Pearson's formula on
    the ranks.

    Rank arithmetic stays integral: avg_rank has halves, so both sides
    carry 2*avg_rank = 2*RANK() + tie_count - 1 (an integer — Pearson
    is scale-invariant). First-order sums are exact bigints; the
    second-order sums (~4n^3) are exact decimal(38,0) to mirror the
    oracle's hugeint promotion past ~1.3M rows per group. Only the
    final rho is a double — bit-identical cross-engine, same
    discipline as the OLS operator.

    Scale: ranks come from windows partitioned by NATION (never
    global); the spend pre-aggregate shuffles once on customer. For a
    group too large to window-sort, the two-pass range-partitioned
    ranker (operators/ranking.py) is the drop-in."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", F.col("n_name").alias("nation"), F.col("c_acctbal").alias("x"))
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")),
                F.lit(0).cast("bigint"),
            ).alias("y")
        )
    )
    wx = Window.partitionBy("nation").orderBy("x")
    wy = Window.partitionBy("nation").orderBy("y")
    cx = Window.partitionBy("nation", "x")
    cy = Window.partitionBy("nation", "y")
    rk = spend.select(
        "nation",
        (2 * F.rank().over(wx) + F.count(F.lit(1)).over(cx) - 1)
        .cast("bigint")
        .alias("ra"),
        (2 * F.rank().over(wy) + F.count(F.lit(1)).over(cy) - 1)
        .cast("bigint")
        .alias("rb"),
    )
    # second-order sums route through sum_wide_product: sum(ra^2) ~ 4n^3
    # exceeds bigint once a nation has ~1.3M customers, and Spark's
    # non-ANSI bigint SUM wraps SILENTLY while the DuckDB oracle
    # promotes to hugeint (ADVICE r8). The per-row PRODUCT is evaluated
    # in decimal too (operands cast to decimal(20,0) -> decimal(38,0)
    # product, matching DuckDB's int128 promotion): a bigint rank
    # product ra*ra wraps at n ~ 2^31.5 rows per group, BEFORE the sum
    # widens (ADVICE r9).
    s = rk.groupBy("nation").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("ra").cast("double").alias("sa"),
        F.sum("rb").cast("double").alias("sb"),
        sum_wide_product(F.col("ra"), F.col("ra"), check_in=rk)
        .cast("double")
        .alias("saa"),
        sum_wide_product(F.col("rb"), F.col("rb"), check_in=rk)
        .cast("double")
        .alias("sbb"),
        sum_wide_product(F.col("ra"), F.col("rb"), check_in=rk)
        .cast("double")
        .alias("sab"),
    )
    n_, sa, sb = F.col("n"), F.col("sa"), F.col("sb")
    saa, sbb, sab = F.col("saa"), F.col("sbb"), F.col("sab")
    rho = (n_ * sab - sa * sb) / F.sqrt((n_ * saa - sa * sa) * (n_ * sbb - sb * sb))
    return s.select(
        "nation",
        n_.cast("bigint").alias("n_customers"),
        F.round(rho, 6).alias("spearman_rho"),
    ).orderBy("nation")


@register(
    "agg_weighted_median",
    """
WITH w AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS wt
  FROM lineitem
  GROUP BY 1, 2
),
c AS (
  SELECT flag, price_c, wt,
         SUM(wt) OVER (PARTITION BY flag ORDER BY price_c
                       ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(wt) OVER (PARTITION BY flag) AS tw,
         COUNT(*) OVER (PARTITION BY flag) AS n_prices
  FROM w
)
SELECT flag AS l_returnflag,
       CAST(n_prices AS BIGINT) AS n_distinct_prices,
       CAST(tw AS BIGINT) AS total_weight_c,
       ROUND(CAST(MIN(price_c) FILTER (WHERE 2 * cw >= tw) AS DOUBLE)
             / 100, 2) AS weighted_median_price
FROM c
GROUP BY flag, n_prices, tw
ORDER BY 1
""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median: the smallest price whose cumulative quantity
    weight reaches half the group total — the robust 'typical price
    paid per unit' (an unweighted median over-counts small orders).
    Prices and weights are quantized to bigint cents, ties collapse in
    a pre-aggregate keyed on (group, price) so the cumulative window
    runs over DISTINCT prices (rows == range semantics, no tie-order
    sensitivity), and the selection 2*cum >= total is exact integer
    arithmetic on both engines.

    Scale: one fact-grain aggregate with map-side combine shrinks the
    stream to distinct (group, price) pairs; the window partitions by
    the group key — never a global sort."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("qw"),
    )
    w = li.groupBy("flag", "price_c").agg(sum_wide(F.col("qw")).alias("wt"))
    wf = Window.partitionBy("flag")
    wo = wf.orderBy("price_c").rowsBetween(Window.unboundedPreceding, 0)
    # cumulative/total weights stay EXACT decimal (oracle: hugeint):
    # 2*cw at 1e12 rows x 5e6 cent-quanta passes 2^63, and the median
    # selection is an integer comparison that must never round
    c = w.select(
        "flag",
        "price_c",
        F.sum("wt").over(wo).alias("cw"),
        F.sum("wt").over(wf).alias("tw"),
        F.count(F.lit(1)).over(wf).alias("n_prices"),
    )
    med = F.min(
        F.when(2 * F.col("cw") >= F.col("tw"), F.col("price_c"))
    )
    return (
        c.groupBy(
            F.col("flag").alias("l_returnflag"),
            F.col("n_prices").cast("bigint").alias("n_distinct_prices"),
            F.col("tw").cast("bigint").alias("total_weight_c"),
        )
        .agg(F.round(med.cast("double") / 100, 2).alias("weighted_median_price"))
        .orderBy("l_returnflag")
    )
