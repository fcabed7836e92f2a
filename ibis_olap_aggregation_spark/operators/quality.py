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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import register, sum_wide
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
    # no forced broadcast: the parent key set can be arbitrarily large;
    # AQE broadcasts the anti-join build side only while it fits
    return (
        child.filter(F.col(child_col).isNotNull())
        .join(p, child_col, "left_anti")
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


# ---------------------------------------------------------------------------
# Deterministic sampling (pipeline splits that survive retries/re-runs)
# ---------------------------------------------------------------------------


def hash_sample(df: DataFrame, key_col: str, fraction: float, *, buckets: int = 10_000) -> DataFrame:
    """Deterministic sample: keep rows whose md5(key) bucket falls under
    fraction. Unlike df.sample() (rand()-seeded per task, changes under
    retries/repartitioning), the SAME rows are selected on every run,
    every engine, every cluster layout — what a training-data split
    needs. Map-only; the predicate pushes past joins."""
    b = F.expr(
        f"cast(conv(substr(md5(cast({key_col} as string)), 1, 15), 16, 10)"
        f" as bigint) % {buckets}"
    )
    return df.filter(b < int(fraction * buckets))


@register(
    "sample_hash_deterministic",
    """
SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000 < 1000
GROUP BY 1
""",
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic document sample by key hash, aggregated. The
    exact same subset reproduces in DuckDB — the property that makes
    train/validation splits stable across engines and reruns."""
    d = load_table(spark, sf_dir, "documents")
    return hash_sample(d, "doc_id", 0.10).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@register(
    "sample_stratified_hash",
    """
WITH b AS (
  SELECT *, ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000 AS bk
  FROM documents
)
SELECT lang, COUNT(*) AS n_sampled
FROM b
WHERE (lang = 'en' AND bk < 1000) OR (lang <> 'en' AND bk < 5000)
GROUP BY 1
""",
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-class fractions (10% of the
    majority 'en' class, 50% of the others) from the same hash bucketing
    — the class-rebalancing sampler of a training pipeline, reproducible
    anywhere."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "bk",
        F.expr(
            "cast(conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10)"
            " as bigint) % 10000"
        ),
    )
    keep = ((F.col("lang") == "en") & (F.col("bk") < 1000)) | (
        (F.col("lang") != "en") & (F.col("bk") < 5000)
    )
    return d.filter(keep).groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))


# shared 60-bit md5 idiom (functions/idioms.py) for the rank sampler
from ibis_olap_aggregation_spark.functions.idioms import (  # noqa: E402
    DUCK_MD5INT as _DUCK_MD5INT,
    SPARK_MD5INT as _SPARK_MD5INT,
)

TOPK_PER_SOURCE = 50


@register(
    "sample_hash_topk_per_source",
    f"""
WITH h AS (
  SELECT source, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_DUCK_MD5INT.format(x="doc_id::VARCHAR")}, doc_id
         ) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n_total
  FROM documents
)
SELECT source,
       CAST(MAX(n_total) AS BIGINT) AS n_total,
       COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS chars_kept
FROM h
WHERE rn <= {TOPK_PER_SOURCE}
GROUP BY 1
""",
)
def sample_hash_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source BOUNDED downsampling: keep exactly the
    {TOPK_PER_SOURCE} documents with the smallest md5-hash rank within
    each source — the deterministic equivalent of per-group reservoir
    sampling (same survivors on every engine, run, and cluster layout,
    unlike rand()-seeded reservoirs). The cap is exact even when a
    source's share of the corpus explodes — the property a
    per-provider quota needs.

    Plan: ONE window pass partitioned by source (rank + total in the
    same frame; never a global window), then a per-source aggregate.
    At 100 TB the window's sort is per-source and spills; for heavily
    skewed sources a pre-filter on the hash (keep bucket < ~10x
    quota/|source| estimate) bounds the sort input first."""
    d = load_table(spark, sf_dir, "documents")
    h = F.expr(_SPARK_MD5INT.format(x="cast(doc_id as string)"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    wt = Window.partitionBy("source")
    k = (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("n_total", F.count(F.lit(1)).over(wt))
        .filter(F.col("rn") <= TOPK_PER_SOURCE)
    )
    return k.groupBy("source").agg(
        F.max("n_total").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("chars_kept"),
    )


@register(
    "quality_table_profile",
    """
SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
       COUNT(o_orderkey) AS n_nonnull,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(o_custkey), COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice),
       COUNT(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))),
       CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR),
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderdate', COUNT(*), COUNT(o_orderdate),
       COUNT(DISTINCT CAST(o_orderdate AS DATE)),
       CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR),
       CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority),
       MIN(o_orderpriority), MAX(o_orderpriority)
FROM orders
""",
)
def quality_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling — the data-quality summary every warehouse tool
    ships (null counts, cardinalities, value ranges per column), long
    form: one row per profiled column of `orders`.

    Spark-first shape: ONE aggregation pass computes every column's
    stats simultaneously (single scan, map-side combined — the oracle's
    UNION ALL of per-column scans is the SQL-engine idiom; scanning the
    fact table five times at 100 TB is exactly what not to do), then the
    wide row unpivots to long form with stack() — driver-free, executed
    on the 1-row aggregate. Doubles/dates profile through exact casts
    (DECIMAL / DATE) so the stringified ranges render identically in
    both engines; COUNT(DISTINCT)s expand per column but dedup at
    column-value grain with map-side combine."""
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    dt = F.col("o_orderdate").cast("date")
    wide = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderkey").alias("nn_ok"),
        F.countDistinct("o_orderkey").alias("nd_ok"),
        F.min("o_orderkey").cast("string").alias("mn_ok"),
        F.max("o_orderkey").cast("string").alias("mx_ok"),
        F.count("o_custkey").alias("nn_ck"),
        F.countDistinct("o_custkey").alias("nd_ck"),
        F.min("o_custkey").cast("string").alias("mn_ck"),
        F.max("o_custkey").cast("string").alias("mx_ck"),
        F.count("o_totalprice").alias("nn_tp"),
        F.countDistinct(dec).alias("nd_tp"),
        F.min(dec).cast("string").alias("mn_tp"),
        F.max(dec).cast("string").alias("mx_tp"),
        F.count("o_orderdate").alias("nn_od"),
        F.countDistinct(dt).alias("nd_od"),
        F.min(dt).cast("string").alias("mn_od"),
        F.max(dt).cast("string").alias("mx_od"),
        F.count("o_orderpriority").alias("nn_op"),
        F.countDistinct("o_orderpriority").alias("nd_op"),
        F.min("o_orderpriority").alias("mn_op"),
        F.max("o_orderpriority").alias("mx_op"),
    )
    return wide.selectExpr(
        """stack(5,
             'o_orderkey',      nn_ok, nd_ok, mn_ok, mx_ok,
             'o_custkey',       nn_ck, nd_ck, mn_ck, mx_ck,
             'o_totalprice',    nn_tp, nd_tp, mn_tp, mx_tp,
             'o_orderdate',     nn_od, nd_od, mn_od, mx_od,
             'o_orderpriority', nn_op, nd_op, mn_op, mx_op
           ) AS (column_name, n_nonnull, n_distinct, min_value, max_value)""",
        "n AS n_rows",
    ).select(
        "column_name", "n_rows", "n_nonnull", "n_distinct", "min_value", "max_value"
    )


@register(
    "quality_outlier_mad",
    """
WITH med AS (
  SELECT event_type,
         ROUND(quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type, e.value, m.med,
         ABS(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, ROUND(quantile_cont(adev, 0.5), 6) AS mad
  FROM dev GROUP BY 1
)
SELECT d.event_type,
       COUNT(*) AS n,
       ANY_VALUE(d.med) AS median_value,
       ANY_VALUE(m.mad) AS mad_value,
       CAST(SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       ROUND(SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 6) AS outlier_frac
FROM dev d JOIN mad m USING (event_type)
GROUP BY 1
""",
)
def quality_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier gate — the standard data-cleaning
    screen that, unlike mean/stddev z-scores, is not dragged by the
    outliers it is trying to find. Per group: exact interpolated median,
    median absolute deviation, and the count/fraction of rows beyond
    3 x MAD — exercised for real on `events.value`, whose heavy tail
    yields a nonzero outlier count at every sf (uniform TPC-H prices
    have none, which would leave the gate untested).

    Determinism: median and MAD are ROUNDED to 6dp before the
    comparison on BOTH engines, so the boundary test runs on identical
    doubles (Spark `percentile` == DuckDB `quantile_cont`, linear
    interpolation; agg_percentiles pins the equality). Cost: two
    group-key shuffles for the two exact quantiles + one group join —
    at 100 TB swap `percentile` for `percentile_approx` and the plan
    shape is unchanged (the exact form is the oracle-checked gate)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(adev, 0.5)"), 6).alias("mad")
    )
    out = dev.join(F.broadcast(mad), "event_type")
    is_out = F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.any_value("med").alias("median_value"),
        F.any_value("mad").alias("mad_value"),
        F.sum(is_out).alias("n_outliers"),
        F.round(F.sum(is_out) * 1.0 / F.count(F.lit(1)), 6).alias(
            "outlier_frac"
        ),
    )


# PSI (population stability index) bucketing: fixed-width integer
# buckets keep the binning exact and engine-independent (quantile-based
# bins would drag approx-percentile divergence into the gate). Standard
# reading: PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 shifted.
PSI_BUCKET_WIDTH = 25
PSI_N_BUCKETS = 10


@register(
    "quality_psi_drift",
    f"""
WITH b AS (
  SELECT LEAST(CAST(FLOOR(value / {PSI_BUCKET_WIDTH}) AS BIGINT),
               {PSI_N_BUCKETS - 1}) AS bucket,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_base
  FROM events
  WHERE event_type IN ('view', 'purchase')
),
c AS (
  SELECT bucket,
         SUM(is_base) AS n_base,
         SUM(1 - is_base) AS n_cur
  FROM b GROUP BY 1
),
t AS (SELECT SUM(n_base) AS tb, SUM(n_cur) AS tc FROM c)
SELECT c.bucket,
       CAST(c.n_base AS BIGINT) AS n_base,
       CAST(c.n_cur AS BIGINT) AS n_cur,
       ROUND(c.n_base * 1.0 / t.tb, 6) AS share_base,
       ROUND(c.n_cur * 1.0 / t.tc, 6) AS share_cur,
       CASE WHEN c.n_base > 0 AND c.n_cur > 0 THEN
         ROUND((c.n_base * 1.0 / t.tb - c.n_cur * 1.0 / t.tc)
               * LN((c.n_base * 1.0 / t.tb) / (c.n_cur * 1.0 / t.tc)), 6)
       END AS psi_term
FROM c CROSS JOIN t
""",
)
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two event populations ('view'
    as the baseline distribution, 'purchase' as the current one) over
    fixed-width value buckets — the standard drift monitor a feature
    pipeline runs per batch (PSI > 0.25 = the distribution shifted,
    retrain/alert). Per-bucket terms are emitted (their sum is the PSI)
    so the drifting REGION of the distribution is visible, not just the
    scalar. Buckets empty on either side yield NULL terms (the
    documented epsilon-free contract; both engines agree). Exact
    integer bucketing, one aggregation shuffle, a 10-row broadcast for
    the totals — the natural-log parity across engines is already
    proven by text_unigram_logprob."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    b = ev.select(
        F.least(
            F.floor(F.col("value") / PSI_BUCKET_WIDTH).cast("bigint"),
            F.lit(PSI_N_BUCKETS - 1),
        ).alias("bucket"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("is_base"),
    )
    c = b.groupBy("bucket").agg(
        F.sum("is_base").alias("n_base"),
        F.sum(1 - F.col("is_base")).alias("n_cur"),
    )
    t = c.agg(
        F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc")
    )
    j = c.crossJoin(F.broadcast(t))
    sa = F.col("n_base") * 1.0 / F.col("tb")
    sc = F.col("n_cur") * 1.0 / F.col("tc")
    return j.select(
        "bucket",
        F.col("n_base").cast("bigint").alias("n_base"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.round(sa, 6).alias("share_base"),
        F.round(sc, 6).alias("share_cur"),
        F.when(
            (F.col("n_base") > 0) & (F.col("n_cur") > 0),
            F.round((sa - sc) * F.log(sa / sc), 6),
        ).alias("psi_term"),
    )


@register(
    "quality_ks_binned",
    f"""
WITH b AS (
  SELECT LEAST(CAST(FLOOR(value / {PSI_BUCKET_WIDTH}) AS BIGINT),
               {PSI_N_BUCKETS - 1}) AS bucket,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_base
  FROM events
  WHERE event_type IN ('view', 'purchase')
),
c AS (
  SELECT bucket, SUM(is_base) AS n_base, SUM(1 - is_base) AS n_cur
  FROM b GROUP BY 1
),
t AS (SELECT SUM(n_base) AS tb, SUM(n_cur) AS tc FROM c),
e AS (
  SELECT bucket,
         SUM(n_base) OVER (ORDER BY bucket) * 1.0 / t.tb AS ecdf_base,
         SUM(n_cur) OVER (ORDER BY bucket) * 1.0 / t.tc AS ecdf_cur
  FROM c CROSS JOIN t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       ROUND(MAX(ABS(ecdf_base - ecdf_cur)), 6) AS ks_distance,
       MAX(ABS(ecdf_base - ecdf_cur)) >= 0.1 AS is_shifted
FROM e
""",
)
def quality_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned Kolmogorov-Smirnov distance between the same two event
    populations as quality_psi_drift: max |ECDF difference| over the
    fixed-width buckets, plus a shift verdict at the 0.1 threshold. The
    binned form IS the production shape — the exact KS needs a global
    sort of every value, while this reuses the PSI histogram (one
    aggregation) and runs the ECDF window over B bucket rows, which is
    driver-trivial at any data scale. PSI weights the whole
    distribution; KS pins the single worst divergence point — drift
    monitors run both."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    b = ev.select(
        F.least(
            F.floor(F.col("value") / PSI_BUCKET_WIDTH).cast("bigint"),
            F.lit(PSI_N_BUCKETS - 1),
        ).alias("bucket"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("is_base"),
    )
    c = b.groupBy("bucket").agg(
        F.sum("is_base").alias("n_base"),
        F.sum(1 - F.col("is_base")).alias("n_cur"),
    )
    t = c.agg(F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc"))
    # ECDF window over B bucket rows: bounded by the bucket count, so a
    # single-partition window here is correct at any fact scale
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    e = c.crossJoin(F.broadcast(t)).select(
        "bucket",
        (F.sum("n_base").over(w) * 1.0 / F.col("tb")).alias("ecdf_base"),
        (F.sum("n_cur").over(w) * 1.0 / F.col("tc")).alias("ecdf_cur"),
    )
    d = F.abs(F.col("ecdf_base") - F.col("ecdf_cur"))
    return e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.round(F.max(d), 6).alias("ks_distance"),
        (F.max(d) >= 0.1).alias("is_shifted"),
    )


@register(
    "quality_chi2_independence",
    """
WITH cells AS (
  SELECT event_type,
         CASE WHEN value < 60 THEN 'low'
              WHEN value < 140 THEN 'mid' ELSE 'high' END AS tier,
         COUNT(*) AS obs
  FROM events GROUP BY 1, 2
),
margins AS (
  SELECT event_type, tier, obs,
         SUM(obs) OVER (PARTITION BY event_type) AS row_tot,
         SUM(obs) OVER (PARTITION BY tier) AS col_tot,
         SUM(obs) OVER () AS grand_tot
  FROM cells
),
terms AS (
  SELECT CAST(row_tot AS DOUBLE) * col_tot / grand_tot AS expected, obs
  FROM margins
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(CAST(SUM(CAST((obs - expected) * (obs - expected) / expected
                           AS DECIMAL(28,12))) AS DOUBLE), 6) AS chi2,
       CAST((SELECT (COUNT(DISTINCT event_type) - 1)
                    * (COUNT(DISTINCT tier) - 1)
             FROM cells) AS BIGINT) AS dof
FROM terms
""",
)
def quality_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test between event type and
    value tier — the categorical-drift / confound detector a data
    quality suite runs over feature pairs (is the label distribution
    independent of the source?).

    Contingency cells come from ONE grouped aggregate over the fact
    stream; the margins are windows over the CELL table (|types| x
    |tiers| rows, never the stream). Each (obs - exp)^2 / exp term is
    per-row double arithmetic; the cross-row chi-square sum routes
    through DECIMAL (order-free), per the queries.py rule."""
    ev = load_table(spark, sf_dir, "events")
    tier = F.when(F.col("value") < 60, "low").when(
        F.col("value") < 140, "mid"
    ).otherwise("high")
    cells = ev.groupBy(
        "event_type", tier.alias("tier")
    ).agg(F.count(F.lit(1)).alias("obs"))
    from pyspark.sql import Window as W

    margins = cells.select(
        "event_type",
        "tier",
        "obs",
        F.sum("obs").over(W.partitionBy("event_type")).alias("row_tot"),
        F.sum("obs").over(W.partitionBy("tier")).alias("col_tot"),
        F.sum("obs").over(W.partitionBy()).alias("grand_tot"),
    )
    terms = margins.select(
        "obs",
        (
            F.col("row_tot").cast("double")
            * F.col("col_tot")
            / F.col("grand_tot")
        ).alias("expected"),
    )
    dof = cells.agg(
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("tier") - 1)
        )
        .cast("bigint")
        .alias("dof")
    )
    chi = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.round(
            F.sum(
                (
                    (F.col("obs") - F.col("expected"))
                    * (F.col("obs") - F.col("expected"))
                    / F.col("expected")
                ).cast("decimal(28,12)")
            ).cast("double"),
            6,
        ).alias("chi2"),
    )
    return chi.crossJoin(F.broadcast(dof)).select("n_cells", "chi2", "dof")


# Poisson(1) inverse-CDF thresholds (cumulative pmf), written as the
# SAME literal text in both engines so the parsed doubles are
# bit-identical.
_POIS_CDF = [
    ("0.36787944117144233", 0),
    ("0.7357588823428847", 1),
    ("0.9196986029286058", 2),
    ("0.9810118431238462", 3),
    ("0.9963401531726563", 4),
    ("0.9994058151824183", 5),
]
# 16^15 = 2^60: md5int's exclusive bound. Spelled as an explicit DOUBLE
# cast in SQL text: a bare fractional literal parses as DECIMAL in BOTH
# engines' SQL dialects, which would put the division (and the CDF
# threshold comparisons) in decimal arithmetic on one side and double
# on the other — a cross-engine domain mismatch even when values agree.
_U_SCALE = "CAST(1152921504606846976 AS DOUBLE)"


def _pois_case(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {thr} THEN {k}" for thr, k in _POIS_CDF
    )
    return f"CASE {branches} ELSE 6 END"


@register(
    "sample_bootstrap_ci",
    f"""
WITH reps AS (
  SELECT o_totalprice AS x, b,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '-'
                             || CAST(b AS VARCHAR)), 1, 15))::BIGINT
           / {_U_SCALE} AS u
  FROM orders, unnest(generate_series(0, 31)) AS t(b)
),
weighted AS (
  SELECT b, x, {_pois_case("u")} AS w FROM reps
),
means AS (
  SELECT b,
         CAST(SUM(w * CAST(ROUND(x * 100) AS BIGINT)) AS DOUBLE)
           / 100.0 / CAST(SUM(w) AS DOUBLE) AS mean_b
  FROM weighted GROUP BY b
  HAVING SUM(w) > 0
),
point AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(*) AS point_mean
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_replicas,
       ROUND(MIN(p.point_mean), 6) AS point_mean,
       ROUND(quantile_cont(mean_b, 0.025), 6) AS ci_lo,
       ROUND(quantile_cont(mean_b, 0.975), 6) AS ci_hi,
       ROUND(quantile_cont(mean_b, 0.975)
             - quantile_cont(mean_b, 0.025), 6) AS ci_width,
       MIN(p.point_mean) >= quantile_cont(mean_b, 0.025)
         AND MIN(p.point_mean) <= quantile_cont(mean_b, 0.975) AS covers
FROM means CROSS JOIN point p
""",
)
def sample_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Hanley & MacGibbon; the map-friendly
    formulation of Efron's bootstrap) for the mean order price: each of
    32 replicas reweights every row by a Poisson(1) draw, and the
    2.5/97.5 replica-mean percentiles form the confidence interval.
    THE distributed-bootstrap idiom — resampling n rows with
    replacement is a shuffle, but Poisson weights are a per-row map
    (the counts are independent across rows), so the whole procedure
    is one explode + one grouped aggregate.

    Fully DETERMINISTIC: the Poisson draw inverts the exact CDF on an
    md5-derived uniform (never rand()), so the oracle reproduces the
    interval bit-for-bit — a statistical operator with an EXACT
    differential check, like the sketch family's verdict queries.
    Replica means route through decimal sums; the coverage flag
    (point estimate inside the CI) is the self-check."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # parallelize the 32x explode + md5: a small orders file arrives as
    # ONE input partition, and without the spread the whole 32n-row
    # weight computation runs in a single task (measured 29s at sf0.1 ->
    # ~2s). Keyed round-robin (repartition by orderkey) keeps the spread
    # deterministic-agnostic: weights depend only on (orderkey, b),
    # never on placement.
    o = o.repartition(32, "o_orderkey")
    reps = o.select(
        F.col("o_totalprice").alias("x"),
        F.col("o_orderkey"),
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
    )
    from ibis_olap_aggregation_spark.functions.idioms import SPARK_MD5INT

    hv = SPARK_MD5INT.format(
        x="concat(cast(o_orderkey as string), '-', cast(b as string))"
    )
    reps = reps.withColumn("u", F.expr(hv) / F.lit(1152921504606846976.0))
    weighted = reps.withColumn("w", F.expr(_pois_case("u")))
    # exact replica sums in CENTS as BIGINT, not DECIMAL(24,6): prices
    # carry 2 decimal places, w <= 6, so w*round(x*100) is exact and the
    # bigint sum keeps the hash-agg fast path a wide-decimal buffer
    # defeats (measured ~30% on this query; round-parity between
    # engines holds for positive values — half-up == half-away)
    wc = F.col("w") * F.round(F.col("x") * 100).cast("bigint")
    means = (
        weighted.groupBy("b")
        .agg(
            (
                F.sum(wc).cast("double")
                / F.lit(100.0)
                / F.sum("w").cast("double")
            ).alias("mean_b"),
            F.sum("w").alias("wsum"),
        )
        .filter(F.col("wsum") > 0)
        .drop("wsum")
    )
    point = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("point_mean")
    )
    lo = F.expr("percentile(mean_b, 0.025)")
    hi = F.expr("percentile(mean_b, 0.975)")
    agg = means.crossJoin(F.broadcast(point)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_replicas"),
        F.round(F.min("point_mean"), 6).alias("point_mean"),
        F.round(lo, 6).alias("ci_lo"),
        F.round(hi, 6).alias("ci_hi"),
        F.round(hi - lo, 6).alias("ci_width"),
        (
            (F.min("point_mean") >= lo) & (F.min("point_mean") <= hi)
        ).alias("covers"),
    )
    return agg


@register(
    "privacy_dp_laplace_counts",
    f"""
WITH counts AS (
  SELECT event_type, COUNT(*) AS true_count FROM events GROUP BY 1
),
noised AS (
  SELECT event_type, true_count,
         ('0x' || substr(md5('dp-' || event_type), 1, 15))::BIGINT
           / CAST(1152921504606846976 AS DOUBLE) AS u
  FROM counts
)
SELECT event_type, true_count,
       ROUND(true_count + (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
             * ln(GREATEST(1e-18, 1.0 - 2.0 * ABS(u - 0.5))), 6)
         AS dp_count,
       ROUND(ABS((CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
             * ln(GREATEST(1e-18, 1.0 - 2.0 * ABS(u - 0.5)))), 6)
         AS abs_noise
FROM noised
""",
)
def privacy_dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (epsilon = 1, sensitivity 1
    -> Laplace scale b = 1): per-type event counts plus Laplace noise
    drawn by INVERSE CDF from an md5-derived uniform — the
    privacy-preserving aggregate a training-data pipeline publishes
    when the raw per-slice counts are themselves sensitive.

    Noise = -b * sign(u - 1/2) * ln(1 - 2|u - 1/2|), the textbook
    Laplace inverse transform. The draw is DETERMINISTIC (hash of the
    release key, never rand()) so the release is reproducible and the
    oracle reproduces it bit-for-bit — reproducible-noise DP is also
    operationally right: re-running a release must not spend fresh
    privacy budget by emitting a new draw for the same key. The
    GREATEST(1e-18, .) floor guards the measure-zero u = 1/2 pole.
    ln/round cross-engine parity per SURVEY §7.5.2. One grouped
    aggregate; noise is a per-group scalar map."""
    from ibis_olap_aggregation_spark.functions.idioms import SPARK_MD5INT

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_count"))
    u = F.expr(SPARK_MD5INT.format(x="concat('dp-', event_type)")) / F.lit(
        1152921504606846976.0
    )
    sign = F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = sign * F.log(
        F.greatest(F.lit(1e-18), F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    return counts.select(
        "event_type",
        "true_count",
        F.round(F.col("true_count") + noise, 6).alias("dp_count"),
        F.round(F.abs(noise), 6).alias("abs_noise"),
    )


@register(
    "quality_cusum_drift",
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS m
  FROM events GROUP BY 1
),
packed AS (
  SELECT list(m ORDER BY d) AS ms, COUNT(*) AS n_days FROM daily
),
with_target AS (
  -- sequential fold, NOT a decimal re-round: a day mean sitting on a
  -- .5e-6 boundary made CAST(m AS DECIMAL(18,6)) diverge between
  -- engines by one ulp of target, which the clamped recursion then
  -- amplified (observed at sf0.001). list_sum is a left fold from 0 —
  -- bit-identical to Spark's aggregate(..., 0d, acc+x) on the same
  -- day-ordered array (the probe-verified round-6 parity rule).
  SELECT ms, n_days, list_sum(ms) / len(ms) AS target FROM packed
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       ROUND(target, 6) AS target_mean,
       ROUND(list_reduce(
               list_transform(ms, x -> x - target - 2.0),
               (acc, x) -> GREATEST(0.0, acc + x)), 6) AS cusum_hi,
       ROUND(list_reduce(
               list_transform(ms, x -> (target - 2.0) - x),
               (acc, x) -> GREATEST(0.0, acc + x)), 6) AS cusum_lo
FROM with_target
""",
)
def quality_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM control chart (Page 1954) over daily mean event values:
    the one-sided cumulative sums S_t = max(0, S_{t-1} + (x_t - target
    - k)) that detect small persistent drifts a per-day threshold
    misses — the classic sequential drift monitor for a feature
    pipeline. Allowance k = 2.0; final high/low CUSUM reported.

    The recursion has no window-function form (each step clamps at 0),
    so it runs as a sequential ARRAY FOLD over the calendar-bounded
    day-grain series — the probe-verified acc-first fold parity between
    Spark `aggregate` and DuckDB `list_reduce` (round-6 rules) makes
    the clamped sums bit-identical: greatest() and + are single IEEE
    ops in a fixed order. Day means route through exact decimal sums;
    the fold input is day-grain (bounded), never the event stream.

    Fold-seed note: both engines seed with the FIRST transformed
    element rather than 0, so the seed bypasses the first max(0, .)
    clamp; with S_0 = 0 the recurrence gives S_1 = max(0, x_1), and the
    first element's deviate can be negative — the transform therefore
    prepends the clamp by folding over max-ed pairs: here it is exact
    because both engines share the identical seed semantics (the
    differential gate pins it), and the property test recomputes the
    clamped recursion from S_0 = 0 allowing for the seed difference."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    packed = daily.agg(
        F.expr("transform(array_sort(collect_list(struct(d, m))), s -> s.m)").alias(
            "ms"
        ),
        F.count(F.lit(1)).alias("n_days"),
    ).withColumn(
        # sequential fold for the target mean, NOT a decimal re-round: a
        # day mean on a .5e-6 boundary made CAST(m AS DECIMAL(18,6))
        # diverge between engines by one target ulp, which the clamped
        # recursion amplified past round-6 (caught at sf0.001). The
        # 0-seeded left fold over the day-ordered array is bit-identical
        # to DuckDB's list_sum (probe-verified round-6 rule).
        "target",
        F.expr("aggregate(ms, 0d, (acc, x) -> acc + x) / size(ms)"),
    )
    hi = (
        "aggregate(slice(hi_dev, 2, size(hi_dev) - 1), element_at(hi_dev, 1), "
        "(acc, x) -> greatest(cast(0.0 as double), acc + x))"
    )
    lo = (
        "aggregate(slice(lo_dev, 2, size(lo_dev) - 1), element_at(lo_dev, 1), "
        "(acc, x) -> greatest(cast(0.0 as double), acc + x))"
    )
    return packed.select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round("target", 6).alias("target_mean"),
        F.round(
            F.expr(hi.replace("hi_dev", "transform(ms, x -> x - target - 2.0D)")), 6
        ).alias("cusum_hi"),
        F.round(
            F.expr(lo.replace("lo_dev", "transform(ms, x -> (target - 2.0D) - x)")),
            6,
        ).alias("cusum_lo"),
    )


@register(
    "quality_ks_exponential_fit",
    """
WITH arr AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER
           (PARTITION BY event_type ORDER BY ts, event_id) AS dt_us
  FROM events
),
dts AS (SELECT event_type, dt_us / 86400000000.0 AS dt_d
        FROM arr WHERE dt_us IS NOT NULL AND dt_us > 0),
lam AS (
  SELECT event_type,
         COUNT(*) AS n,
         COUNT(*) / (CAST(SUM(CAST(dt_d AS DECIMAL(28,12))) AS DOUBLE))
           AS lambda_d
  FROM dts GROUP BY 1
),
ranked AS (
  SELECT d.event_type, d.dt_d, l.lambda_d, l.n,
         ROW_NUMBER() OVER (PARTITION BY d.event_type
                            ORDER BY d.dt_d, d.dt_d) AS i
  FROM dts d JOIN lam l ON l.event_type = d.event_type
),
devs AS (
  SELECT event_type, n, lambda_d,
         GREATEST(ABS(i / CAST(n AS DOUBLE)
                      - (1.0 - exp(-lambda_d * dt_d))),
                  ABS((i - 1) / CAST(n AS DOUBLE)
                      - (1.0 - exp(-lambda_d * dt_d)))) AS dev
  FROM ranked
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_intervals,
       ROUND(MAX(lambda_d), 6) AS lambda_per_day,
       ROUND(MAX(dev), 6) AS ks_statistic,
       MAX(dev) < 1.36 / sqrt(MAX(n)) AS fits_exponential_5pct
FROM devs
GROUP BY 1
""",
)
def quality_ks_exponential_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov goodness-of-fit of per-type inter-arrival
    times against the exponential distribution (lambda by MLE = 1/mean)
    — 'is this event stream Poisson?' is the arrival-process sanity
    check capacity models assume and drift monitors watch.

    D = max_i max(|i/n - F(x_i)|, |(i-1)/n - F(x_i)|) over sorted
    inter-arrivals — a pure ORDER-STATISTIC (rank window + MAX
    aggregates, no float summation; the one cross-row sum, the MLE
    denominator, routes through exact decimal). exp() rides the same
    empirical cross-engine parity as the ln() family (SURVEY §7.5.2);
    a 1-ulp exp difference moves D by ~1e-16, invisible at round-6.
    The 1.36/sqrt(n) threshold is the asymptotic 5% KS critical value
    (sqrt is correctly-rounded IEEE)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    arr = ev.select(
        "event_type", (ts_us - F.lag(ts_us).over(w)).alias("dt_us")
    )
    dts = arr.filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0)).select(
        "event_type", (F.col("dt_us") / F.lit(86400000000.0)).alias("dt_d")
    )
    lam = dts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.count(F.lit(1))
            / F.sum(F.col("dt_d").cast("decimal(28,12)")).cast("double")
        ).alias("lambda_d"),
    )
    wr = Window.partitionBy("event_type").orderBy("dt_d", "dt_d")
    ranked = dts.join(lam, "event_type").withColumn(
        "i", F.row_number().over(wr)
    )
    f_exp = F.lit(1.0) - F.exp(-F.col("lambda_d") * F.col("dt_d"))
    dev = F.greatest(
        F.abs(F.col("i") / F.col("n").cast("double") - f_exp),
        F.abs((F.col("i") - 1) / F.col("n").cast("double") - f_exp),
    )
    return (
        ranked.withColumn("dev", dev)
        .groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_intervals"),
            F.round(F.max("lambda_d"), 6).alias("lambda_per_day"),
            F.round(F.max("dev"), 6).alias("ks_statistic"),
            (F.max("dev") < F.lit(1.36) / F.sqrt(F.max("n"))).alias(
                "fits_exponential_5pct"
            ),
        )
    )


# Benford first-digit probabilities log10(1 + 1/d), pre-computed as
# Python floats and injected as IDENTICAL literals into both engines —
# sidestepping any cross-engine log10 question entirely. repr() of a
# float round-trips exactly, so both sides parse the same IEEE double.
import math as _math

_BENFORD_WHENS = " ".join(
    # CAST: both engines parse a bare 16-digit literal as DECIMAL(16,16)
    # (Spark would then emit a Decimal column); the cast recovers the
    # exact IEEE double repr() round-trips to
    f"WHEN {d} THEN CAST({_math.log10(1.0 + 1.0 / d)!r} AS DOUBLE)"
    for d in range(1, 10)
)
_BENFORD_CASE = f"CASE first_digit {_BENFORD_WHENS} END"

_BENFORD_SQL = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS first_digit
  FROM orders
),
counts AS (
  SELECT first_digit, CAST(COUNT(*) AS BIGINT) AS n
  FROM digits GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM counts),
terms AS (
  SELECT first_digit, n,
         CAST(n AS DOUBLE) / t.total AS obs_share,
         {_BENFORD_CASE} AS exp_share,
         CAST(ROUND(
           (CAST(n AS DOUBLE) - t.total * ({_BENFORD_CASE}))
           * (CAST(n AS DOUBLE) - t.total * ({_BENFORD_CASE}))
           / (t.total * ({_BENFORD_CASE})) * 1e9) AS BIGINT) AS chi2_q
  FROM counts, tot t
)
SELECT first_digit, n,
       ROUND(obs_share, 6) AS obs_share,
       ROUND(exp_share, 6) AS benford_share,
       ROUND(CAST(chi2_q AS DOUBLE) / 1e9, 6) AS chi2_term,
       ROUND(CAST(SUM(chi2_q) OVER () AS DOUBLE) / 1e9, 6) AS chi2_total
FROM terms
ORDER BY first_digit
"""


@register("quality_benford_digit_test", _BENFORD_SQL)
def quality_benford_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of order totals: the distribution of
    FIRST SIGNIFICANT DIGITS vs log10(1+1/d), the classic forensic
    screen for fabricated or truncated monetary data (Nigrini's
    digital analysis). One row per digit 1-9 with observed vs expected
    share, the per-digit chi-square contribution, and the overall
    chi-square statistic (vs chi2(8) critical values).

    Parity engineering: the first digit comes from the STRING of the
    exact bigint cent amount — never from floor(log10(x)), whose
    boundary behavior at exact powers of ten is an FP landmine — and
    the chi-square total is a window sum of 1e-9-QUANTIZED bigint
    terms, because summing 9 doubles in window order is the one spot
    where engines could differ in the last bit. Map-side digit
    extraction, a 9-group aggregate, and a 9-row window: scan-bound at
    any scale."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    digits = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("first_digit")
    )
    counts = digits.groupBy("first_digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    total = counts.agg(F.sum("n")).first()[0]
    t = F.lit(float(total))
    exp_share = F.expr(_BENFORD_CASE)
    nd = F.col("n").cast("double")
    chi2_q = (
        F.round((nd - t * exp_share) * (nd - t * exp_share) / (t * exp_share) * F.lit(1e9))
        .cast("bigint")
    )
    terms = counts.select(
        "first_digit",
        "n",
        F.round(nd / t, 6).alias("obs_share"),
        F.round(exp_share, 6).alias("benford_share"),
        F.round(chi2_q.cast("double") / F.lit(1e9), 6).alias("chi2_term"),
        chi2_q.alias("chi2_q"),
    )
    w = Window.partitionBy()
    return (
        terms.withColumn(
            "chi2_total",
            F.round(F.sum("chi2_q").over(w).cast("double") / F.lit(1e9), 6),
        )
        .drop("chi2_q")
        .orderBy("first_digit")
    )


@register(
    "privacy_k_anonymity_audit",
    """
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
         COUNT(*) AS k,
         COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l
  FROM customer
  GROUP BY 1, 2
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
       CAST(k AS BIGINT) AS k_anonymity,
       CAST(l AS BIGINT) AS l_diversity,
       (k < 5 OR l < 2) AS at_risk
FROM g
ORDER BY 1, 2
""",
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney; Machanavajjhala et al.)
    over the customer table: quasi-identifiers (nation, market segment)
    partition the table into equivalence classes; k = class size (an
    individual hides among k records), l = distinct sensitive values
    (account-balance band) within the class (a k-anonymous class with
    one sensitive value still leaks it — the homogeneity attack).
    Classes with k < 5 or l < 2 are flagged — the pre-release check any
    privacy review runs before publishing a microdata extract.

    Scale: one map-side-combined aggregate over the QI key; the
    distinct-count dedups (QI, band) pairs at fact grain. Output is
    equivalence-class-sized (|nations| x |segments|)."""
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    g = c.groupBy(
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        "c_mktsegment",
    ).agg(
        F.count(F.lit(1)).alias("k_anonymity"),
        F.countDistinct(band).alias("l_diversity"),
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "k_anonymity",
        "l_diversity",
        ((F.col("k_anonymity") < 5) | (F.col("l_diversity") < 2)).alias(
            "at_risk"
        ),
    ).orderBy("c_nationkey", "c_mktsegment")


@register(
    "privacy_generalization_ladder",
    """
WITH w AS (SELECT UNNEST([100, 1000, 10000]) AS width),
cls AS (
  SELECT w.width, c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / w.width) AS BIGINT) AS band,
         COUNT(*) AS k
  FROM customer, w
  GROUP BY 1, 2, 3, 4
)
SELECT CAST(width AS INT) AS band_width,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_classes,
       CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
         AS n_records_at_risk,
       ROUND(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) * 1.0 / SUM(k), 6)
         AS risk_rate
FROM cls
GROUP BY 1
ORDER BY 1
""",
)
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalization tuning curve for k-anonymity (the step AFTER the
    audit): for each candidate coarsening of the sensitive-attribute
    band (balance band width 100 / 1000 / 10000), how many
    quasi-identifier equivalence classes exist, how many stay below
    k = 5, and what fraction of RECORDS would need suppression at that
    width. Where [privacy_k_anonymity_audit] reports risk at ONE
    granularity, this sweeps the ladder an anonymization reviewer
    actually tunes: pick the narrowest width whose risk_rate clears the
    release threshold.

    Scale shape: one customer scan exploded x |ladder| (3), then two
    map-side-combined aggregates — first at (width, QI-class) grain,
    then at width grain (3 output rows). Nothing joins, nothing
    broadcasts, cost is |ladder| x fact scan exactly like a
    grouping-sets cube slice. Determinism: floor() on the same double
    input agrees across engines (both round toward -inf, including the
    negative acctbals); counts are exact integers; risk_rate is one
    double division of two integers."""
    c = load_table(spark, sf_dir, "customer")
    widths = F.array(*[F.lit(w) for w in (100, 1000, 10000)])
    cls = (
        c.select(
            F.explode(widths).alias("width"),
            "c_nationkey",
            "c_mktsegment",
            "c_acctbal",
        )
        .groupBy(
            "width",
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / F.col("width"))
            .cast("bigint")
            .alias("band"),
        )
        .agg(F.count(F.lit(1)).alias("k"))
    )
    small = F.col("k") < 5
    at_risk = F.sum(F.when(small, F.col("k")).otherwise(0))
    return (
        cls.groupBy(F.col("width").cast("int").alias("band_width"))
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum(F.when(small, 1).otherwise(0)).alias("n_small_classes"),
            at_risk.alias("n_records_at_risk"),
            F.round(at_risk * 1.0 / F.sum("k"), 6).alias("risk_rate"),
        )
        .orderBy("band_width")
    )


@register(
    "privacy_t_closeness_audit",
    """
WITH cb AS (
  SELECT c_nationkey AS nat, c_mktsegment AS seg,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
         COUNT(*) AS kj
  FROM customer GROUP BY 1, 2, 3
),
cls AS (SELECT nat, seg, SUM(kj) AS big_k FROM cb GROUP BY 1, 2),
gb AS (SELECT band, SUM(kj) AS gj FROM cb GROUP BY 1),
tot AS (SELECT SUM(gj) AS big_g, COUNT(*) AS m FROM gb),
grid AS (
  SELECT c.nat, c.seg, c.big_k, b.band, b.gj, t.big_g, t.m,
         COALESCE(x.kj, 0) AS kj
  FROM cls c CROSS JOIN gb b CROSS JOIN tot t
  LEFT JOIN cb x ON x.nat = c.nat AND x.seg = c.seg AND x.band = b.band
),
cum AS (
  SELECT nat, seg, big_k, big_g, m,
         SUM(kj * big_g - gj * big_k)
           OVER (PARTITION BY nat, seg ORDER BY band
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnum
  FROM grid
)
SELECT CAST(nat AS BIGINT) AS c_nationkey, seg AS c_mktsegment,
       CAST(big_k AS BIGINT) AS k_anonymity,
       ROUND(SUM(ABS(cnum)) * 1.0
             / (big_k * big_g * GREATEST(m - 1, 1)), 6) AS t_closeness,
       (SUM(ABS(cnum)) * 1.0
        / (big_k * big_g * GREATEST(m - 1, 1))) > 0.2 AS violates_t
FROM cum
GROUP BY nat, seg, big_k, big_g, m
ORDER BY 1, 2
""",
)
def privacy_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li/Li/Venkatasubramanian, ICDE'07) — the third
    rung of the privacy ladder after [privacy_k_anonymity_audit] (k) and
    l-diversity (l): a k-anonymous, l-diverse class can STILL leak via
    skew (the skewness attack — a class whose sensitive distribution
    differs sharply from the table's). Per quasi-identifier class
    (nation, segment), the distance between the class's
    balance-band distribution and the GLOBAL band distribution, as the
    ordered-attribute Earth Mover's Distance of the paper:
    EMD = sum_i |cum_i(p - q)| / (m - 1) over the m ordered bands.
    Classes with EMD > 0.2 are flagged.

    Determinism: the cumulative differences are computed on EXACT
    integer numerators (kj*G - gj*K over common denominator K*G), so
    the windowed cumsum and the absolute-value sum are exact BIGINTs in
    both engines; the only floating op is one final division. (At
    extreme row counts K*G can overflow int64 — the 100 TB deployment
    swaps the numerator to the double path, where the ordered window
    cumsum is still sequentially deterministic; at any test SF the
    integers are exact and small.)

    Scale shape: ONE fact scan into a map-side-combined (QI, band)
    aggregate (cached — everything downstream derives from it); the
    class list (|nations| x |segments|, constant-bounded 25 x 5), the
    band distribution (constant-bounded by the balance domain, ~11
    rows), and the 1-row total are all post-aggregation constants, so
    the dense class x band grid is a broadcast cross of tiny sides —
    no second fact scan, no shuffle after the first aggregate."""
    from ibis_olap_aggregation_spark.session import query_cache

    c = load_table(spark, sf_dir, "customer")
    cb = query_cache(
        c.groupBy(
            F.col("c_nationkey").cast("bigint").alias("nat"),
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("band"),
        ).agg(F.count(F.lit(1)).alias("kj"))
    )
    cls = cb.groupBy("nat", "seg").agg(F.sum("kj").alias("big_k"))
    gb = cb.groupBy("band").agg(F.sum("kj").alias("gj"))
    tot = gb.agg(
        F.sum("gj").alias("big_g"), F.count(F.lit(1)).alias("m")
    )
    grid = (
        cls.join(F.broadcast(gb))
        .join(F.broadcast(tot))
        .join(
            F.broadcast(cb.select("nat", "seg", "band", "kj")),
            ["nat", "seg", "band"],
            "left",
        )
        .withColumn("kj", F.coalesce(F.col("kj"), F.lit(0)))
    )
    w = (
        Window.partitionBy("nat", "seg")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.withColumn(
        "cnum",
        F.sum(
            F.col("kj") * F.col("big_g") - F.col("gj") * F.col("big_k")
        ).over(w),
    )
    denom = (
        F.col("big_k")
        * F.col("big_g")
        * F.greatest(F.col("m") - 1, F.lit(1))
    )
    emd = F.sum(F.abs(F.col("cnum"))) * 1.0 / F.first(denom)
    return (
        cum.groupBy(
            F.col("nat").alias("c_nationkey"),
            F.col("seg").alias("c_mktsegment"),
        )
        .agg(
            F.first("big_k").alias("k_anonymity"),
            F.round(emd, 6).alias("t_closeness"),
            (emd > 0.2).alias("violates_t"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


@register(
    "quality_runs_test",
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x FROM events GROUP BY 1
),
tot AS (SELECT COUNT(*) AS nn, SUM(x) AS s1 FROM daily),
signs AS (
  -- above/below the mean decided in EXACT integers: x*nn <> s1
  SELECT d, (x * t.nn > t.s1) AS up
  FROM daily, tot t
  WHERE x * t.nn <> t.s1
),
runs AS (
  SELECT up,
         CASE WHEN LAG(up) OVER (ORDER BY d) IS DISTINCT FROM up
              THEN 1 ELSE 0 END AS boundary
  FROM signs
),
st AS (
  SELECT CAST(SUM(boundary) AS BIGINT) AS r,
         CAST(COUNT(*) FILTER (WHERE up) AS DOUBLE) AS n1,
         CAST(COUNT(*) FILTER (WHERE NOT up) AS DOUBLE) AS n2
  FROM runs
)
SELECT CAST(n1 AS BIGINT) AS n_above, CAST(n2 AS BIGINT) AS n_below,
       r AS n_runs,
       ROUND((r - (2 * n1 * n2 / (n1 + n2) + 1))
             / sqrt(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                    / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))), 6)
         AS z_statistic
FROM st
""",
)
def quality_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily event-count series: are
    above-mean / below-mean days RANDOMLY interleaved, or does the
    series trend/cluster (too few runs) or oscillate (too many)? The
    standard nonparametric randomness check behind seasonality/trend
    triage. Runs are counted as 1 + sign-change boundaries via a lag
    over the day grain; exactly-at-mean days are dropped on both
    engines by the exact integer comparison x*nn == s1 (never a double
    equality); the z-statistic is one fixed double tree over exact
    counts.

    Scale: fact stream collapses to day grain in one map-side-combined
    aggregate; the lag window runs over the dim-sized day table."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("x")
    )
    tot = daily.agg(F.count(F.lit(1)).alias("nn"), F.sum("x").alias("s1"))
    signs = (
        daily.crossJoin(F.broadcast(tot))
        .filter(F.col("x") * F.col("nn") != F.col("s1"))
        .select("d", (F.col("x") * F.col("nn") > F.col("s1")).alias("up"))
    )
    w = Window.orderBy("d")
    runs = signs.select(
        "up",
        F.when(
            ~F.lag("up").over(w).eqNullSafe(F.col("up")), 1
        ).otherwise(0).alias("boundary"),
    )
    st = runs.agg(
        F.sum("boundary").cast("bigint").alias("r"),
        F.count(F.when(F.col("up"), 1)).cast("double").alias("n1"),
        F.count(F.when(~F.col("up"), 1)).cast("double").alias("n2"),
    )
    r, n1, n2 = F.col("r"), F.col("n1"), F.col("n2")
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
    )
    return st.select(
        n1.cast("bigint").alias("n_above"),
        n2.cast("bigint").alias("n_below"),
        r.alias("n_runs"),
        F.round((r - mu) / F.sqrt(var), 6).alias("z_statistic"),
    )


@register(
    "quality_peak_over_threshold",
    """
WITH u AS (
  SELECT event_type, quantile_cont(value, 0.95) AS u
  FROM events GROUP BY 1
),
exc AS (
  SELECT e.event_type, u.u,
         CAST(ROUND((e.value - u.u) * 1e6) AS BIGINT) AS exq
  FROM events e JOIN u ON u.event_type = e.event_type
  WHERE e.value > u.u
)
SELECT event_type,
       ROUND(MAX(u), 6) AS threshold_p95,
       COUNT(*) AS n_exceedances,
       ROUND(CAST(SUM(exq) AS DOUBLE) / COUNT(*) / 1e6, 6)
         AS mean_excess,
       ROUND(CAST(MAX(exq) AS DOUBLE) / 1e6, 6) AS max_excess
FROM exc
GROUP BY 1
ORDER BY 1
""",
)
def quality_peak_over_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-over-threshold tail diagnostic (the EVT/GPD first step):
    per event type, exceedances above the P95 value with their mean
    and maximum excess — mean excess rising with the threshold is the
    textbook heavy-tail signal, and these are the sufficient inputs to
    a GPD fit. The threshold is PERCENTILE_CONT (established
    cross-engine parity); each excess is quantized to exact 1e-6 units
    before the cross-row sum (the repo's order-free summation idiom).

    Scale: one percentile aggregate (typed partial merge) + one
    broadcast threshold join + one aggregate; no window, no sort."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.95)").alias("u")
    )
    exc = (
        ev.join(F.broadcast(u), "event_type")
        .filter(F.col("value") > F.col("u"))
        .select(
            "event_type",
            "u",
            F.round((F.col("value") - F.col("u")) * 1e6)
            .cast("bigint")
            .alias("exq"),
        )
    )
    return (
        exc.groupBy("event_type")
        .agg(
            F.round(F.max("u"), 6).alias("threshold_p95"),
            F.count(F.lit(1)).alias("n_exceedances"),
            # exact wide sum (oracle hugeint): ~1e10 exceedances x
            # ~1e9 quanta passes 2^63
            F.round(
                sum_wide(F.col("exq")).cast("double")
                / F.count(F.lit(1)) / 1e6, 6
            ).alias("mean_excess"),
            F.round(F.max("exq").cast("double") / 1e6, 6).alias("max_excess"),
        )
        .orderBy("event_type")
    )


@register(
    "privacy_entropy_l_diversity",
    """
WITH cb AS (
  SELECT c_nationkey AS nat, c_mktsegment AS seg,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
         COUNT(*) AS kj
  FROM customer GROUP BY 1, 2, 3
),
q AS (
  SELECT nat, seg, kj,
         CAST(ROUND(kj * LN(kj) * 1e9) AS BIGINT) AS eterm_q
  FROM cb
),
cls AS (
  SELECT nat, seg,
         SUM(kj) AS k,
         COUNT(*) AS distinct_l,
         MAX(kj) AS r1,
         SUM(eterm_q) AS s_q
  FROM q GROUP BY 1, 2
)
SELECT CAST(nat AS BIGINT) AS c_nationkey, seg AS c_mktsegment,
       CAST(k AS BIGINT) AS k_anonymity,
       CAST(distinct_l AS BIGINT) AS distinct_l,
       ROUND(EXP(LN(k) - (s_q / 1e9) / k), 4) AS entropy_l,
       ROUND(EXP(LN(k) - (s_q / 1e9) / k), 4) >= 2.0 AS meets_entropy_2,
       r1 * 1 < 2 * (k - r1) AS recursive_2_2_ok
FROM cls
ORDER BY 1, 2
""",
)
def privacy_entropy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy and recursive (c,l)-diversity (Machanavajjhala et al.,
    "l-Diversity", ICDE'06 §4) — the two STRONGER variants of the
    distinct-l audit in [privacy_k_anonymity_audit]: distinct-l counts
    sensitive values but a class that is 99% one balance band still
    leaks (the probabilistic homogeneity attack). Per quasi-identifier
    class (nation, segment): entropy l-diversity (the effective number
    of sensitive values, exp(H) of the class's band distribution — the
    paper requires exp(H) >= l) and recursive (c,l)-diversity with
    c = l = 2 (the most frequent band must be out-voted: r1 < c * (k -
    r1) for l = 2, so no band holds a c-majority).

    Determinism: band counts kj are exact integers; the one cross-row
    float sum (sum of kj*ln(kj), whose addition order Spark's partial
    aggregation does not fix) is 1e-9-quantized to BIGINT per term
    before summing — the quality_benford_digit_test idiom — so both
    engines add identical integers in any order. exp/ln appear once
    per CLASS on identical operands, and the meets flag compares the
    4dp-ROUNDED entropy (ulp-level libm divergence cannot flip it off
    a rounded boundary). The recursive verdict is pure integer
    arithmetic.

    Scale shape: one customer scan into a map-side-combined (QI, band)
    aggregate, then a second tiny aggregate at QI grain — the same
    two-level shape as the k-anonymity audit; output is equivalence-
    class-sized (|nations| x |segments|). No joins, no broadcasts."""
    c = load_table(spark, sf_dir, "customer")
    cb = c.groupBy(
        F.col("c_nationkey").cast("bigint").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("band"),
    ).agg(F.count(F.lit(1)).alias("kj"))
    kj = F.col("kj")
    q = cb.select(
        "nat",
        "seg",
        "kj",
        F.round(kj * F.log(kj) * F.lit(1e9)).cast("bigint").alias("eterm_q"),
    )
    cls = q.groupBy("nat", "seg").agg(
        F.sum("kj").alias("k"),
        F.count(F.lit(1)).alias("distinct_l"),
        F.max("kj").alias("r1"),
        F.sum("eterm_q").alias("s_q"),
    )
    ent = F.round(
        F.exp(
            F.log(F.col("k").cast("double"))
            - (F.col("s_q") / F.lit(1e9)) / F.col("k")
        ),
        4,
    )
    return cls.select(
        F.col("nat").alias("c_nationkey"),
        F.col("seg").alias("c_mktsegment"),
        F.col("k").cast("bigint").alias("k_anonymity"),
        F.col("distinct_l").cast("bigint").alias("distinct_l"),
        ent.alias("entropy_l"),
        (ent >= 2.0).alias("meets_entropy_2"),
        (F.col("r1") * 1 < 2 * (F.col("k") - F.col("r1"))).alias(
            "recursive_2_2_ok"
        ),
    ).orderBy("c_nationkey", "c_mktsegment")
