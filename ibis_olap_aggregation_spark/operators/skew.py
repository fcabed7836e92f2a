"""Skew-handling operators: salting and two-phase exact distinct.

At 100 TB a handful of hot keys (one event_type, one mega-customer) can
pin a whole stage on one task. Three mitigations, in preference order:
1. AQE skew-join splitting — on by default in the session factory
   (spark.sql.adaptive.skewJoin.enabled); handles JOIN skew transparently.
2. Two-phase aggregation over a composite key — for skewed GROUP BYs
   whose measures decompose (sum/count/min/max) or whose distinct can be
   keyed out (exact COUNT DISTINCT below).
3. Explicit salting — the general fallback: spread one logical key over
   `salt` physical keys with a DETERMINISTIC salt (hash of a high-
   cardinality sibling column — never rand(), which breaks retries and
   reproducibility), aggregate per salted key, then merge.

The salted path costs one extra (cheap, balanced) shuffle and buys an
upper bound of rows/salt per task on the hot key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ibis_olap_aggregation_spark.queries import dsum, register
from ibis_olap_aggregation_spark.session import load_table

__all__ = ["salted_aggregate", "two_phase_count_distinct"]


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partials: Sequence[Column],
    finals: Sequence[Column],
    *,
    salt_from: str,
    salt: int = 16,
) -> DataFrame:
    """Skew-proof aggregation: groupBy(keys + salt) computes `partials`,
    groupBy(keys) merges them with `finals` (which reference the partial
    aliases). The salt is pmod(xxhash64(salt_from), salt) — deterministic
    per row, uniform for any high-cardinality salt_from column."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salt)))
    part = salted.groupBy(*keys, "_salt").agg(*partials)
    return part.groupBy(*keys).agg(*finals)


def two_phase_count_distinct(
    df: DataFrame, keys: Sequence[str], distinct_col: str, out_col: str
) -> DataFrame:
    """Exact COUNT(DISTINCT) without the single hot-key reduction:
    phase 1 shuffles on (keys, distinct_col) — high cardinality, balanced
    even when `keys` alone is skewed; phase 2 counts the deduped rows per
    key. Same two-shuffle shape Catalyst uses internally, made explicit
    so it can be composed with salting or pre-bucketed layouts."""
    dedup = df.select(*keys, distinct_col).distinct()
    return dedup.groupBy(*keys).agg(F.count(F.lit(1)).alias(out_col))


@register(
    "skew_two_phase_distinct",
    """
SELECT event_type, COUNT(DISTINCT user_id) AS distinct_users
FROM events GROUP BY 1
""",
)
def skew_two_phase_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event_type (5 hot keys) via the explicit
    two-phase decomposition — every shuffle balanced."""
    ev = load_table(spark, sf_dir, "events")
    return two_phase_count_distinct(ev, ["event_type"], "user_id", "distinct_users")


@register(
    "skew_salted_aggregate",
    """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       CAST(MAX(value) AS DOUBLE) AS max_value
FROM events GROUP BY 1
""",
)
def skew_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over the (skewed: 5 distinct values)
    event_type key: partial count/sum/max per (event_type, salt), exact
    merge per event_type. Result identical to the direct groupBy — the
    oracle proves it."""
    ev = load_table(spark, sf_dir, "events")
    return salted_aggregate(
        ev,
        ["event_type"],
        partials=[
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_s"),
            F.max("value").alias("_m"),
        ],
        finals=[
            F.sum("_n").alias("n"),
            F.sum("_s").cast("double").alias("sum_value"),
            F.max("_m").cast("double").alias("max_value"),
        ],
        salt_from="event_id",
    )


@register(
    "skew_salted_join",
    """
WITH flag_dim AS (
  SELECT l_returnflag AS rf,
         ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*), 6) AS avg_discount
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price,
       MIN(d.avg_discount) AS avg_discount
FROM lineitem l JOIN flag_dim d ON d.rf = l.l_returnflag
GROUP BY 1
""",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit SALTED JOIN on a pathologically skewed key: lineitem
    keyed by l_returnflag has THREE distinct values, so a plain
    shuffled join runs three tasks no matter the cluster size. The big
    side gets a deterministic salt (md5 of the high-cardinality
    orderkey — never rand(): retries and reruns must land identically),
    the small side is exploded across all salt values, and the join key
    becomes (flag, salt) — parallelism restored to 3 x SALT with a
    provably identical result (the salt never reaches the output; the
    oracle runs the UNSALTED spec join).

    This is the JOIN member of the skew pair (skew_salted_aggregate
    covers GROUP BY); AQE's skew-join splitting handles the case where
    stats reveal it at runtime, but a KNOWN-skewed key is cheaper to
    salt at plan time than to let AQE discover per query. The merge
    hint pins a shuffle join: at demo scale Catalyst would broadcast
    the 3-row dim and no salting would be observable — at real scale
    the dim side is itself too big to broadcast, which is when this
    pattern earns its keep (plan-pinned: the join exchange partitions
    by (rf, salt))."""
    salt_n = 16
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount", "l_orderkey"
    )
    dim = li.groupBy(F.col("l_returnflag").alias("rf")).agg(
        F.round(
            F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_discount")
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.array([F.lit(i) for i in range(salt_n)]))
    )
    from ibis_olap_aggregation_spark.functions.idioms import SPARK_MD5INT

    big = li.withColumn(
        "salt",
        F.pmod(
            F.expr(SPARK_MD5INT.format(x="cast(l_orderkey as string)")),
            F.lit(salt_n),
        ).cast("int"),
    )
    joined = big.hint("merge").join(
        dim_salted,
        (big.l_returnflag == dim_salted.rf) & (big.salt == dim_salted.salt),
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_extendedprice", "sum_price"),
        F.min("avg_discount").alias("avg_discount"),
    )
