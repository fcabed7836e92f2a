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
